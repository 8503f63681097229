"""Oracle-compatible rounding.

DuckDB's ``ROUND(double, d)`` rounds halves toward +infinity; numpy/pandas
``round`` rounds half-to-even (banker's). Any query whose output is compared
value-for-value against a DuckDB oracle must round with THESE helpers, or
exact-half values (e.g. 3594.325 → .32 vs .33) hash-mismatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_pa(arr: pa.ChunkedArray | pa.Array, ndigits: int) -> pa.ChunkedArray:
    """Arrow-side: round matching DuckDB semantics."""
    return pc.round(arr, ndigits=ndigits, round_mode="half_towards_infinity")


def round_np(x, ndigits: int) -> np.ndarray:
    """numpy/pandas-side: same semantics via the Arrow kernel (one copy)."""
    a = pa.array(np.asarray(x, dtype=np.float64), pa.float64())
    return round_pa(a, ndigits).to_numpy(zero_copy_only=False)
