"""Empty-result totality for bounded query outputs.

``ray.data.Dataset.to_pandas()`` builds its frame from ``iter_batches``,
which yields NOTHING for an all-empty dataset — the result is a
ZERO-COLUMN DataFrame even when ``Dataset.schema()`` is fully known. Any
query whose (legitimate, selective) filters match no rows therefore loses
its entire schema at the driver's compare boundary, while the DuckDB twin
returns a typed empty frame. The empty-INPUT sweeps (tests/test_empty_corpus)
never see this: it needs a NON-empty corpus whose predicate windows miss —
found by ``tools/fuzz_oracles.py --barren``.

:func:`schema_safe` closes the gap for pipelines whose results are bounded
(final aggregates / per-key set ops): ``materialize()`` executes ONCE with
blocks pinned in the OBJECT STORE (nothing is pulled to the driver heap),
the emptiness test is then metadata-only, and an all-empty result is
returned as a typed empty ``pyarrow.Table`` carrying the declared output
schema (the queries() contract allows ``Dataset | DataFrame |
pyarrow.Table`` returns). On the driver corpus every wrapped query is
non-empty, so the returned object is the materialized Dataset and values /
timings are unchanged (consumers were materializing these bounded results
anyway).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def schema_safe(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset | pa.Table:
    """Dataset when any rows survived; typed empty Table otherwise.

    For BOUNDED results only (final small aggregates, per-key set ops):
    emptiness can't be known without executing, so this triggers execution
    and pins the result blocks in the object store. An unbounded streaming
    result must not pass through here.
    """
    mat = ds.materialize()
    if mat.count() == 0:
        return schema.empty_table()
    return mat


def scalar_safe(
    ds: rd.Dataset, schema: pa.Schema, default_row: dict
) -> rd.Dataset | pa.Table:
    """Like :func:`schema_safe`, for scalar aggregates (no GROUP BY): SQL
    returns exactly ONE row even over the empty set, so when the engine's
    fold has zero groups (its finisher never runs) the aligned default row
    — the COALESCE value the oracle uses — is returned typed."""
    mat = ds.materialize()
    if mat.count() == 0:
        return pa.Table.from_pylist([default_row], schema=schema)
    return mat
