"""Every ROWS-ONLY query (no SQL oracle) is BIT-DETERMINISTIC across
parallelism levels.

The oracled queries get value-exactness checked against DuckDB at three
scales; the rows-only ones (ANN, sketches, media, iterative training) have
planted-truth tests but nothing that pins "same result at any cluster
width" — exactly where block-split sensitivity hides. This runs each one
at 3 and 16 CPUs in FRESH Ray sessions (subprocesses — a Ray session's
cpu count is fixed at init) and asserts frame equality including dtypes.

Slow (~2 session spin-ups + 2×27 queries at sf0.001); tagged accordingly.
"""

import pickle
import subprocess
import sys

import pandas as pd
import pytest

import __ray_entry__ as entry_mod
from tests.conftest import SF_DIR

ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))

_WORKER = r"""
import sys, pickle
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False)
import __ray_entry__ as e
import pandas as pd
out = {}
for n in sys.argv[4:]:
    r = e.queries()[n](sys.argv[2])
    df = r if isinstance(r, pd.DataFrame) else r.to_pandas()
    df = df[sorted(df.columns)]
    out[n] = df.sort_values(
        list(df.columns), kind="mergesort"
    ).reset_index(drop=True)
pickle.dump(out, open(sys.argv[3], "wb"))
ray.shutdown()
"""


@pytest.mark.slow
def test_rows_only_queries_parallelism_invariant(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    results = {}
    for cpus in (3, 16):
        out = tmp_path / f"out{cpus}.pkl"
        subprocess.run(
            [sys.executable, str(worker), str(cpus), SF_DIR, str(out)]
            + ROWS_ONLY,
            check=True, capture_output=True, timeout=900,
        )
        results[cpus] = pickle.load(open(out, "rb"))
    diffs = []
    for n in ROWS_ONLY:
        try:
            pd.testing.assert_frame_equal(
                results[3][n], results[16][n], check_dtype=True
            )
        except AssertionError as ex:
            diffs.append(f"{n}: {str(ex)[:200]}")
    assert not diffs, "parallelism-sensitive rows-only queries:\n" + "\n".join(diffs)
