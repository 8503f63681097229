"""Pinned-seed randomized differential conformance (tools/fuzz_oracles.py
as a repeatable suite).

Two corpora per run, derived from sf0.001 with the generator contract
preserved (schemas, categorical vocabularies, unit-norm embeddings, primary
keys untouched):

* seed 1000 "adversarial distributions" — heavy ties, Zipf-skewed foreign
  keys, midnight-shared timestamps, planted dup/near-dup documents;
* seed 1000 "barren" — every selective predicate window misses, so most
  filtered results are EMPTY (the empty-RESULT schema mode that Ray's
  ``to_pandas()`` otherwise loses — see crawler_ray/pipelines/result.py).

First run of this sweep found and fixed three real divergences the driver
corpus can never expose: the ``epoch()::BIGINT`` round-vs-floor mismatch in
``first_order_per_customer``, SUM-over-empty NULL-vs-0 in
``forecast_revenue_change``, and ten queries losing their entire schema on
empty results.
"""

import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["random", "barren", "random-sf0.01"])
def test_fuzz_sweep_green(mode):
    # subprocess: the sweep owns its own Ray session sizing and must see
    # module state identical to a fresh driver run
    import os

    cmd = [
        sys.executable,
        f"{REPO_ROOT}/tools/fuzz_oracles.py",
        "--seeds",
        "1",
    ]
    env = dict(os.environ)
    if mode == "barren":
        cmd.append("--barren")
    elif mode == "random-sf0.01":
        # the 10x-row regime: denser timestamp/key collisions — this base
        # caught the Q4/Q21 day-vs-timestamp lateness truncation (seed
        # 11000) that sf0.001 pools were too coarse to hit
        env["FUZZ_BASE"] = "/root/testdata/sf0.01"
        env["FUZZ_SEED0"] = "11000"
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, cwd=REPO_ROOT, env=env
    )
    tail = "\n".join(res.stdout.splitlines()[-30:])
    assert res.returncode == 0, f"fuzz sweep ({mode}) failures:\n{tail}"
