"""Memory-ceiling streaming proof (``pytest -m slow``, round-5 verdict #3).

Each case launches ``tools/memory_ceiling.py`` in a FRESH process (the
constrained ``object_store_memory`` must be set at ray.init) and asserts the
workload COMPLETES under a store far smaller than the bytes it moves — the
direct measurement that every stage streams (backpressure + spill) rather
than secretly needing the corpus resident. Spill totals are reported, not
asserted >0: a fully pipelined run that never needs to spill is an even
stronger pass, and whether the ceiling is hit depends on CPU count vs block
sizes. The recorded numbers live in BASELINE.md ("memory ceiling" entry).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "memory_ceiling.py")


def _run(args: list[str], timeout: int) -> dict:
    proc = subprocess.run(
        [sys.executable, TOOL, *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_ingest_500k_under_1gb_store():
    """500k-image ingest (~3 GB of encoded pixels through fetch→decode→
    hash→dedup→write) under a 1 GiB object store: must complete with the
    full page count; spill is allowed and reported."""
    res = _run(
        ["ingest", "--store-gb", "1", "--cpus", "16", "--n", "500000"],
        timeout=1800,
    )
    assert res["ok"] and res["pages_fetched"] == res["expected_unique"] > 450_000
    print(
        f"\n[memceil] ingest 500k @1GiB store: {res['sec']}s, "
        f"spill_requests={res['spill_requests']} "
        f"restore_requests={res['restore_requests']} "
        f"spill_dir={res['spill_dir_mb']} MiB"
    )


def test_querybar_under_1gb_store():
    """The three scaling-bar query pipelines (minhash near-dup, curation
    chain, training-data build) over the 50k-doc planted corpus under a
    1 GiB store: exchanges and groupbys must stream/spill, not die."""
    res = _run(["querybar", "--store-gb", "1", "--cpus", "16"], timeout=1800)
    assert res["ok"] and set(res["queries"]) == {
        "minhash_near_dup_pairs",
        "corpus_curation",
        "training_data_build",
    }
    print(
        f"\n[memceil] querybar @1GiB store: {res['sec']}s, "
        f"spill_requests={res['spill_requests']} "
        f"restore_requests={res['restore_requests']} "
        f"spill_dir={res['spill_dir_mb']} MiB"
    )
