"""Memory-ceiling streaming proof (round-5 verdict item 3).

The 128 GiB sandbox never pressures the object store at bench scale, so
"no stage needs the corpus resident" was an audit claim, not a measurement.
This tool runs a workload in its OWN Ray session with a deliberately small
``object_store_memory`` and reports completion + the session's spill/restore
totals: the workload finishing at all under a store far smaller than the
data it moves is the streaming-execution proof (backpressure + spill instead
of resident state), and the spill bytes quantify how hard the ceiling was
hit.

Usage:
    python tools/memory_ceiling.py ingest   [--store-gb 2] [--cpus 16] [--n 1000000]
    python tools/memory_ceiling.py querybar [--store-gb 2] [--cpus 16]

Prints ONE JSON line:
    {"workload": ..., "store_gb": ..., "num_cpus": ..., "sec": ...,
     "spilled_mb": ..., "restored_mb": ..., "ok": true, ...}

Run from a fresh process (owns its ray.init / ray.shutdown).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _spill_stats() -> dict:
    """Parse the session's cumulative spill/restore totals from Ray's
    memory summary ("Spilled N MiB, M objects" / "Restored N MiB, ...")."""
    from ray._private.internal_api import memory_summary

    txt = memory_summary(stats_only=True)
    out = {"spilled_mb": 0.0, "restored_mb": 0.0}
    m = re.search(r"Spilled (\d+) MiB", txt)
    if m:
        out["spilled_mb"] = float(m.group(1))
    m = re.search(r"Restored (\d+) MiB", txt)
    if m:
        out["restored_mb"] = float(m.group(1))
    return out


def run_ingest(n_images: int) -> dict:
    """The 1M-URL image-frontier ingest (bench.py's scaling headline) —
    fetch→decode→md5→phash→seen-dedup→write as one streaming round."""
    os.environ["GRAFT_INGEST_N"] = str(n_images)
    import bench

    bench.NUM_CPUS = NUM_CPUS  # bench reads it at import; pin to our arg
    t0 = time.monotonic()
    res = bench.bench_ingest(n_images=n_images)
    return {"sec": round(time.monotonic() - t0, 2), **res}


def run_querybar() -> dict:
    """The three scaling-bar query pipelines (minhash near-dup + curation +
    training-data build) over the deterministic 50k-doc planted corpus."""
    import bench

    d = bench._queryscale_dir()
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    t0 = time.monotonic()
    per = {}
    for name in bench.SCALE_QUERY_NAMES:
        q0 = time.monotonic()
        bench._consume(qs[name](d))
        per[name] = round(time.monotonic() - q0, 2)
    return {"sec": round(time.monotonic() - t0, 2), "queries": per}


def main() -> int:
    global NUM_CPUS
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", choices=["ingest", "querybar"])
    ap.add_argument("--store-gb", type=float, default=2.0)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()
    NUM_CPUS = args.cpus

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        object_store_memory=int(args.store_gb * (1 << 30)),
        logging_level="ERROR",
    )
    from crawler_ray.context import tune_data_context

    tune_data_context()
    try:
        if args.workload == "ingest":
            res = run_ingest(args.n)
        else:
            res = run_querybar()
        res.update(_spill_stats())
        res.update(
            workload=args.workload,
            store_gb=args.store_gb,
            num_cpus=args.cpus,
            ok=True,
        )
        print(json.dumps(res))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
