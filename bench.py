"""Benchmark harness (driver contract).

Plain run: one JSON line
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, "crawl": {...}}

over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32).

``--scaling``: runs the headline pipeline in TWO fresh processes at
num_cpus=8 and num_cpus=32 on the same input (sandbox stand-in for N vs 4N
nodes) and prints both throughputs + scaling efficiency.

This script OWNS its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench-scale synthetic site (cached under /tmp across runs/processes so the
# scaling runs see identical input)
BENCH_SPEC = dict(
    n_hosts=24,
    products_per_host=100,
    categories_per_host=8,
    page_size=20,
    imgs_per_product=2,
    seed=42,
)

QUERY_NAMES = [
    "q1_pricing_summary",
    "market_segment_revenue",
    "customers_per_region",
    "top3_orders_per_customer",
    "first_order_per_customer",
    "filtered_revenue_rows",
    "hourly_event_counts",
    "sessionize",
    "props_key_sum",
    "doc_token_stats",
    "exact_dedup_docs",
    "token_set_dup_pairs",
    "minhash_near_dup_pairs",
    "simhash_near_dup_pairs",
    "knn_brute_force",
    "embedding_near_dup_pairs",
]


def _consume(result) -> int:
    """Force full execution; return row count."""
    if hasattr(result, "count"):
        return result.count()
    return len(result)


def bench_crawl() -> dict:
    import ray

    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver
    from crawler_ray.sources.synthetic import SiteSpec, generate_site, write_site

    spec = SiteSpec(**BENCH_SPEC)
    fix_dir = f"/tmp/crawler_ray_bench_site_{spec.seed}_{spec.n_hosts}x{spec.products_per_host}"
    if not os.path.exists(os.path.join(fix_dir, "_DONE")):
        site = generate_site(spec)
        write_site(site, fix_dir)
        with open(os.path.join(fix_dir, "_DONE"), "w") as f:
            f.write("ok")
    out_dir = f"/tmp/crawler_ray_bench_out_{NUM_CPUS}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    # size the fetch pool to the session CPUs, leave headroom for the
    # seen-set/politeness actors and the write stage
    fetch_conc = max(2, min(NUM_CPUS - 4, 24))
    t0 = time.monotonic()
    driver = CrawlDriver(
        CrawlConfig(
            fixture_dir=fix_dir,
            out_dir=out_dir,
            quota_per_host=400,
            fetch_concurrency=fetch_conc,
            num_seen_shards=max(2, NUM_CPUS // 8),
            batch_size=256,
        )
    )
    res = driver.run()
    elapsed = time.monotonic() - t0
    frontier_ops = driver.seen.total_ops()
    return {
        "sec": round(elapsed, 2),
        "rounds": res.rounds,
        "pages_fetched": res.pages_fetched,
        "images_written": res.images_written,
        "pages_per_sec": round(res.pages_fetched / elapsed, 1),
        "frontier_ops_per_sec": round(frontier_ops / elapsed, 1),
        "frontier_ops": frontier_ops,
    }


def bench_queries() -> dict[str, float]:
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in QUERY_NAMES:
        t0 = time.monotonic()
        _consume(qs[name](SF_DIR))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    t0 = time.monotonic()
    crawl = bench_crawl()
    queries = bench_queries()
    total = time.monotonic() - t0
    result = {
        "metric": "crawl+query-suite wall time",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl": crawl,
    }
    ray.shutdown()
    return result


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    thr_lo = lo["crawl"]["pages_per_sec"]
    thr_hi = hi["crawl"]["pages_per_sec"]
    eff = (thr_hi / thr_lo) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (pages-fetched/s, 8 vs 32 cpus)",
                "num_cpus": [8, 32],
                "pages_per_sec": [thr_lo, thr_hi],
                "frontier_ops_per_sec": [
                    lo["crawl"]["frontier_ops_per_sec"],
                    hi["crawl"]["frontier_ops_per_sec"],
                ],
                "total_sec": [lo["value"], hi["value"]],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        print(json.dumps(main()))
