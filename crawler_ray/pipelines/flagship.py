"""Flagship end-to-end pipeline for ``__ray_entry__.entry()``: a complete
crawl of a deterministic synthetic site (seeds → frontier rounds → fetch →
parse → seen-set dedup → images table per input_hint schema), returning the
crawled images Dataset.

The site fixture is synthesized deterministically (BASELINE.json: 'build over
a table of exactly input_hint shape — synthesise it deterministically at
small scale'); no external data. Fixture + outputs live under /tmp.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import ray.data as rd

from crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver
from crawler_ray.sources.synthetic import SiteSpec, generate_site, write_site


def run_flagship(
    work_dir: str | None = None,
    spec: SiteSpec | None = None,
    quota_per_host: int = 200,
    fetch_concurrency: int = 4,
    num_seen_shards: int = 4,
) -> tuple[rd.Dataset, "CrawlDriver"]:
    """Generate (or reuse) the site fixture, crawl it, return the images
    Dataset + driver (for metrics/lineage inspection)."""
    spec = spec or SiteSpec()
    work_dir = work_dir or os.path.join(
        tempfile.gettempdir(), f"crawler_ray_flagship_s{spec.seed}"
    )
    fix_dir = os.path.join(work_dir, "fixture")
    out_dir = os.path.join(work_dir, "out")
    if not os.path.exists(os.path.join(fix_dir, "pages.parquet")):
        site = generate_site(spec)
        write_site(site, fix_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    driver = CrawlDriver(
        CrawlConfig(
            fixture_dir=fix_dir,
            out_dir=out_dir,
            quota_per_host=quota_per_host,
            fetch_concurrency=fetch_concurrency,
            num_seen_shards=num_seen_shards,
        )
    )
    driver.run()
    images = driver.images_dataset()
    driver.shutdown()  # release state actors; outputs are on disk
    return images, driver
