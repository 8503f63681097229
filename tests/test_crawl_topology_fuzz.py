"""Randomized crawl-topology conformance: the synthetic site generator
computes its OWN ground truth (BFS-reachable robots-allowed URL set +
bit-exact expected images table), so a random ``SiteSpec`` is self-oracling.
Each seed draws a fresh topology (host count, Zipf product skew, pagination
quantum, dup-image / error-page / robots-disallow fractions) AND a fresh
engine configuration (per-host quota, seen-set shards, batch size), then
asserts the crawl's final URL-seen count and images table match the ground
truth exactly — the same invariant the fixed-fixture crawl tests pin, swept
across the topology space where pagination stops, dead-letter paths,
robots filtering and hot-host quota splitting all shift.
"""

import numpy as np
import pytest

from crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver, read_images_table
from crawler_ray.sources.synthetic import SiteSpec, generate_site, write_site


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15])
def test_crawl_random_topology_matches_ground_truth(
    ray_session, tmp_path_factory, seed
):
    rng = np.random.default_rng(seed)
    spec = SiteSpec(
        n_hosts=int(rng.integers(2, 8)),
        products_per_host=int(rng.integers(5, 40)),
        categories_per_host=int(rng.integers(2, 8)),
        page_size=int(rng.integers(2, 12)),
        imgs_per_product=int(rng.integers(1, 4)),
        dup_image_frac=float(rng.uniform(0.0, 0.9)),
        error_frac=float(rng.uniform(0.0, 0.3)),
        robots_frac=float(rng.uniform(0.0, 0.5)),
        zipf_s=float(rng.uniform(1.05, 2.0)),
        seed=seed,
    )
    site_dir = tmp_path_factory.mktemp(f"site_fuzz_{seed}")
    site = generate_site(spec)
    write_site(site, str(site_dir))

    out = tmp_path_factory.mktemp(f"crawl_fuzz_{seed}")
    cfg = CrawlConfig(
        fixture_dir=str(site_dir),
        out_dir=str(out),
        quota_per_host=int(rng.integers(3, 60)),
        fetch_concurrency=2,
        num_seen_shards=int(rng.integers(1, 5)),
        batch_size=int(rng.integers(16, 257)),
    )
    drv = CrawlDriver(cfg)
    res = drv.run()
    drv.shutdown()

    assert res.pages_fetched == len(site.expected_seen), (
        f"seed {seed}: fetched {res.pages_fetched} != "
        f"{len(site.expected_seen)} reachable (spec={spec})"
    )
    imgs = read_images_table(str(out))
    assert imgs.equals(site.expected_images), (
        f"seed {seed}: images table diverged (spec={spec})"
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", [21, 22, 23])
def test_crawl_random_topology_kill_poison_resume(
    ray_session, tmp_path_factory, seed
):
    """Compound recovery under a random topology: crawl to a random round,
    abandon the driver (kill), then RESUME with a poison marker so one task
    of the resumed round dies mid-flight (possibly after sibling tasks
    mutated the seen-set and wrote sink parts) — the round rolls back to
    the checkpoint and re-runs. Final state must still be bit-identical to
    the generator's ground truth."""
    rng = np.random.default_rng(seed)
    spec = SiteSpec(
        n_hosts=int(rng.integers(3, 7)),
        products_per_host=int(rng.integers(10, 40)),
        categories_per_host=int(rng.integers(2, 6)),
        page_size=int(rng.integers(3, 10)),
        dup_image_frac=float(rng.uniform(0.0, 0.6)),
        error_frac=float(rng.uniform(0.0, 0.2)),
        robots_frac=float(rng.uniform(0.0, 0.3)),
        seed=seed,
    )
    site_dir = tmp_path_factory.mktemp(f"site_kpr_{seed}")
    site = generate_site(spec)
    write_site(site, str(site_dir))
    out = tmp_path_factory.mktemp(f"crawl_kpr_{seed}")

    base = dict(
        fixture_dir=str(site_dir),
        out_dir=str(out),
        quota_per_host=int(rng.integers(10, 50)),
        fetch_concurrency=2,
        num_seen_shards=2,
    )
    drv1 = CrawlDriver(CrawlConfig(**base))
    drv1.run(stop_after_round=int(rng.integers(0, 2)))
    drv1.shutdown()

    marker = str(out / "poison_once")
    drv2 = CrawlDriver(CrawlConfig(**base, fail_once_marker=marker))
    res = drv2.run(resume=True)
    drv2.shutdown()
    import os

    assert os.path.exists(marker)  # the injected failure actually fired
    assert res.pages_fetched == len(site.expected_seen)
    assert read_images_table(str(out)).equals(site.expected_images), (
        f"seed {seed}: kill+poison+resume diverged (spec={spec})"
    )
