"""End-to-end crawl tests (SURVEY.md §5 items 2–3): golden reproducibility,
parallelism-invariance, PSNR/caption invariants, kill/resume."""

import numpy as np
import pytest

from crawler_ray.functions.codecs import decode_image, psnr
from crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver, read_images_table


def _run(site_dir, out, **over):
    kw = dict(quota_per_host=50, fetch_concurrency=2, num_seen_shards=2)
    kw.update(over)
    cfg = CrawlConfig(fixture_dir=site_dir, out_dir=str(out), **kw)
    drv = CrawlDriver(cfg)
    res = drv.run()
    drv.shutdown()  # release state actors (fractional-CPU reservations)
    return drv, res


@pytest.fixture(scope="module")
def crawl_once(ray_session, small_site, tmp_path_factory):
    site, site_dir = small_site
    out = tmp_path_factory.mktemp("crawl_out")
    drv, res = _run(site_dir, out)
    return site, site_dir, out, drv, res


def test_crawl_matches_ground_truth(crawl_once):
    site, _, out, drv, res = crawl_once
    # final URL-seen set == BFS-reachable robots-allowed URL set
    assert res.pages_fetched == len(site.expected_seen)
    imgs = read_images_table(str(out))
    assert imgs.equals(site.expected_images)  # bit-identical images table


def test_image_row_invariants(crawl_once):
    site, _, out, *_ = crawl_once
    imgs = read_images_table(str(out)).to_pylist()
    assert imgs, "no images crawled"
    for r in imgs[:25]:
        px = decode_image(r["bytes"], r["fmt"])
        assert px.shape == (r["h"], r["w"], 3)
        # re-decode equals itself; lossy codecs satisfied PSNR at encode time
        assert psnr(px, px) == float("inf")
        assert isinstance(r["caption"], str) and r["caption"]


def test_crawl_parallelism_invariant(ray_session, small_site, tmp_path_factory):
    """North rule: identical final state across parallelism levels (stand-in
    for N vs 4N nodes: different actor-pool sizes + batch sizes)."""
    site, site_dir = small_site
    out_a = tmp_path_factory.mktemp("par_a")
    out_b = tmp_path_factory.mktemp("par_b")
    _, res_a = _run(site_dir, out_a, fetch_concurrency=1, batch_size=16)
    _, res_b = _run(site_dir, out_b, fetch_concurrency=4, batch_size=256)
    assert res_a.pages_fetched == res_b.pages_fetched
    assert res_a.seen_size == res_b.seen_size
    assert read_images_table(str(out_a)).equals(read_images_table(str(out_b)))
    # brand first-wins upsert is content-deterministic regardless of which
    # parallel discoverer "wins" the seen-set race
    assert _read_entity_records(out_a, "brands") == _read_entity_records(out_b, "brands")


def _read_entity_records(out_dir, table: str) -> list[str]:
    import os

    from crawler_ray.sources.io import read_parts_table

    tbl = read_parts_table(os.path.join(str(out_dir), "tables", table))
    return sorted(tbl["record"].to_pylist()) if tbl is not None else []


def test_brands_table_first_wins(crawl_once):
    """J1 parity: one brand row per distinct (host, brand name), ever."""
    import json

    site, _, out, drv, res = crawl_once
    brands = _read_entity_records(out, "brands")
    assert brands, "site products carry brand names — brands table must exist"
    recs = [json.loads(b) for b in brands]
    keys = [(r["host"], r["brand_name"]) for r in recs]
    assert len(keys) == len(set(keys))  # first-wins: no duplicate brand rows
    # every product's brand appears in the brands table
    prod_brands = {
        (json.loads(p)["host"], json.loads(p)["brand_name"])
        for p in _read_entity_records(out, "products")
        if json.loads(p)["brand_name"]
    }
    assert prod_brands == set(keys)


def test_crawl_quota_splits_hot_host(ray_session, small_site, tmp_path_factory):
    """A tiny per-host quota forces backlog splitting across extra rounds but
    must reach the same final state (hot-host skew handling)."""
    site, site_dir = small_site
    out = tmp_path_factory.mktemp("quota")
    _, res = _run(site_dir, out, quota_per_host=7)
    assert res.pages_fetched == len(site.expected_seen)
    assert res.rounds > 5  # strictly more rounds than the unthrottled crawl
    assert read_images_table(str(out)).equals(site.expected_images)


def test_kill_resume(ray_session, small_site, tmp_path_factory):
    """North rule: kill mid-crawl, resume from checkpoint, identical output."""
    site, site_dir = small_site
    out = tmp_path_factory.mktemp("resume")
    # run only rounds 0..1, then abandon the driver (simulated kill)
    cfg = CrawlConfig(fixture_dir=site_dir, out_dir=str(out), quota_per_host=50,
                      fetch_concurrency=2, num_seen_shards=2)
    drv1 = CrawlDriver(cfg)
    drv1.run(stop_after_round=1)
    drv1.shutdown()
    partial = read_images_table(str(out))
    assert partial.num_rows < site.expected_images.num_rows  # genuinely mid-run

    # fresh driver (fresh seen-set actors) resumes from the checkpoint
    drv2 = CrawlDriver(cfg)
    res = drv2.run(resume=True)
    drv2.shutdown()
    assert res.pages_fetched == len(site.expected_seen) - 0  # totals preserved
    assert read_images_table(str(out)).equals(site.expected_images)


def test_round_retry_after_task_failure(ray_session, small_site,
                                        tmp_path_factory):
    """Recovery unit is the ROUND: a stage task that dies mid-round (after
    sibling tasks have already mutated the seen-set and written sink parts)
    must NOT be retried at the Ray task level — the whole round rolls back
    to the last complete checkpoint (pristine state for round 0) and
    re-runs, producing bit-identical golden output. With retries exhausted
    the failure surfaces instead of silently dropping rows."""
    import os

    site, site_dir = small_site
    out = tmp_path_factory.mktemp("roundretry")
    marker = str(out / "poison_once")
    cfg = CrawlConfig(
        fixture_dir=site_dir, out_dir=str(out), quota_per_host=50,
        fetch_concurrency=2, num_seen_shards=2, fail_once_marker=marker,
    )
    drv = CrawlDriver(cfg)
    res = drv.run()
    drv.shutdown()
    assert os.path.exists(marker)  # the injected failure actually fired
    assert res.pages_fetched == len(site.expected_seen)
    assert read_images_table(str(out)).equals(site.expected_images)

    # retries exhausted -> loud failure, not silent row loss
    out2 = tmp_path_factory.mktemp("roundretry0")
    cfg2 = CrawlConfig(
        fixture_dir=site_dir, out_dir=str(out2), quota_per_host=50,
        fetch_concurrency=2, num_seen_shards=2,
        fail_once_marker=str(out2 / "poison"), round_retries=0,
    )
    drv2 = CrawlDriver(cfg2)
    with pytest.raises(Exception):
        drv2.run()
    drv2.shutdown()


def test_resume_without_complete_checkpoint_prunes_partials(
    ray_session, small_site, tmp_path_factory
):
    """A crash during round 0 leaves partial sink parts but no complete
    checkpoint; resume must prune them before re-running — part names are
    content-derived from batch composition, so a re-run at a different
    width would otherwise leave duplicate rows beside the new parts."""
    import shutil

    site, site_dir = small_site
    out = tmp_path_factory.mktemp("r0crash")
    cfg = CrawlConfig(fixture_dir=site_dir, out_dir=str(out),
                      quota_per_host=50, fetch_concurrency=2,
                      num_seen_shards=2)
    drv1 = CrawlDriver(cfg)
    drv1.run(stop_after_round=1)
    drv1.shutdown()
    # demote BOTH rounds to "crashed before any complete checkpoint":
    # markers gone, but image/table parts already on disk
    import glob
    import os

    for m in glob.glob(os.path.join(str(out), "round_*", "_COMPLETE")):
        os.remove(m)
    assert read_images_table(str(out)).num_rows > 0  # partials present

    drv2 = CrawlDriver(CrawlConfig(
        fixture_dir=site_dir, out_dir=str(out), quota_per_host=50,
        fetch_concurrency=4, num_seen_shards=2, batch_size=256,  # new width
    ))
    res = drv2.run(resume=True)
    drv2.shutdown()
    assert res.pages_fetched == len(site.expected_seen)
    # no duplicated rows from the crashed attempt's differently-named parts
    assert read_images_table(str(out)).equals(site.expected_images)
    shutil.rmtree(str(out), ignore_errors=True)


def test_corrupt_image_payload_dead_lettered():
    """A 200-status image whose decode raises must land in dead letters
    (status 422) — not silently vanish from both the images table and the
    error accounting."""
    import pyarrow as pa

    from crawler_ray.functions.codecs import encode_png
    from crawler_ray.stages.process import CrawlProcessStage

    class FakeSeen:
        def check_and_insert(self, keys):
            return np.zeros(len(keys), dtype=bool)

    stage = CrawlProcessStage(None, [], FakeSeen(), {})
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    fetched = pa.table({
        "url": ["http://h/img/ok.png", "http://h/img/bad.png"],
        "host": ["h", "h"],
        "kind": ["image", "image"],
        "depth": [0, 0],
        "priority": [0.0, 0.0],
        "seed_id": ["s", "s"],
        "caption": ["a", "b"],
        "status": pa.array([200, 200], pa.int32()),
        "payload": pa.array([good, b"\x89PNG truncated-garbage"], pa.binary()),
    })
    out: list[dict] = []
    stage._process_images(fetched, out)
    kinds = [(r["row_type"], r.get("status")) for r in out]
    assert ("image", None) in [(t, None) for t, _ in kinds]  # good row kept
    errs = [r for r in out if r["row_type"] == "error"]
    assert len(errs) == 1
    assert errs[0]["status"] == 422
    assert errs[0]["url"] == "http://h/img/bad.png"


def test_error_pages_dead_lettered(crawl_once):
    import os

    import pyarrow.parquet as pq

    from crawler_ray.sources.io import read_parts_table

    site, _, out, drv, res = crawl_once
    err_root = os.path.join(str(out), "errors")
    n_500 = site.pages.to_pandas().query("status != 200").shape[0]
    if n_500 == 0:
        pytest.skip("fixture generated no error pages")
    assert res.errors > 0
    tbl = read_parts_table(err_root)
    assert tbl is not None and tbl.num_rows == res.errors


def test_entity_tables_written(crawl_once):
    import json
    import os

    import pyarrow.parquet as pq

    from crawler_ray.sources.io import read_parts_table

    site, _, out, *_ = crawl_once
    cat_root = os.path.join(str(out), "tables", "categories")
    assert os.path.isdir(cat_root)
    cats = read_parts_table(cat_root).to_pylist()
    recs = [json.loads(c["record"]) for c in cats]
    # adjacency-list tree: every non-root parent exists
    ids = {r["id"] for r in recs}
    for r in recs:
        if r["parent_id"] is not None:
            assert r["parent_id"] in ids


def test_frontier_never_driver_resident(crawl_once):
    """VERDICT round-1 #5: between rounds the frontier exists only as the
    checkpoint's per-round parquet dir (plus object-store blocks inside an
    execution); the driver holds paths + counters. Asserts (a) the crawl
    module has no driver-side selection helper wired in, (b) every round's
    checkpointed frontier row count equals lineage successors + backlog."""
    import os

    import pyarrow.parquet as pq

    from crawler_ray.pipelines import crawl as crawl_mod

    assert not hasattr(crawl_mod, "split_selected")
    site, _, out, drv, res = crawl_once
    for key, lin in drv.lineage.items():
        if not key.startswith("round_"):
            continue
        from crawler_ray.sources.io import read_parts_table

        rnd = int(key.split("_")[1])
        fdir = drv.ckpt.frontier_dir(rnd)
        tbl = read_parts_table(fdir) if os.path.isdir(fdir) else None
        rows = tbl.num_rows if tbl is not None else 0
        assert rows == lin["successors"] + lin["backlog"], key


def test_big_seed_streaming_path_equivalence(ray_session, tmp_path_factory):
    """The big-seed streaming round (the ingest/scaling headline: seeds
    stream straight into the fused stage, in-stage admission, no selection
    shuffle) must produce the BIT-IDENTICAL images table as the
    quota-selection path over the same seed list."""
    import pyarrow.parquet as pq

    from crawler_ray.sources.synthetic import generate_image_frontier

    fix = tmp_path_factory.mktemp("bigseed_fix")
    seeds = generate_image_frontier(400, n_hosts=8, img_sizes=(16,))
    pq.write_table(seeds, str(fix / "seeds.parquet"))
    (fix / "robots.json").write_text("{}")
    synth = {"seed": 42, "img_sizes": [16], "robots_frac": 0.0}

    out_a = tmp_path_factory.mktemp("bigseed_a")
    _, res_a = _run(
        str(fix), out_a, quota_per_host=10**9, synth_images=synth,
        big_seed_threshold=100,  # forces the streaming path
    )
    out_b = tmp_path_factory.mktemp("bigseed_b")
    _, res_b = _run(
        str(fix), out_b, quota_per_host=10**9, synth_images=synth,
        big_seed_threshold=10**9,  # forces the quota-selection path
    )
    n_distinct = len(set(seeds["url"].to_pylist()))  # dup_frac plants dup URLs
    assert res_a.rounds == 1 and res_a.pages_fetched == n_distinct
    assert res_a.pages_fetched == res_b.pages_fetched
    assert res_a.images_written == res_b.images_written > 0
    a = read_images_table(str(out_a))
    b = read_images_table(str(out_b))
    assert a.equals(b)


def test_driver_metrics_scalar_per_round(ray_session, small_site, tmp_path_factory):
    """Round-2 VERDICT #5: the driver's metrics dict must stay O(rounds) —
    per-(host, kind) rows live in the round checkpoint, not driver memory."""
    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver

    site, fix_dir = small_site
    out = tmp_path_factory.mktemp("metrics_out")
    drv = CrawlDriver(CrawlConfig(
        fixture_dir=fix_dir, out_dir=str(out), quota_per_host=50,
        fetch_concurrency=2, num_seen_shards=2,
    ))
    res = drv.run()
    try:
        total_from_ckpt = 0
        for key, val in drv.metrics.items():
            if key == "_totals":
                continue
            # scalars only — no per-host lists on the driver
            assert all(not isinstance(v, (list, dict)) for v in val.values()), (key, val)
            rnd = int(key.split("_")[1])
            t = drv.ckpt.read_host_metrics(rnd)
            if t is not None:
                assert set(t.column_names) == {"host", "kind", "pages", "errors"}
                total_from_ckpt += sum(t["pages"].to_pylist())
        # checkpointed per-host rows reconcile with the driver's scalar total
        assert total_from_ckpt == res.pages_fetched
    finally:
        drv.shutdown()


def test_seen_shard_actor_death_mid_round_heals_and_matches(
    ray_session, small_site, tmp_path_factory
):
    """Actor-failure recovery (round-5 verdict item 2): a seen-shard STATE
    ACTOR is killed mid-round (no_restart — simulated node loss) by the
    first round task to claim the injection marker, possibly after sibling
    tasks mutated other shards and wrote sink parts. The round must fail
    (max_retries=0 surfaces the RayActorError), the driver must RESPAWN the
    dead shard (SeenSet.heal), restore every shard from the last complete
    checkpoint, re-run the round, and still produce the bit-identical golden
    images table and exact URL-seen count."""
    import os

    import ray as _ray

    site, site_dir = small_site
    out = tmp_path_factory.mktemp("crawl_actor_kill")
    marker = str(out / "kill_marker")
    cfg = CrawlConfig(
        fixture_dir=site_dir,
        out_dir=str(out),
        quota_per_host=50,
        fetch_concurrency=2,
        num_seen_shards=2,
        kill_actor_once_marker=marker,
    )
    drv = CrawlDriver(cfg)
    shard0_before = drv.seen.shards[0]
    res = drv.run()
    assert os.path.exists(marker), "injected actor kill never fired"
    # the dead shard really was replaced by a fresh actor
    assert drv.seen.shards[0] != shard0_before
    with pytest.raises(_ray.exceptions.RayActorError):
        _ray.get(shard0_before.size.remote())
    drv.shutdown()
    assert res.pages_fetched == len(site.expected_seen)
    assert read_images_table(str(out)).equals(site.expected_images)


def test_seen_shard_actor_death_fresh_driver_resume(
    ray_session, small_site, tmp_path_factory
):
    """Same failure, recovered by a FRESH driver: run to round 1, kill a
    seen shard AND a politeness actor (driver abandoned mid-crawl with dead
    state actors), then resume with a new CrawlDriver — rollback restores
    from the checkpoint into the new driver's actors and the final state is
    bit-identical to an uninterrupted run."""
    import ray as _ray

    site, site_dir = small_site
    out = tmp_path_factory.mktemp("crawl_actor_kill_resume")
    base = dict(
        fixture_dir=site_dir,
        out_dir=str(out),
        quota_per_host=50,
        fetch_concurrency=2,
        num_seen_shards=2,
    )
    drv1 = CrawlDriver(CrawlConfig(**base))
    drv1.run(stop_after_round=1)
    _ray.kill(drv1.seen.shards[1], no_restart=True)
    if drv1.politeness:
        _ray.kill(drv1.politeness[0], no_restart=True)
    # driver 1 is abandoned (no shutdown — its surviving actors are leaked
    # until the session ends, as a crashed driver's would be)

    drv2 = CrawlDriver(CrawlConfig(**base))
    res = drv2.run(resume=True)
    drv2.shutdown()
    drv1.shutdown()
    assert res.pages_fetched == len(site.expected_seen)
    assert read_images_table(str(out)).equals(site.expected_images)
