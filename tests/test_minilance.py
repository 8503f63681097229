"""Vendored Lance stand-in (``crawler_ray.vendor.minilance``): the north-rule
sink's Lance code paths executed FOR REAL in this sandbox (VERDICT round-3
item #8 — previously only mock-tested).

Covers: single-process round-trip + versioning/time-travel/append semantics,
fragments-first-manifest-last atomicity, the Ray Data Datasource (one block
per fragment, pruned columns) and Datasink (distributed fragment writes, one
atomic commit), the ``sources/io`` dispatch surface under
``CRAWLER_RAY_LANCE=mini``, and an end-to-end CRAWL whose every sink
(images, entities, errors, frontier checkpoints) is a minilance dataset —
asserting the images table is bit-identical to the site ground truth, i.e.
identical to what the parquet-mode crawl produces.
"""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from crawler_ray.vendor import minilance


def _t(n=10, off=0):
    return pa.table(
        {
            "image_id": pa.array([f"id{off + i}" for i in range(n)], pa.string()),
            "bytes": pa.array([b"x" * (i + 1) for i in range(n)], pa.binary()),
            "caption": pa.array([f"cap {off + i}" for i in range(n)], pa.string()),
            "phash": pa.array(list(range(off, off + n)), pa.int64()),
        }
    )


# ---------------------------------------------------------------- unit layer


def test_roundtrip_schema_count_and_column_pruning(tmp_path):
    uri = str(tmp_path / "ds.lance")
    t = _t(7)
    minilance.write_dataset(t, uri)
    ds = minilance.dataset(uri)
    assert ds.schema.equals(t.schema)
    assert ds.count_rows() == 7
    assert ds.to_table().equals(t)
    pruned = ds.to_table(columns=["caption", "phash"])
    assert pruned.column_names == ["caption", "phash"]
    assert pruned.equals(t.select(["caption", "phash"]))


def test_create_append_overwrite_versions_and_time_travel(tmp_path):
    uri = str(tmp_path / "ds.lance")
    minilance.write_dataset(_t(3), uri, mode="create")
    with pytest.raises(ValueError, match="already exists"):
        minilance.write_dataset(_t(3), uri, mode="create")
    minilance.write_dataset(_t(2, off=3), uri, mode="append")
    assert minilance.dataset(uri).count_rows() == 5
    minilance.write_dataset(_t(1, off=9), uri, mode="overwrite")
    ds = minilance.dataset(uri)
    assert ds.versions() == [1, 2, 3]
    assert ds.count_rows() == 1  # latest = overwrite
    # time travel: every old version still reads exactly
    assert minilance.dataset(uri, version=1).to_table().equals(_t(3))
    v2 = minilance.dataset(uri, version=2).to_table()
    assert v2.equals(pa.concat_tables([_t(3), _t(2, off=3)]))
    with pytest.raises(ValueError, match="version 9"):
        minilance.dataset(uri, version=9)


def test_append_schema_mismatch_rejected(tmp_path):
    uri = str(tmp_path / "ds.lance")
    minilance.write_dataset(_t(2), uri)
    bad = pa.table({"other": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="schema mismatch"):
        minilance.write_dataset(bad, uri, mode="append")


def test_record_batch_reader_streams_to_multiple_fragments(tmp_path):
    uri = str(tmp_path / "ds.lance")
    t = _t(100)
    reader = pa.RecordBatchReader.from_batches(t.schema, t.to_batches(max_chunksize=10))
    minilance.write_dataset(reader, uri, max_rows_per_file=30)
    ds = minilance.dataset(uri)
    assert ds.to_table().equals(t)
    assert len(ds.get_fragments()) == 4  # 30+30+30+10
    assert [f.count_rows() for f in ds.get_fragments()] == [30, 30, 30, 10]


def test_crash_between_fragment_and_commit_is_invisible(tmp_path):
    """Fragments-first, manifest-last: a writer that dies after landing
    fragment files but before the manifest rename leaves the dataset
    EXACTLY at its previous version — orphan files are never read."""
    uri = str(tmp_path / "ds.lance")
    minilance.write_dataset(_t(4), uri)
    before = minilance.dataset(uri).to_table()
    # simulate the crash: fragment written, commit never reached
    minilance.write_fragment(_t(50, off=100), uri)
    ds = minilance.dataset(uri)
    assert ds.version == 1 and ds.to_table().equals(before)
    # orphan exists on disk but no manifest references it
    n_files = len(glob.glob(os.path.join(uri, "data", "*.lance")))
    assert n_files == 2
    assert len(ds.get_fragments()) == 1


def test_commit_race_for_same_version_rejected(tmp_path):
    uri = str(tmp_path / "ds.lance")
    minilance.write_dataset(_t(2), uri)
    f1 = minilance.write_fragment(_t(1, off=10), uri)
    f2 = minilance.write_fragment(_t(1, off=20), uri)
    minilance.commit(uri, _t(1).schema, [f1], mode="append")
    with pytest.raises(OSError, match="already committed"):
        # a lagging second committer targeting the same version number
        manifest_version = minilance._list_versions(uri)[-1]
        minilance._commit_manifest(
            uri,
            {
                "format": "minilance/1",
                "version": manifest_version,
                "schema": minilance._schema_to_b64(_t(1).schema),
                "fragments": [{**f2, "id": 0}],
            },
        )


def test_compact_files_merges_small_fragments(tmp_path):
    """compact_files coalesces adjacent small fragments into target-size ones
    as a NEW committed version: row order preserved, full-size fragments
    carried over by reference (not rewritten), old versions still
    time-travel."""
    uri = str(tmp_path / "ds.lance")
    t = _t(100)
    reader = pa.RecordBatchReader.from_batches(t.schema, t.to_batches(max_chunksize=5))
    minilance.write_dataset(reader, uri, max_rows_per_file=10)  # 10 fragments
    big = _t(50, off=200)
    minilance.write_dataset(big, uri, mode="append")  # 1 full fragment
    before = minilance.dataset(uri)
    assert len(before.get_fragments()) == 11
    big_path = before.get_fragments()[10].path

    res = minilance.compact_files(uri, target_rows_per_fragment=40)
    ds = minilance.dataset(uri)
    assert res["version"] == ds.version == 3
    assert res["fragments_removed"] == 10
    # 100 small rows at target 40 → 40+40+20, plus the untouched big fragment
    assert [f.count_rows() for f in ds.get_fragments()] == [40, 40, 20, 50]
    # the already-full fragment was carried over by REFERENCE, not rewritten
    assert ds.get_fragments()[3].path == big_path
    # row order preserved exactly
    assert ds.to_table().equals(pa.concat_tables([t, big]))
    # time travel to the pre-compaction version still works
    assert minilance.dataset(uri, version=2).to_table().equals(
        pa.concat_tables([t, big])
    )
    # compacting an already-compact dataset is a no-op (no version bump)
    res2 = minilance.compact_files(uri, target_rows_per_fragment=40)
    assert res2["version"] is None and minilance.dataset(uri).version == 3


def test_cleanup_old_versions_reclaims_unreferenced_files(tmp_path):
    uri = str(tmp_path / "ds.lance")
    minilance.write_dataset(_t(10), uri)
    minilance.write_dataset(_t(5, off=10), uri, mode="overwrite")
    minilance.write_dataset(_t(3, off=20), uri, mode="append")
    # plus an orphan from a crashed write — GC must reclaim it too
    minilance.write_fragment(_t(7, off=50), uri)
    assert minilance.dataset(uri).versions() == [1, 2, 3]
    n_files = len(os.listdir(os.path.join(uri, "data")))
    assert n_files == 4

    res = minilance.cleanup_old_versions(uri, keep_versions=1)
    # dropped: v1+v2 manifests; reclaimed: v1's fragment + the orphan
    # (v2's fragments survive — v3 still references them via append)
    assert res["versions_removed"] == 2
    assert res["files_removed"] == 2
    assert res["bytes_reclaimed"] > 0
    ds = minilance.dataset(uri)
    assert ds.versions() == [3]
    assert ds.count_rows() == 8
    expect = pa.concat_tables([_t(5, off=10), _t(3, off=20)])
    assert ds.to_table().equals(expect)
    with pytest.raises(ValueError):
        minilance.dataset(uri, version=1)
    with pytest.raises(ValueError):
        minilance.cleanup_old_versions(uri, keep_versions=0)


def test_empty_table_roundtrip(tmp_path):
    uri = str(tmp_path / "ds.lance")
    t = _t(0)
    minilance.write_dataset(t, uri)
    ds = minilance.dataset(uri)
    assert ds.count_rows() == 0
    assert ds.to_table().schema.equals(t.schema)


# ------------------------------------------------------------ ray data layer


def test_ray_read_one_block_per_fragment_with_pruning(ray_session, tmp_path):
    from crawler_ray.sources.lance_ray import read_minilance

    uri = str(tmp_path / "ds.lance")
    t = _t(90)
    minilance.write_dataset(t, uri, max_rows_per_file=30)
    ds = read_minilance(uri)
    out = ds.take_all()
    assert len(out) == 90
    got = pa.Table.from_pylist(out).sort_by("image_id")
    assert got.sort_by("image_id").to_pydict() == t.sort_by("image_id").to_pydict()
    # fragment-planned read: one read TASK per fragment, with real metadata
    # (Ray may further split each task's output blocks downstream)
    from crawler_ray.sources.lance_ray import MiniLanceDatasource

    tasks = MiniLanceDatasource(uri).get_read_tasks(parallelism=64)
    assert len(tasks) == 3
    assert [m.num_rows for m in (t.metadata for t in tasks)] == [30, 30, 30]
    assert all(m.size_bytes and m.input_files for m in (t.metadata for t in tasks))
    # column projection pushed into the fragment read
    pruned = read_minilance(uri, columns=["phash"]).take_all()
    assert all(set(r) == {"phash"} for r in pruned[:5])
    assert sorted(r["phash"] for r in pruned) == list(range(90))


def test_ray_read_time_travel(ray_session, tmp_path):
    from crawler_ray.sources.lance_ray import read_minilance

    uri = str(tmp_path / "ds.lance")
    minilance.write_dataset(_t(5), uri)
    minilance.write_dataset(_t(3, off=50), uri, mode="overwrite")
    assert read_minilance(uri).count() == 3
    old = read_minilance(uri, version=1)
    assert old.count() == 5


def test_ray_datasink_distributed_write_then_read_back(ray_session, tmp_path):
    import ray.data as rd

    from crawler_ray.sources.lance_ray import read_minilance, write_minilance

    uri = str(tmp_path / "sink.lance")
    t = _t(200)
    ds = rd.from_arrow(t).repartition(8)
    write_minilance(ds, uri, mode="create")
    got = minilance.dataset(uri)
    assert got.count_rows() == 200
    assert got.to_table().sort_by("image_id").equals(t.sort_by("image_id"))
    # distributed fragment writes: more than one fragment landed, and the
    # manifest references every one exactly once
    assert len(got.get_fragments()) > 1
    # append a second distributed write
    t2 = _t(40, off=500)
    write_minilance(rd.from_arrow(t2).repartition(2), uri, mode="append")
    allrows = read_minilance(uri).take_all()
    assert len(allrows) == 240
    ids = sorted(r["image_id"] for r in allrows)
    expect = sorted(t["image_id"].to_pylist() + t2["image_id"].to_pylist())
    assert ids == expect


# ------------------------------------------------------- io dispatch surface


@pytest.fixture
def mini_env(monkeypatch):
    monkeypatch.setenv("CRAWLER_RAY_LANCE", "mini")


def test_io_write_part_minilance_retry_idempotent(mini_env, tmp_path):
    from crawler_ray.sources import io as io_mod

    t = _t(4)
    root = str(tmp_path / "images" / "round_0000")
    path = io_mod.write_part(t, root, "d1g3st")
    assert path.endswith("part-d1g3st.lance")
    assert minilance.dataset(path).to_table().equals(t)
    # task retry: same content-derived stem → mode=overwrite → latest
    # version holds the rows ONCE (no duplicate fragment visible)
    io_mod.write_part(t, root, "d1g3st")
    ds = minilance.dataset(path)
    assert ds.count_rows() == 4 and ds.versions() == [1, 2]


def test_io_read_parts_and_table_dispatch_on_writer_format(
    mini_env, ray_session, tmp_path
):
    from crawler_ray.sources import io as io_mod

    t1, t2 = _t(3), _t(2, off=3)
    io_mod.write_part(t1, str(tmp_path / "round_0000"), "aaa")
    io_mod.write_part(t2, str(tmp_path / "round_0001"), "bbb")
    # distributed read unions the per-part minilance datasets
    ds = io_mod.read_parts(str(tmp_path), columns=["image_id", "phash"])
    rows = sorted(ds.take_all(), key=lambda r: r["image_id"])
    assert [r["image_id"] for r in rows] == [f"id{i}" for i in range(5)]
    assert all(set(r) == {"image_id", "phash"} for r in rows)
    # driver-side concat read
    tbl = io_mod.read_parts_table(str(tmp_path))
    assert tbl.sort_by("image_id").equals(
        pa.concat_tables([t1, t2]).sort_by("image_id")
    )


def test_io_write_table_and_read_table_roundtrip(mini_env, ray_session, tmp_path):
    import ray.data as rd

    from crawler_ray.sources import io as io_mod

    uri = str(tmp_path / "tbl.lance")
    t = _t(25)
    io_mod.write_table(rd.from_arrow(t).repartition(3), uri)
    back = io_mod.read_table(uri)
    got = back.take_all()
    assert sorted(r["phash"] for r in got) == list(range(25))
    assert {r["image_id"] for r in got} == {f"id{i}" for i in range(25)}


def test_io_compact_parts_to_single_lance_table(mini_env, ray_session, tmp_path):
    from crawler_ray.sources import io as io_mod

    root = str(tmp_path / "parts")
    for i, stem in enumerate(("aaa", "bbb", "ccc")):
        io_mod.write_part(_t(4, off=4 * i), os.path.join(root, f"round_{i:04d}"), stem)
    dest = str(tmp_path / "final.lance")
    n = io_mod.compact_parts(root, dest)
    assert n == 12
    assert minilance.is_dataset(dest)
    got = minilance.dataset(dest).to_table().sort_by("image_id")
    assert got["phash"].to_pylist() == sorted(range(12), key=lambda i: f"id{i}")


def test_io_read_parts_mixed_format_dir(mini_env, ray_session, tmp_path, monkeypatch):
    """A crawl resumed with CRAWLER_RAY_LANCE flipped leaves a part dir with
    BOTH formats — possibly the same content-addressed stem twice. Both
    readers must see each stem exactly once and read both formats (round-4
    advice: read_parts dropped all parquet rows; read_parts_table
    double-counted same-stem rewrites)."""
    from crawler_ray.sources import io as io_mod

    root = str(tmp_path / "images")
    t_lance, t_pq, t_both = _t(3), _t(2, off=3), _t(2, off=5)
    io_mod.write_part(t_lance, os.path.join(root, "round_0000"), "aaa", fmt="minilance")
    io_mod.write_part(t_pq, os.path.join(root, "round_0000"), "bbb", fmt="parquet")
    # same stem written in both formats (retry after the env flip): content-
    # addressed stems mean identical content — must count ONCE
    io_mod.write_part(t_both, os.path.join(root, "round_0001"), "ccc", fmt="parquet")
    io_mod.write_part(t_both, os.path.join(root, "round_0001"), "ccc", fmt="minilance")

    expect = pa.concat_tables([t_lance, t_pq, t_both]).sort_by("image_id")
    tbl = io_mod.read_parts_table(root)
    assert tbl.sort_by("image_id").equals(expect)
    rows = io_mod.read_parts(root).take_all()
    assert sorted(r["image_id"] for r in rows) == expect["image_id"].to_pylist()
    # and identically with the env var dropped (dispatch on writer output)
    monkeypatch.delenv("CRAWLER_RAY_LANCE")
    rows2 = io_mod.read_parts(root, columns=["image_id"]).take_all()
    assert sorted(r["image_id"] for r in rows2) == expect["image_id"].to_pylist()


def test_io_read_table_autodetects_minilance_without_env(
    mini_env, ray_session, tmp_path, monkeypatch
):
    """Data written under CRAWLER_RAY_LANCE=mini must stay readable via
    read_table once the env var is unset (round-4 advice: the read path was
    env-gated and fell through to read_parquet on a minilance dir)."""
    import ray.data as rd

    from crawler_ray.sources import io as io_mod

    uri = str(tmp_path / "tbl.lance")
    t = _t(12)
    io_mod.write_table(rd.from_arrow(t), uri)
    monkeypatch.delenv("CRAWLER_RAY_LANCE")
    got = io_mod.read_table(uri, columns=["image_id", "caption"]).take_all()
    assert sorted(r["image_id"] for r in got) == sorted(f"id{i}" for i in range(12))
    assert all(set(r) == {"image_id", "caption"} for r in got)


def test_datasink_empty_overwrite_truncates(ray_session, tmp_path):
    """write_minilance(empty_ds, uri, mode='overwrite') publishes an EMPTY
    version rather than leaving the previous rows visible (round-4 advice)."""
    import ray.data as rd

    from crawler_ray.sources.lance_ray import write_minilance

    uri = str(tmp_path / "trunc.lance")
    t = _t(6)
    write_minilance(rd.from_arrow(t), uri, mode="create")
    assert minilance.dataset(uri).count_rows() == 6
    empty = rd.from_arrow(t).filter(lambda r: False)
    write_minilance(empty, uri, mode="overwrite")
    ds = minilance.dataset(uri)
    assert ds.count_rows() == 0
    assert ds.versions() == [1, 2]
    assert ds.schema.equals(t.schema)
    # append of zero rows stays a no-op (no version bump)
    write_minilance(empty, uri, mode="append")
    assert minilance.dataset(uri).versions() == [1, 2]
    # time travel still serves the pre-truncate rows
    assert minilance.dataset(uri, version=1).count_rows() == 6


# ------------------------------------------------------------------ e2e crawl


def test_crawl_end_to_end_all_sinks_minilance(
    mini_env, ray_session, small_site, tmp_path_factory
):
    """The full crawl with EVERY sink (images, entities, errors, pages,
    frontier checkpoints) written as minilance datasets: the Lance branch of
    write_part/read_parts/read_parts_table executes for real across worker
    processes (format threaded through the stage init args, not env), the
    per-round frontier is read back from minilance parts, and the final
    images table is bit-identical to the site ground truth — the exact
    equality the parquet-mode crawl test asserts."""
    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver, read_images_table

    site, site_dir = small_site
    out = tmp_path_factory.mktemp("crawl_lance")
    cfg = CrawlConfig(
        fixture_dir=site_dir,
        out_dir=str(out),
        quota_per_host=50,
        fetch_concurrency=2,
        num_seen_shards=2,
    )
    drv = CrawlDriver(cfg)
    res = drv.run()
    drv.shutdown()
    assert res.pages_fetched == len(site.expected_seen)
    # the sinks really are minilance datasets, not parquet
    lance_parts = glob.glob(str(out / "images" / "round_*" / "part-*.lance"))
    assert lance_parts, "no minilance image parts written"
    assert all(minilance.is_dataset(p) for p in lance_parts)
    assert not glob.glob(str(out / "images" / "round_*" / "*.parquet"))
    imgs = read_images_table(str(out))
    assert imgs.equals(site.expected_images)


def test_crawl_kill_resume_minilance(
    mini_env, ray_session, small_site, tmp_path_factory
):
    """Kill mid-crawl and resume with every checkpoint (frontier parts
    included) stored as minilance datasets: the resume path's distributed
    ``read_parts`` over minilance parts must reconstruct the frontier
    exactly, yielding the same final images table as an uninterrupted run."""
    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver, read_images_table

    site, site_dir = small_site
    out = tmp_path_factory.mktemp("resume_lance")
    cfg = CrawlConfig(
        fixture_dir=site_dir,
        out_dir=str(out),
        quota_per_host=50,
        fetch_concurrency=2,
        num_seen_shards=2,
    )
    drv1 = CrawlDriver(cfg)
    drv1.run(stop_after_round=1)
    drv1.shutdown()
    assert read_images_table(str(out)).num_rows < site.expected_images.num_rows

    drv2 = CrawlDriver(cfg)
    res = drv2.run(resume=True)
    drv2.shutdown()
    assert res.pages_fetched == len(site.expected_seen)
    assert read_images_table(str(out)).equals(site.expected_images)
