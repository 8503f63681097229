"""Round-based BFS crawl driver — the Ray-Data-native restructuring of the
reference's whole-crawl lifecycle (SURVEY.md §3).

Each round is a Dataset pipeline over the current frontier:

    frontier_k (Arrow table, quota-selected per host)
      → map_batches(SyntheticFetchStage, concurrency=F)     actor pool (ST3)
      → [materialize once per round]
      → images:  map_batches(ImageStage(seen), ...)         → images/round_k/
      → pages:   map_batches(parse_pages_batch)             stateless tasks
          → successors → RobotsFilterStage → SeenFilterStage (anti-join, ST1)
          → entity records → tables/{categories,products}/round_k/
      → dead letters → errors/round_k/                      (S9 lineage)
      → metrics: per-batch partial counts → tiny combine    (A1 pattern)
    frontier_{k+1} = survivors ∪ backlog, per-host quota re-selected

The reference's do/while page loop (``BaseSpider.cs:115-141``) becomes
successor *data* (next-page rows); its thread pool (``BaseSpider.cs:90-114``)
becomes the fetch actor pool; its politeness sleeps become per-round per-host
quotas + token-bucket bookkeeping. Determinism: frontier selection sorts by
(priority desc, url) within hosts — never arrival order — so the final
seen-set and images table are bit-identical across runs AND parallelism
levels (north-rule reproducibility; verified in tests).

Scale notes (10^10-URL design point): the frontier lives in the object store
as Arrow blocks (spillable); per-round state on the driver is only actor
handles + metrics. The pages index inside each fetch actor is a sandbox
stand-in for HTTP (real fetchers hold sessions, not indexes). Seen-set =
``num_shards`` cuckoo actors sized ~1.2e8 keys each (see state/filters.py
sizing note). Checkpoints bound re-work to one round.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import time as _time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from crawler_ray import schemas
from crawler_ray.functions.urls import normalize_url, url_host
from crawler_ray.stages.frontier import RobotsFilterStage, SeenFilterStage, split_selected
from crawler_ray.state.checkpoint import CheckpointManager
from crawler_ray.state.politeness import PolitenessActor
from crawler_ray.state.seen import SeenSet


@dataclass
class CrawlConfig:
    fixture_dir: str  # pages.parquet / seeds.parquet / robots.json
    out_dir: str  # checkpoint + output root
    quota_per_host: int = 200  # per-round per-host politeness budget
    num_seen_shards: int = 4
    seen_capacity: int = 1 << 16
    fetch_concurrency: int = 4
    parse_concurrency: int | None = None  # None = elastic stateless tasks
    batch_size: int = 128
    image_batch_size: int = 32  # wide binary rows → small batches
    max_rounds: int = 1000
    max_attempts: int = 3
    # on-demand image synthesis (dict: seed, img_sizes, robots_frac): image
    # payloads are regenerated inside the fetch actors from the URL alone and
    # image rows are pruned from the broadcast pages index — the per-actor
    # state no longer grows with the site (see stages/fetch.py)
    synth_images: dict | None = None
    # "tasks": fused stage runs as stateless tasks on pre-started workers
    # with per-worker stage caching (no per-round actor-pool spin-up);
    # "actors": classic fixed actor pool (sized by fetch_concurrency)
    fetch_mode: str = "tasks"
    use_politeness_actors: bool = True
    num_politeness_shards: int = 2
    seed: int = 7


@dataclass
class CrawlResult:
    rounds: int
    pages_fetched: int
    images_written: int
    errors: int
    seen_size: int
    metrics: dict = field(default_factory=dict)
    out_dir: str = ""


def _seed_batch_to_frontier(t: pa.Table) -> pa.Table:
    """Vectorized seeds→frontier projection for big-seed streaming rounds
    (generator URLs are already normalized; order is irrelevant because the
    whole seed frontier is admitted in one unconstrained round)."""
    df = t.to_pandas()
    parts = df["url"].str.split("/", n=4, expand=True)
    host = parts[2].str.lower()
    is_img = parts[3].isin(["img", "private"]) if 3 in parts else False
    out = pd.DataFrame(
        {
            "url": df["url"],
            "host": host,
            "kind": np.where(is_img, "image", "category_tree"),
            "depth": np.int32(0),
            "priority": df["priority"].astype("float64"),
            "seed_id": df["seed_id"],
            "caption": "",
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False).cast(schemas.FRONTIER)


class CrawlDriver:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.ckpt = CheckpointManager(cfg.out_dir)
        robots_path = os.path.join(cfg.fixture_dir, "robots.json")
        robots_rules: dict[str, list[str]] = {}
        if os.path.exists(robots_path):
            with open(robots_path) as f:
                robots_rules = json.load(f)
        # robots.txt text per host (RobotsCache parses real robots.txt syntax)
        self.robots_txt = {
            host: "User-agent: *\n" + "\n".join(f"Disallow: {p}" for p in prefixes)
            for host, prefixes in robots_rules.items()
        }
        self.seen = SeenSet.create(
            cfg.num_seen_shards, cfg.seen_capacity, exact=True, seed=cfg.seed
        )
        self.politeness = (
            [
                PolitenessActor.remote(self.robots_txt, virtual=True)
                for _ in range(cfg.num_politeness_shards)
            ]
            if cfg.use_politeness_actors
            else []
        )
        self.metrics: dict[str, dict] = {}
        self.lineage: dict[str, dict] = {}

    def shutdown(self) -> None:
        """Kill this driver's state actors (seen shards, politeness). Each
        actor reserves fractional CPU for the session lifetime — long-lived
        processes that create many drivers MUST release them (tests, CLI,
        bench do; a driver whose actors are killed cannot run() again)."""
        for a in list(self.seen.shards) + list(self.politeness):
            try:
                ray.kill(a)
            except Exception:
                pass
        self.seen.shards = []
        self.politeness = []

    # ------------------------------------------------------------------
    def _seed_frontier(self) -> pa.Table:
        import pyarrow.parquet as pq

        seeds = pq.read_table(os.path.join(self.cfg.fixture_dir, "seeds.parquet"))
        # vectorized frontier build (seed lists can be large for breadth
        # workloads): generator URLs are already in normalized form
        df = seeds.to_pandas()
        parts = df["url"].str.split("/", n=4, expand=True)
        host = parts[2].str.lower()
        is_img = parts[3].isin(["img", "private"]) if 3 in parts else False
        out = pd.DataFrame(
            {
                "url": df["url"],
                "host": host,
                # image-URL seeds (breadth/ingest workloads) vs the
                # category-tree entry points of the BFS site crawl
                "kind": np.where(is_img, "image", "category_tree"),
                "depth": np.int32(0),
                "priority": df["priority"].astype("float64"),
                "seed_id": df["seed_id"],
                "caption": "",
            }
        ).sort_values(["priority", "url"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(out, preserve_index=False).cast(schemas.FRONTIER)

    def _filter_new(self, candidates: pa.Table) -> pa.Table:
        """Robots filter then seen anti-join (driver-side for the seed round
        and round boundaries; in-pipeline stages do the same per batch)."""
        if candidates.num_rows == 0:
            return candidates
        if self.robots_txt:  # fast path: no robots rules → nothing to drop
            candidates = RobotsFilterStage(self.robots_txt)(candidates)
        return SeenFilterStage(self.seen)(candidates)

    # ------------------------------------------------------------------
    def run(self, resume: bool = False, stop_after_round: int | None = None) -> CrawlResult:
        cfg = self.cfg
        _dbg = os.environ.get("CRAWLER_RAY_TIMING")
        _t = _time.monotonic

        def _tick(label, t0):
            if _dbg:
                print(f"[crawl-timing] {label}: {_t() - t0:.2f}s", flush=True)
            return _t()
        start_round = 0
        pending_big_seed = False
        empty_frontier = pa.Table.from_pylist([], schema=schemas.FRONTIER)
        seeds_path = os.path.join(cfg.fixture_dir, "seeds.parquet")

        def _seed_round0():
            """Big seed lists stream straight into round 0 (frontier build,
            robots filter and seen anti-join all happen INSIDE the fused
            stage) — the driver never materializes the seed list. Requires
            an unconstrained quota (breadth/ingest mode); the per-host-quota
            path below stays driver-side."""
            import pyarrow.parquet as _pq

            n = _pq.read_metadata(seeds_path).num_rows
            return n >= 50_000 and cfg.quota_per_host >= n

        if resume:
            latest = self.ckpt.latest_complete_round()
            if latest is not None:
                frontier, snaps, self.metrics, self.lineage = self.ckpt.load_round(latest)
                self.seen.restore(snaps)
                self.ckpt.prune_rounds_after(latest)
                start_round = latest + 1
            elif _seed_round0():
                frontier, pending_big_seed = empty_frontier, True
            else:
                frontier = self._filter_new(self._seed_frontier())
        elif _seed_round0():
            frontier, pending_big_seed = empty_frontier, True
        else:
            frontier = self._filter_new(self._seed_frontier())

        totals = {"pages": 0, "images": 0, "errors": 0}
        for key in ("pages", "images", "errors"):
            totals[key] = int(self.metrics.get("_totals", {}).get(key, 0))

        # broadcast the synthetic pages index once (ray.put → read per actor
        # from the shared object store; never re-shipped per batch). With
        # on-demand image synthesis the image rows are pruned — the index
        # holds only the small non-image pages; a frontier-only fixture may
        # have no pages.parquet at all.
        import pyarrow.parquet as pq

        pages_path = os.path.join(cfg.fixture_dir, "pages.parquet")
        if os.path.exists(pages_path):
            pages_table = pq.read_table(
                pages_path, columns=["url", "payload", "status", "kind"]
            )
            if cfg.synth_images is not None:
                pages_table = pages_table.filter(
                    pc.invert(pc.equal(pages_table["kind"], "image"))
                )
            pages_ref = ray.put(pages_table.drop_columns(["kind"]))
        else:
            pages_ref = None

        rnd = start_round
        while rnd < cfg.max_rounds and (frontier.num_rows > 0 or pending_big_seed):
            t0 = _t()
            if cfg.fetch_mode == "tasks":
                width = int(ray.cluster_resources().get("CPU", cfg.fetch_concurrency))
                target = width * 3
            else:
                target = cfg.fetch_concurrency * 2

            filter_input = False
            if pending_big_seed:
                # stream the seed list straight into the fused stage: the
                # frontier build is a vectorized map; robots + seen dedup of
                # the input happen IN-STAGE (filter_input below)
                pending_big_seed = False
                filter_input = True
                selected, backlog = None, empty_frontier
                ds = rd.read_parquet(seeds_path, override_num_blocks=target).map_batches(
                    _seed_batch_to_frontier, batch_format="pyarrow"
                )
                if cfg.fetch_mode != "tasks":
                    # a FIXED actor pool inside the same execution as its
                    # producer read can reserve every CPU and deadlock —
                    # give the pool a materialized input instead
                    ds = ds.materialize()
                t0 = _tick("seed_stream", t0)
            else:
                selected, backlog = split_selected(frontier, cfg.quota_per_host)
                if selected.num_rows == 0:
                    break
                t0 = _tick("split_selected", t0)
                # from_arrow yields ONE block per table and map parallelism
                # is per block — split the frontier so every fetch worker
                # gets work (no repartition shuffle needed)
                n_blocks = max(
                    1, min(-(-selected.num_rows // cfg.batch_size), target)
                )
                if selected.num_rows >= 50_000:
                    # large frontier: spill to a scratch parquet and read it
                    # back with override_num_blocks — the block split happens
                    # in PARALLEL read tasks instead of a serial driver loop
                    import tempfile

                    import pyarrow.parquet as pq

                    scratch_root = (
                        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
                    )
                    scratch = os.path.join(
                        scratch_root, f"crawler_ray_frontier_{os.getpid()}_{rnd}.parquet"
                    )
                    pq.write_table(selected, scratch, compression="none")
                    ds = rd.read_parquet(
                        scratch, override_num_blocks=n_blocks
                    ).materialize()
                    os.unlink(scratch)
                else:
                    step = -(-selected.num_rows // n_blocks)
                    # take(), not slice(): a zero-copy slice serializes its
                    # FULL parent buffers on ray.put — every "block" would
                    # ship the whole frontier; take() copies only its rows.
                    ds = rd.from_arrow(
                        [
                            selected.take(
                                np.arange(
                                    i * step, min((i + 1) * step, selected.num_rows)
                                )
                            )
                            for i in range(n_blocks)
                        ]
                    )
                t0 = _tick("slice_blocks", t0)

            # ONE fused execution per round: fetch → decode/parse → robots →
            # seen anti-join (see stages/process.py for the fusion
            # rationale). Branch extraction below is cheap filters over the
            # materialized union-schema result.
            from crawler_ray.stages.process import CrawlProcessStage, make_process_fn

            init_args = (
                pages_ref,
                self.politeness,
                self.seen,
                self.robots_txt,
                cfg.max_attempts,
                cfg.synth_images,
                self.ckpt.images_dir(rnd),  # direct image sink in-stage
                filter_input,
            )
            if cfg.fetch_mode == "tasks":
                # stateless tasks on pre-started workers, stage cached per
                # worker — no per-round actor-pool spin-up (stages/process.py)
                processed = ds.map_batches(
                    make_process_fn(ray.put(init_args)),
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                ).materialize()
            else:
                processed = ds.map_batches(
                    CrawlProcessStage,
                    fn_constructor_args=init_args,
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                    # fixed-size pool: Ray's autoscaling pool tends to stay at
                    # its minimum for bursty per-round executions; the input
                    # is pre-materialized so a fixed pool cannot starve its
                    # producer
                    concurrency=cfg.fetch_concurrency,
                    num_cpus=1,
                ).materialize()
            t0 = _tick("process", t0)

            # ONE counting pass over the (image-free, lightweight) control
            # output decides which branch extractions are needed at all
            def _count_types(t: pa.Table) -> pa.Table:
                df = t.select(["row_type", "status"]).to_pandas()
                g = (
                    df.groupby("row_type")
                    .agg(n=("row_type", "size"), s=("status", "sum"))
                    .reset_index()
                )
                return pa.Table.from_pandas(g, preserve_index=False)

            cdf = (
                processed.map_batches(_count_types, batch_format="pyarrow")
                .to_pandas()
                .groupby("row_type")[["n", "s"]]
                .sum()
            )
            counts = cdf["n"].to_dict()
            # images arrive either as per-row markers or per-batch
            # image_stat summaries (status = rows written in that batch)
            n_imgs = int(counts.get("image", 0)) + int(
                cdf["s"].get("image_stat", 0)
            )
            n_dead = int(counts.get("error", 0))
            t0 = _tick("counts", t0)

            def _branch(rt: str, columns: list[str] | None = None):
                b = processed.map_batches(
                    lambda t, rt=rt: t.filter(pc.equal(t["row_type"], rt)),
                    batch_format="pyarrow",
                )
                if columns:
                    b = b.select_columns(columns)
                return b.materialize()

            # --- entity sinks (S7): per-round partition dirs
            for row_type, table_name in (("category", "categories"), ("product", "products")):
                if counts.get(row_type, 0):
                    _branch(row_type, ["url", "host", "kind", "seed_id", "record"]).write_parquet(
                        os.path.join(cfg.out_dir, "tables", table_name, f"round_{rnd:04d}")
                    )

            # --- dead letters (S9)
            if n_dead:
                _branch(
                    "error", ["url", "host", "kind", "seed_id", "status", "attempt"]
                ).write_parquet(os.path.join(cfg.out_dir, "errors", f"round_{rnd:04d}"))

            # --- next frontier: successors are control data (URLs only);
            # already robots-filtered + seen-marked inside the fused stage
            succ_tables = (
                [
                    t
                    for t in ray.get(
                        _branch(
                            "succ",
                            ["url", "host", "kind", "depth", "priority", "seed_id", "caption"],
                        ).to_arrow_refs()
                    )
                    if t.num_rows
                ]
                if counts.get("succ", 0)
                else []
            )
            survivors = (
                pa.concat_tables(succ_tables).cast(schemas.FRONTIER)
                if succ_tables
                else pa.Table.from_pylist([], schema=schemas.FRONTIER)
            )

            if selected is not None:
                # --- metrics: pages by (host, kind) from the selected
                # frontier (driver-side pyarrow; no extra execution)
                mdf = (
                    selected.select(["host", "kind"])
                    .to_pandas()
                    .assign(pages=1)
                    .groupby(["host", "kind"], sort=True)["pages"]
                    .sum()
                    .reset_index()
                )
                mdf["errors"] = 0
                self.metrics[f"round_{rnd:04d}"] = mdf.to_dict(orient="list")
                n_pages = int(selected.num_rows)
            else:
                # big-seed streaming round: admitted-row accounting comes
                # from the in-stage fetch_stat summary rows
                n_pages = int(cdf["s"].get("fetch_stat", 0))
                self.metrics[f"round_{rnd:04d}"] = {"big_seed_pages": n_pages}
            totals["pages"] += n_pages
            totals["images"] += n_imgs
            totals["errors"] += n_dead
            self.metrics["_totals"] = dict(totals)
            self.lineage[f"round_{rnd:04d}"] = {
                "in_frontier": int(frontier.num_rows),
                "selected": n_pages,
                "backlog": int(backlog.num_rows),
                "successors": int(survivors.num_rows),
                "images": int(n_imgs),
                "errors": int(n_dead),
                "prev_round": rnd - 1,
            }

            # advance virtual politeness clocks one round-tick
            for p in self.politeness:
                p.advance_clock.remote(1.0)

            frontier = (
                pa.concat_tables([survivors, backlog]).cast(schemas.FRONTIER)
                if backlog.num_rows
                else survivors
            )
            t0 = _t()
            self.ckpt.save_round(
                rnd, frontier, self.seen.snapshot(), self.metrics, self.lineage
            )
            _tick("checkpoint", t0)
            if stop_after_round is not None and rnd >= stop_after_round:
                rnd += 1
                break
            rnd += 1

        return CrawlResult(
            rounds=rnd,
            pages_fetched=totals["pages"],
            images_written=totals["images"],
            errors=totals["errors"],
            seen_size=self.seen.size(),
            metrics=self.metrics,
            out_dir=cfg.out_dir,
        )

    # ------------------------------------------------------------------
    def images_dataset(self) -> rd.Dataset:
        root = os.path.join(self.cfg.out_dir, "images")
        if not os.path.isdir(root) or not os.listdir(root):
            return rd.from_arrow(pa.Table.from_pylist([], schema=schemas.IMAGES))
        return rd.read_parquet(root)


def read_images_table(out_dir: str) -> pa.Table:
    """All written image rows, sorted by image_id (the comparison order)."""
    import pyarrow.parquet as pq

    root = os.path.join(out_dir, "images")
    tables = []
    if os.path.isdir(root):
        for rdir in sorted(os.listdir(root)):
            d = os.path.join(root, rdir)
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    tables.append(pq.read_table(os.path.join(d, f)))
    if not tables:
        return pa.Table.from_pylist([], schema=schemas.IMAGES)
    t = pa.concat_tables(tables).cast(schemas.IMAGES)
    return t.sort_by("image_id")
