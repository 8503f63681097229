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

    # ------------------------------------------------------------------
    def _seed_frontier(self) -> pa.Table:
        import pyarrow.parquet as pq

        seeds = pq.read_table(os.path.join(self.cfg.fixture_dir, "seeds.parquet"))
        rows = []
        for r in seeds.to_pylist():
            u = normalize_url(r["url"])
            rows.append(
                {
                    "url": u,
                    "host": url_host(u),
                    "kind": "category_tree",
                    "depth": 0,
                    "priority": float(r["priority"]),
                    "seed_id": r["seed_id"],
                    "caption": "",
                }
            )
        rows.sort(key=lambda r: (-r["priority"], r["url"]))
        return pa.Table.from_pylist(rows, schema=schemas.FRONTIER)

    def _filter_new(self, candidates: pa.Table) -> pa.Table:
        """Robots filter then seen anti-join (driver-side for the seed round
        and round boundaries; in-pipeline stages do the same per batch)."""
        if candidates.num_rows == 0:
            return candidates
        robots = RobotsFilterStage(self.robots_txt)
        seen = SeenFilterStage(self.seen)
        return seen(robots(candidates))

    # ------------------------------------------------------------------
    def run(self, resume: bool = False, stop_after_round: int | None = None) -> CrawlResult:
        cfg = self.cfg
        start_round = 0
        if resume:
            latest = self.ckpt.latest_complete_round()
            if latest is not None:
                frontier, snaps, self.metrics, self.lineage = self.ckpt.load_round(latest)
                self.seen.restore(snaps)
                self.ckpt.prune_rounds_after(latest)
                start_round = latest + 1
            else:
                frontier = self._filter_new(self._seed_frontier())
        else:
            frontier = self._filter_new(self._seed_frontier())

        totals = {"pages": 0, "images": 0, "errors": 0}
        for key in ("pages", "images", "errors"):
            totals[key] = int(self.metrics.get("_totals", {}).get(key, 0))

        # broadcast the synthetic pages index once (ray.put → read per actor
        # from the shared object store; never re-shipped per batch)
        import pyarrow.parquet as pq

        pages_ref = ray.put(
            pq.read_table(
                os.path.join(cfg.fixture_dir, "pages.parquet"),
                columns=["url", "payload", "status"],
            )
        )

        rnd = start_round
        while rnd < cfg.max_rounds and frontier.num_rows > 0:
            selected, backlog = split_selected(frontier, cfg.quota_per_host)
            if selected.num_rows == 0:
                break
            ds = rd.from_arrow(selected)

            # ONE actor-pool execution per round: fused fetch → decode/parse →
            # robots → seen anti-join (see stages/process.py for the fusion
            # rationale). Branch extraction below is cheap filters over the
            # materialized union-schema result.
            from crawler_ray.stages.process import CrawlProcessStage

            processed = ds.map_batches(
                CrawlProcessStage,
                fn_constructor_args=(
                    pages_ref,
                    self.politeness,
                    self.seen,
                    self.robots_txt,
                    cfg.max_attempts,
                ),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=(min(2, cfg.fetch_concurrency), cfg.fetch_concurrency),
                num_cpus=1,
            ).materialize()

            def _branch(rt: str, columns: list[str] | None = None):
                b = processed.map_batches(
                    lambda t, rt=rt: t.filter(pc.equal(t["row_type"], rt)),
                    batch_format="pyarrow",
                )
                if columns:
                    b = b.select_columns(columns)
                return b.materialize()

            # --- images sink (IMAGES schema projection)
            imgs = _branch(
                "image",
                ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )
            n_imgs = imgs.count()
            if n_imgs:
                imgs.write_parquet(self.ckpt.images_dir(rnd))

            # --- entity sinks (S7): per-round partition dirs
            for row_type, table_name in (("category", "categories"), ("product", "products")):
                branch = _branch(row_type, ["url", "host", "kind", "seed_id", "record"])
                if branch.count():
                    branch.write_parquet(
                        os.path.join(cfg.out_dir, "tables", table_name, f"round_{rnd:04d}")
                    )

            # --- dead letters (S9)
            dead = _branch("error", ["url", "host", "kind", "seed_id", "status", "attempt"])
            n_dead = dead.count()
            if n_dead:
                dead.write_parquet(os.path.join(cfg.out_dir, "errors", f"round_{rnd:04d}"))

            # --- next frontier: successors are control data (URLs only);
            # already robots-filtered + seen-marked inside the fused stage
            succ_tables = [
                t
                for t in ray.get(
                    _branch(
                        "succ",
                        ["url", "host", "kind", "depth", "priority", "seed_id", "caption"],
                    ).to_arrow_refs()
                )
                if t.num_rows
            ]
            survivors = (
                pa.concat_tables(succ_tables).cast(schemas.FRONTIER)
                if succ_tables
                else pa.Table.from_pylist([], schema=schemas.FRONTIER)
            )

            # --- metrics: pages by (host, kind) from the selected frontier
            # (driver-side pyarrow over control data; no extra execution)
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
            totals["pages"] += selected.num_rows
            totals["images"] += n_imgs
            totals["errors"] += n_dead
            self.metrics["_totals"] = dict(totals)
            self.lineage[f"round_{rnd:04d}"] = {
                "in_frontier": int(frontier.num_rows),
                "selected": int(selected.num_rows),
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
            self.ckpt.save_round(
                rnd, frontier, self.seen.snapshot(), self.metrics, self.lineage
            )
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
