"""Fused per-round crawl stage: fetch → (image decode/hash/dedup | parse →
robots filter → seen anti-join) in a single actor-pool ``map_batches``.

Why fused: between fetch and parse/decode there is no shuffle, so splitting
them into separate ``map_batches`` stages only adds actor-pool startup and an
extra object-store hop per round (Ray Data fuses adjacent map stages for the
same reason). One actor pool per round keeps the round's fixed cost at one
pool spin-up; the component stages (SyntheticFetchStage, ImageStage,
RobotsFilterStage, SeenFilterStage in stages/) remain available unfused for
pipelines that want separate pools (e.g. IO-bound fetch + CPU-bound decode
with different ``num_cpus``).

Output: ONE union-schema Arrow table per batch with a ``row_type``
discriminator:

    succ      — new frontier candidate (robots-allowed, first-seen)
    category  — category entity record (JSON in ``record``)
    product   — product entity record (JSON in ``record``)
    image     — new (first-seen content) image row: IMAGES columns filled
    error     — dead letter (fetch status ≠ 200 or parse failure)

Determinism contract: the seen-SET after a round is independent of actor
scheduling (set membership is insertion-order-free); successor/image *rows*
carry deterministic keys so all downstream tables compare after sort-by-key.
Within-round caption ties for duplicate image content resolve to whichever
copy reached the shard first — byte-identical outputs are guaranteed when
captions are content-consistent (true for the synthetic site; a real site's
alt-texts may differ per link, in which case caption is 'first discovered').
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from crawler_ray.functions.codecs import decode_image, sniff_fmt
from crawler_ray.functions.hashing import md5_hex, phash64
from crawler_ray.stages.fetch import SyntheticFetchStage
from crawler_ray.stages.parse import _PARSERS
from crawler_ray.state.politeness import RobotsCache

ROUND_SCHEMA = pa.schema(
    [
        ("row_type", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("kind", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("seed_id", pa.string()),
        ("caption", pa.string()),
        ("record", pa.string()),
        ("status", pa.int32()),
        ("attempt", pa.int32()),
        ("bytes", pa.binary()),
        ("image_id", pa.string()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("phash", pa.int64()),
        ("etag", pa.string()),
        ("last_modified", pa.string()),
    ]
)

_EMPTY = {
    "record": "",
    "status": 200,
    "attempt": 1,
    "bytes": None,
    "image_id": None,
    "w": None,
    "h": None,
    "fmt": None,
    "phash": None,
    "etag": "",
    "last_modified": "",
}


def _row(base: dict, **over) -> dict:
    r = {
        "row_type": "",
        "url": base["url"],
        "host": base["host"],
        "kind": base["kind"],
        "depth": base["depth"],
        "priority": base["priority"],
        "seed_id": base["seed_id"],
        "caption": base.get("caption", ""),
        **_EMPTY,
    }
    r.update(over)
    return r


# per-worker-process stage cache for task-mode execution (see
# make_process_fn): Ray pre-starts and reuses worker processes, so the stage
# builds once per worker instead of once per actor-pool spin-up per round.
_PROC_CACHE: dict[str, "CrawlProcessStage"] = {}


def make_process_fn(init_args_ref, images_dir=None, sink_dirs=None,
                    filter_input=False):
    """Task-mode wrapper around CrawlProcessStage.

    Ray Data actor pools are created per execution — a BFS crawl pays the
    whole pool spin-up every round, which dominates small rounds and skews
    scaling measurements. Plain tasks run on Ray's PRE-STARTED worker
    processes; the stage state (seen/politeness actor HANDLES, robots rules,
    pages index ref — all small or shared) is built lazily once per worker
    and cached. The truly stateful components stay actors; only the fetch
    session wrapper becomes elastic. Per-ROUND settings (sink dirs, input
    admission) are plain attrs set on the cached stage per call, so the
    cache key — and the stage build — is stable across rounds.
    """

    def process_fn(batch: pa.Table) -> pa.Table:
        return _cached_stage(init_args_ref, images_dir, sink_dirs,
                             filter_input)(batch)

    return process_fn


def _cached_stage(init_args_ref, images_dir=None, sink_dirs=None,
                  filter_input=False) -> "CrawlProcessStage":
    import ray

    key = init_args_ref.hex() if hasattr(init_args_ref, "hex") else str(init_args_ref)
    stage = _PROC_CACHE.get(key)
    if stage is None:
        stage = CrawlProcessStage(*ray.get(init_args_ref))
        _PROC_CACHE.clear()  # at most one live config per worker
        _PROC_CACHE[key] = stage
    stage.images_dir = images_dir
    stage.sink_dirs = sink_dirs or {}
    stage.filter_input = filter_input
    return stage


_FRONTIER_COLS = ["url", "host", "kind", "depth", "priority", "seed_id", "caption"]


def _passthrough_rows(df, row_type: str, status=None) -> pa.Table:
    """Frontier rows → ROUND_SCHEMA rows (vectorized; used for backlog
    passthrough and per-(host,kind) selection accounting)."""
    n = len(df)
    st = (np.asarray(status, dtype=np.int32) if status is not None
          else np.full(n, 200, dtype=np.int32))
    return pa.table(
        {
            "row_type": pa.array([row_type] * n, pa.string()),
            "url": pa.array(df["url"], pa.string()),
            "host": pa.array(df["host"], pa.string()),
            "kind": pa.array(df["kind"], pa.string()),
            "depth": pa.array(np.asarray(df["depth"], dtype=np.int32), pa.int32()),
            "priority": pa.array(np.asarray(df["priority"], dtype=np.float64),
                                 pa.float64()),
            "seed_id": pa.array(df["seed_id"], pa.string()),
            "caption": pa.array(df["caption"], pa.string()),
            "record": pa.array([""] * n, pa.string()),
            "status": pa.array(st, pa.int32()),
            "attempt": pa.array(np.ones(n, dtype=np.int32), pa.int32()),
            "bytes": pa.nulls(n, pa.binary()),
            "image_id": pa.nulls(n, pa.string()),
            "w": pa.nulls(n, pa.int32()),
            "h": pa.nulls(n, pa.int32()),
            "fmt": pa.nulls(n, pa.string()),
            "phash": pa.nulls(n, pa.int64()),
            "etag": pa.array([""] * n, pa.string()),
            "last_modified": pa.array([""] * n, pa.string()),
        }
    ).cast(ROUND_SCHEMA)


def make_round_fn(init_args_ref, quota: int, batch_size: int,
                  filter_input: bool = False, images_dir=None,
                  sink_dirs=None, fail_once_marker: str | None = None,
                  kill_actor_once_marker: str | None = None):
    """Fused SELECT + PROCESS for one host-hash partition of the frontier
    (``groupby('part').map_groups``): per-host top-``quota`` selection
    (priority desc, url asc — deterministic, arrival-order-free) runs
    vectorized where the partition's rows already are; unselected rows pass
    through as ``row_type='backlog'`` ROUND_SCHEMA rows and selected rows
    are processed in ``batch_size`` chunks by the cached CrawlProcessStage.
    The frontier therefore never exists on the driver: selection, backlog
    carry-over and fetching all happen inside one distributed execution
    (VERDICT round-1 item #5). Per-(host,kind) ``sel_stat`` summary rows
    replace the driver-side metrics pass."""

    def round_fn(group: pa.Table) -> pa.Table:
        if fail_once_marker is not None:
            # fault-injection hook (tests only): the FIRST task to claim the
            # marker file dies mid-round — possibly after partial sink
            # writes and seen-set mutations — exercising the driver's
            # round-level rollback-and-retry path under a real distributed
            # failure. O_EXCL makes exactly one task across the cluster fail.
            import os as _os

            try:
                _os.close(_os.open(
                    fail_once_marker, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY
                ))
                raise RuntimeError("injected round failure (fail_once_marker)")
            except FileExistsError:
                pass
        stage = _cached_stage(init_args_ref, images_dir, sink_dirs)
        if kill_actor_once_marker is not None:
            # fault-injection hook (tests only): the FIRST task to claim the
            # marker KILLS a seen-shard STATE ACTOR mid-round (no_restart —
            # simulating node loss), then proceeds; its own seen-set RPCs
            # fail with RayActorError, the round dies, and the driver must
            # respawn the shard (SeenSet.heal) + restore from checkpoint.
            import os as _os

            import ray as _ray

            try:
                _os.close(_os.open(
                    kill_actor_once_marker,
                    _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY,
                ))
                _ray.kill(stage.seen.shards[0], no_restart=True)
            except FileExistsError:
                pass
        outs: list[pa.Table] = []
        acct: list[dict] = []
        if filter_input:
            # seed admission (robots + seen anti-join) BEFORE selection, as
            # the driver-side seed round did: blocked/seen rows never take
            # quota slots and never reach the backlog
            group = stage._filter_input_batch(group.select(_FRONTIER_COLS), acct)
        df = group.select(_FRONTIER_COLS).to_pandas()
        df = df.sort_values(["host", "priority", "url"],
                            ascending=[True, False, True], kind="mergesort")
        sel = (df.groupby("host", sort=False).cumcount() < quota).to_numpy()
        backlog = df[~sel]
        if len(backlog):
            frontier_root = stage.sink_dirs.get("frontier")
            if frontier_root is not None:
                # write backlog rows straight to the next-round frontier dir
                # (same parquet layout as the in-stage successor sink)
                stage._sink_write(
                    pa.Table.from_pandas(backlog, preserve_index=False)
                    .select(_FRONTIER_COLS),
                    frontier_root,
                    "backlog",
                )
                acct.append(
                    _row({"url": "", "host": "", "kind": "backlog",
                          "depth": 0, "priority": 0.0, "seed_id": ""},
                         row_type="backlog_stat", status=len(backlog))
                )
            else:
                outs.append(_passthrough_rows(backlog, "backlog"))
        sdf = df[sel]
        if len(sdf):
            # per-(host,kind) selection accounting for driver metrics
            cnt = (sdf.groupby(["host", "kind"], sort=True)
                   .size().reset_index(name="n"))
            cnt = cnt.assign(url="", depth=0, priority=0.0, seed_id="",
                             caption="")
            outs.append(_passthrough_rows(cnt, "sel_stat", status=cnt["n"]))
            sel_t = pa.Table.from_pandas(sdf, preserve_index=False)
            for c0 in range(0, len(sdf), batch_size):
                outs.append(stage(sel_t.slice(c0, batch_size)))
        if acct:
            outs.append(pa.Table.from_pylist(acct, schema=ROUND_SCHEMA))
        if not outs:
            return pa.Table.from_pylist([], schema=ROUND_SCHEMA)
        return pa.concat_tables(outs)

    return round_fn


class CrawlProcessStage:
    """``frontier batch -> union-schema round rows``; one instance per actor."""

    def __init__(self, pages_ref, politeness, seen, robots_txt: dict[str, str],
                 max_attempts: int = 3, synth_images: dict | None = None,
                 images_dir: str | None = None, filter_input: bool = False,
                 sink_dirs: dict | None = None, fetcher: str = "synthetic",
                 http_opts: dict | None = None, table_fmt: str = "parquet"):
        if fetcher == "http":
            from crawler_ray.stages.fetch import HttpFetchStage

            self.fetch = HttpFetchStage(
                politeness, max_attempts, **(http_opts or {})
            )
        else:
            self.fetch = SyntheticFetchStage(
                pages_ref, politeness, max_attempts, synth_images=synth_images
            )
        self.seen = seen
        self.robots = RobotsCache(lambda host: robots_txt.get(host))
        self.has_robots_rules = bool(robots_txt)
        # direct image sink: when set, new-image rows are written to
        # parquet HERE (one deterministically-named part file per batch)
        # instead of being carried through the object store for a second
        # write pass — images are the bulk payload at scale, and this keeps
        # them out of the round's materialized control output entirely.
        self.images_dir = images_dir
        # breadth-seed mode: the round-0 frontier streams straight from the
        # seed file, so robots + seen dedup of the INPUT happens here instead
        # of on the driver (the driver never materializes the seed list)
        self.filter_input = filter_input
        # in-stage sinks (same rationale as the image sink above, applied to
        # EVERY output class): {"categories":…, "products":…, "errors":…,
        # "frontier":…} per-round dirs. When set, entity/error/successor
        # rows are written to parquet HERE (deterministically named parts —
        # content-derived digests, so re-running the same batch overwrites
        # its own part; NOTE the seen-set mutation is NOT idempotent, which
        # is why crawl.py disables Ray task retries and retries whole ROUNDS
        # from the checkpoint instead) and the stage emits one
        # ``<type>_stat`` summary row per batch. The whole round then needs
        # exactly ONE streaming execution whose output is a handful of stat
        # rows.
        self.sink_dirs = sink_dirs or {}
        # part-file format, resolved ONCE on the driver (sources/io.py
        # resolve_table_format) and shipped with the init args: workers may
        # not consult the environment — driver env changes never reach
        # already-started Ray workers, locally or on a real cluster
        self.table_fmt = table_fmt

    def _robots_filter(self, batch: pa.Table) -> tuple[pa.Table, list[str]]:
        """Drop robots-disallowed rows; returns (batch, surviving urls) —
        the local (no-RPC) half of admission, shared by the blocking and
        the async-overlap paths."""
        urls = batch["url"].to_pylist()
        if self.has_robots_rules:
            allowed = self.robots.allowed(urls)
            if not allowed.all():
                batch = batch.filter(pa.array(allowed))
                urls = [u for u, a in zip(urls, allowed) if a]
        return batch, urls

    def _filter_input_batch(self, batch: pa.Table, out: list[dict]) -> pa.Table:
        batch, urls = self._robots_filter(batch)
        if not urls:
            return batch
        seen_mask = self.seen.check_and_insert(urls)
        if seen_mask.any():
            batch = batch.filter(pa.array(~seen_mask))
        # one accounting row per batch: rows actually admitted for fetching
        out.append(
            _row(
                {"url": "", "host": "", "kind": "fetch",
                 "depth": 0, "priority": 0.0, "seed_id": ""},
                row_type="fetch_stat",
                status=int((~seen_mask).sum()),
            )
        )
        return batch

    def _process_images(self, fetched: pa.Table, out: list[dict]) -> None:
        """Vectorized image path: columnar in/out, per-row work is only the
        codec/hash kernels — no per-row dict building (measured ~0.5 ms/row
        of pure-python overhead at breadth scale)."""
        mask = pa.compute.and_(
            pa.compute.equal(fetched["kind"], "image"),
            pa.compute.equal(fetched["status"], 200),
        )
        imgs = fetched.filter(mask)
        if imgs.num_rows == 0:
            return
        payloads = imgs["payload"].to_pylist()
        captions = imgs["caption"].to_pylist()
        # md5 first (cheap) → issue the seen-set RPC asynchronously → the
        # decode/phash loop below OVERLAPS the shard round-trip, hiding the
        # membership latency entirely behind per-batch compute
        all_ids = [md5_hex(d) for d in payloads]
        pending = (
            self.seen.check_and_insert_async(["img:" + i for i in all_ids])
            if hasattr(self.seen, "check_and_insert_async")
            else None
        )
        ids, ws, hs, fmts, hashes, keep = [], [], [], [], [], []
        bad: list[int] = []
        for i, data in enumerate(payloads):
            fmt = sniff_fmt(data)
            try:
                px = decode_image(data, fmt)
            except Exception:
                # corrupt/truncated 200-status payload: dead-letter it like
                # every other failure class (status 422, unprocessable) —
                # silently skipping would leave selected != images + errors
                # in the lineage accounting and hide the failure entirely
                bad.append(i)
                continue
            keep.append(i)
            ids.append(all_ids[i])
            ws.append(px.shape[1])
            hs.append(px.shape[0])
            fmts.append(fmt)
            hashes.append(phash64(px))
        if bad:
            rows = imgs.select(
                ["url", "host", "kind", "depth", "priority", "seed_id"]
            ).take(pa.array(bad, pa.int64())).to_pylist()
            for r in rows:
                out.append(_row(r, row_type="error", status=422, attempt=0))
        if not ids:
            if pending is not None:
                type(self.seen).gather(pending)
            return
        if pending is not None:
            dup_all = type(self.seen).gather(pending)
            dup = dup_all[np.asarray(keep, dtype=np.int64)]
        else:
            dup = self.seen.check_and_insert(["img:" + i for i in ids])
        new_idx = [j for j, d in enumerate(dup) if not d]
        if not new_idx:
            return
        table = pa.table(
            {
                "image_id": pa.array([ids[j] for j in new_idx], pa.string()),
                "bytes": pa.array([payloads[keep[j]] for j in new_idx], pa.binary()),
                "w": pa.array([ws[j] for j in new_idx], pa.int32()),
                "h": pa.array([hs[j] for j in new_idx], pa.int32()),
                "fmt": pa.array([fmts[j] for j in new_idx], pa.string()),
                "caption": pa.array([captions[keep[j]] for j in new_idx], pa.string()),
                "phash": pa.array([hashes[j] for j in new_idx], pa.int64()),
            }
        )
        if self.images_dir:
            import hashlib as _hl

            from crawler_ray.sources.io import write_part

            digest = _hl.md5("".join(ids[j] for j in new_idx).encode()).hexdigest()[:16]
            # Lance fragment when available (north-rule image+caption
            # table), deterministic parquet part otherwise (sources/io.py)
            write_part(table, self.images_dir, digest, fmt=self.table_fmt)
            # one summary row per batch instead of 10^3 marker rows
            out.append(
                _row(
                    {"url": "", "host": "", "kind": "image",
                     "depth": 0, "priority": 0.0, "seed_id": ""},
                    row_type="image_stat",
                    status=len(new_idx),
                )
            )
        else:
            urls = imgs["url"].to_pylist()
            for j in new_idx:
                out.append(
                    _row(
                        {"url": urls[keep[j]], "host": "", "kind": "image",
                         "depth": 0, "priority": 0.0, "seed_id": "",
                         "caption": captions[keep[j]]},
                        row_type="image",
                        image_id=ids[j],
                        w=int(ws[j]),
                        h=int(hs[j]),
                        fmt=fmts[j],
                        phash=int(hashes[j]),
                    )
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os as _os
        import time as _tm
        _prof = _os.environ.get("CRAWLER_RAY_STAGE_TIMING")
        _T = {}
        def _mark(k, t0):
            if _prof:
                _T[k] = _T.get(k, 0.0) + (_tm.monotonic() - t0)
            return _tm.monotonic()
        _t0 = _tm.monotonic()
        out: list[dict] = []
        succ_rows: list[dict] = []
        brand_rows: list[dict] = []
        pending_admission = None
        if self.filter_input:
            # admission OVERLAP: robots-filter locally (cheap), issue the
            # seen-set anti-join RPC asynchronously and let the fetch below
            # hide its round-trip — the blocking variant measured as a large
            # idle gap at high worker counts. Fetched rows for already-seen
            # inputs are dropped after the gather (duplicate seeds are rare
            # by construction, so the wasted fetch work is ~zero).
            if hasattr(self.seen, "check_and_insert_async"):
                batch, urls = self._robots_filter(batch)
                if not urls:
                    return pa.Table.from_pylist(out, schema=ROUND_SCHEMA)
                pending_admission = self.seen.check_and_insert_async(urls)
            else:
                batch = self._filter_input_batch(batch, out)
                if batch.num_rows == 0:
                    return pa.Table.from_pylist(out, schema=ROUND_SCHEMA)
        _t0 = _mark("admission", _t0)
        fetched = self.fetch(batch)
        if pending_admission is not None:
            seen_mask = type(self.seen).gather(pending_admission)
            if seen_mask.any():
                fetched = fetched.filter(pa.array(~seen_mask))
            out.append(
                _row({"url": "", "host": "", "kind": "fetch",
                      "depth": 0, "priority": 0.0, "seed_id": ""},
                     row_type="fetch_stat", status=int((~seen_mask).sum()))
            )
        _t0 = _mark("fetch", _t0)

        # redirect chains become FRONTIER DATA (HttpResponse.cs:39-66
        # semantics, Ray-Data-shaped): a 3xx row contributes a successor at
        # the resolved absolute target — it then flows through the normal
        # robots filter + seen anti-join + per-host quota like any link
        if "redirect_url" in fetched.column_names:
            is_redir = pa.compute.and_(
                pa.compute.greater_equal(fetched["status"], 300),
                pa.compute.less(fetched["status"], 400),
            )
            redirs = fetched.filter(is_redir)
            if redirs.num_rows:
                from crawler_ray.functions.urls import normalize_url, url_host

                for r in redirs.to_pylist():
                    target = r["redirect_url"]
                    if not target:
                        out.append(_row(r, row_type="error", status=r["status"],
                                        attempt=r["attempt"]))
                        continue
                    target = normalize_url(target)
                    succ_rows.append(_row(
                        {"url": target, "host": url_host(target),
                         "kind": r["kind"], "depth": r["depth"] + 1,
                         "priority": r["priority"], "seed_id": r["seed_id"],
                         "caption": r.get("caption", "")},
                        row_type="succ",
                    ))
            fetched = fetched.filter(pa.compute.invert(is_redir)).drop_columns(
                ["redirect_url"]
            )

        # vectorized image path (typically the bulk of a breadth round)
        self._process_images(fetched, out)
        _t0 = _mark("images", _t0)

        # page + error rows: row-at-a-time is fine (control-plane volumes)
        rest = fetched.filter(
            pa.compute.or_(
                pa.compute.invert(pa.compute.equal(fetched["kind"], "image")),
                pa.compute.invert(pa.compute.equal(fetched["status"], 200)),
            )
        )
        for r in rest.to_pylist():
            if r["status"] != 200:
                out.append(
                    _row(r, row_type="error", status=r["status"], attempt=r["attempt"])
                )
                continue
            if r["kind"] == "image":
                continue  # handled above (only non-200 images reach here)
            # page fetch metadata: the (url, etag, last_modified) row the
            # refresh loop's conditional-GET sweep revalidates against
            # (validators are captured by HttpFetchStage; the synthetic
            # fetcher has none and the columns default to "")
            out.append(_row(
                r, row_type="page", status=200,
                etag=r.get("etag", "") or "",
                last_modified=r.get("last_modified", "") or "",
            ))
            # page: parse (M1 envelope + per-kind parser)
            try:
                # charset/BOM-sniffed decode (FileHelper.cs:273-314 parity)
                from crawler_ray.functions.codecs import decode_text

                doc = json.loads(decode_text(r["payload"]))
                ok = bool(doc.get("IsSuccess"))
            except (ValueError, UnicodeDecodeError):
                doc, ok = None, False
            if not ok:
                out.append(_row(r, row_type="error", status=422))
                continue
            parser = _PARSERS.get(r["kind"])
            if not parser:
                continue
            for p in parser(doc, r):
                if p["row_type"] == "succ":
                    succ_rows.append(_row(p, row_type="succ"))
                elif p["row_type"] == "error":
                    out.append(_row(p, row_type="error", status=422))
                elif p["row_type"] == "brand":
                    brand_rows.append(_row(p, row_type="brand", record=p["record"]))
                else:
                    out.append(_row(p, row_type=p["row_type"], record=p["record"]))

        # successors: robots filter THEN seen anti-join (blocked URLs stay
        # unmarked — see stages/frontier.py rationale)
        if succ_rows:
            allowed = self.robots.allowed([r["url"] for r in succ_rows])
            succ_rows = [r for r, a in zip(succ_rows, allowed) if a]
        if succ_rows:
            seen_mask = self.seen.check_and_insert([r["url"] for r in succ_rows])
            out.extend(r for r, s in zip(succ_rows, seen_mask) if not s)

        # brand first-wins upsert (J1, ShiweijiaProduct.cs:228-240): the
        # seen set IS the lookup-or-insert — one brand row ever, globally,
        # and row content is discovery-independent so the winner is
        # byte-irrelevant
        if brand_rows:
            dupb = self.seen.check_and_insert(
                ["brand:" + r["host"] + ":" + r["caption"] for r in brand_rows]
            )
            out.extend(r for r, dup in zip(brand_rows, dupb) if not dup)

        result = pa.Table.from_pylist(out, schema=ROUND_SCHEMA)
        if self.sink_dirs:
            result = self._drain_sinks(result)
        _mark("rest", _t0)
        if _prof:
            import sys as _sys
            print("STAGE_T " + " ".join(f"{k}={v:.4f}" for k, v in _T.items()),
                  file=_sys.stderr, flush=True)
        return result

    _SINK_SPECS = (
        ("category", "categories", ["url", "host", "kind", "seed_id", "record"]),
        ("product", "products", ["url", "host", "kind", "seed_id", "record"]),
        ("brand", "brands", ["host", "kind", "record"]),
        ("error", "errors", ["url", "host", "kind", "seed_id", "status", "attempt"]),
        ("page", "pages",
         ["url", "host", "kind", "seed_id", "status", "etag", "last_modified"]),
        ("succ", "frontier",
         ["url", "host", "kind", "depth", "priority", "seed_id", "caption"]),
    )

    def _sink_write(self, table: pa.Table, root: str, tag: str) -> None:
        import hashlib as _hl

        from crawler_ray.sources.io import write_part

        key_col = "url" if "url" in table.column_names else "record"
        digest = _hl.md5(
            ("\x00".join(table[key_col].to_pylist()) + tag).encode()
        ).hexdigest()[:16]
        write_part(table, root, digest, fmt=self.table_fmt)

    def _drain_sinks(self, result: pa.Table) -> pa.Table:
        """Write entity/error/successor rows to their per-round sinks and
        replace them with one ``<type>_stat`` summary row each (status =
        rows written)."""
        stats: list[dict] = []
        drained = []
        for row_type, sink, columns in self._SINK_SPECS:
            root = self.sink_dirs.get(sink)
            if root is None:
                continue
            rows = result.filter(pa.compute.equal(result["row_type"], row_type))
            if rows.num_rows:
                self._sink_write(rows.select(columns), root, row_type)
                if row_type == "error":
                    # per-(host, kind) stat rows, like sel_stat, so the
                    # round's host_metrics can report real per-host error
                    # counts (a single aggregate row would force errors=0
                    # in the per-host table)
                    grouped = (
                        rows.select(["host", "kind"])
                        .group_by(["host", "kind"])
                        .aggregate([([], "count_all")])
                    )
                    for g in grouped.to_pylist():
                        stats.append(
                            _row({"url": "", "host": g["host"],
                                  "kind": g["kind"], "depth": 0,
                                  "priority": 0.0, "seed_id": ""},
                                 row_type="error_stat",
                                 status=g["count_all"])
                        )
                else:
                    stats.append(
                        _row({"url": "", "host": "", "kind": row_type,
                              "depth": 0, "priority": 0.0, "seed_id": ""},
                             row_type=f"{row_type}_stat", status=rows.num_rows)
                    )
            drained.append(row_type)
        if drained:
            keep = pa.compute.invert(
                pa.compute.is_in(result["row_type"], value_set=pa.array(drained))
            )
            result = result.filter(keep)
        if stats:
            result = pa.concat_tables(
                [result, pa.Table.from_pylist(stats, schema=ROUND_SCHEMA)]
            )
        return result
