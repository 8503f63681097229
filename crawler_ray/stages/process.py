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


class CrawlProcessStage:
    """``frontier batch -> union-schema round rows``; one instance per actor."""

    def __init__(self, pages_ref, politeness, seen, robots_txt: dict[str, str],
                 max_attempts: int = 3):
        self.fetch = SyntheticFetchStage(pages_ref, politeness, max_attempts)
        self.seen = seen
        self.robots = RobotsCache(lambda host: robots_txt.get(host))

    def __call__(self, batch: pa.Table) -> pa.Table:
        fetched = self.fetch(batch)
        rows_in = fetched.to_pylist()
        out: list[dict] = []
        image_rows: list[dict] = []
        succ_rows: list[dict] = []

        for r in rows_in:
            if r["status"] != 200:
                out.append(
                    _row(r, row_type="error", status=r["status"], attempt=r["attempt"])
                )
                continue
            if r["kind"] == "image":
                data = r["payload"]
                fmt = sniff_fmt(data)
                try:
                    px = decode_image(data, fmt)
                except Exception:
                    out.append(_row(r, row_type="error", status=422))
                    continue
                image_rows.append(
                    _row(
                        r,
                        row_type="image",
                        bytes=data,
                        image_id=md5_hex(data),
                        w=int(px.shape[1]),
                        h=int(px.shape[0]),
                        fmt=fmt,
                        phash=phash64(px),
                    )
                )
                continue
            # page: parse (M1 envelope + per-kind parser)
            try:
                doc = json.loads(r["payload"].decode("utf-8"))
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
                else:
                    out.append(_row(p, row_type=p["row_type"], record=p["record"]))

        # image content dedup (J4): first-seen wins via the sharded seen-set
        if image_rows:
            mask = self.seen.check_and_insert(
                ["img:" + r["image_id"] for r in image_rows]
            )
            out.extend(r for r, dup in zip(image_rows, mask) if not dup)

        # successors: robots filter THEN seen anti-join (blocked URLs stay
        # unmarked — see stages/frontier.py rationale)
        if succ_rows:
            allowed = self.robots.allowed([r["url"] for r in succ_rows])
            succ_rows = [r for r, a in zip(succ_rows, allowed) if a]
        if succ_rows:
            seen_mask = self.seen.check_and_insert([r["url"] for r in succ_rows])
            out.extend(r for r, s in zip(succ_rows, seen_mask) if not s)

        return pa.Table.from_pylist(out, schema=ROUND_SCHEMA)
