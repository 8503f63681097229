"""Sitemap discovery → frontier seed rows.

The reference has no robots/sitemap handling at all (its seed lists are
config, ``SpiderConfig.cs``); a real web-scale crawler bootstraps breadth
from ``robots.txt``'s ``Sitemap:`` lines and the sitemap protocol
(sitemaps.org: ``<urlset>`` leaf files, ``<sitemapindex>`` trees, gzip
transport, plain-text fallback). This module adds that seed-expansion
step Ray-Data-shaped:

- parsing is stdlib-only (``xml.etree`` with namespace-agnostic tag
  matching, ``gzip`` sniffing by magic bytes),
- discovery fans out one actor task per HOST batch (hosts are
  independent; each walks its own sitemap tree breadth-first with
  bounded depth/URL budget — no cross-host state),
- output is FRONTIER-schema rows ready to union with configured seeds.

At 10^10-URL scale the host list itself is a Dataset and this stage is
just another ``map_batches``; per-host budgets bound each task's memory
regardless of how large one site's sitemap tree is.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa
import ray.data as rd

from crawler_ray.schemas import FRONTIER


def sitemaps_from_robots(txt: str | None) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body (case-insensitive,
    order-preserving, deduplicated)."""
    out: list[str] = []
    if not txt:
        return out
    for line in txt.splitlines():
        head, _, rest = line.partition(":")
        if head.strip().lower() == "sitemap":
            u = rest.strip()
            if u and u not in out:
                out.append(u)
    return out


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(payload: bytes) -> tuple[list[str], list[str]]:
    """One sitemap document → (page urls, child sitemap urls). Handles
    gzip transport (magic-byte sniff), ``<urlset>`` leaves,
    ``<sitemapindex>`` trees, and the plain-text one-URL-per-line
    fallback. Malformed XML degrades to the text fallback rather than
    raising — a crawler must survive broken sitemaps."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    pages: list[str] = []
    children: list[str] = []
    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        for ln in payload.decode("utf-8", "replace").splitlines():
            u = ln.strip()
            if u.startswith("http"):
                pages.append(u)
        return pages, children
    kind = _local(root.tag)
    for entry in root:
        locs = [c.text.strip() for c in entry if _local(c.tag) == "loc" and c.text]
        if not locs:
            continue
        if kind == "sitemapindex" or _local(entry.tag) == "sitemap":
            children.extend(locs)
        else:
            pages.extend(locs)
    return pages, children


class SitemapDiscoverStage:
    """host rows → FRONTIER seed rows, one bounded breadth-first sitemap
    walk per host. ``fetch_fn`` (url → bytes | None) is injectable for
    offline fixtures; the default is a per-worker ``requests.Session``
    (the HttpFetchStage convention: stateful setup once per actor)."""

    def __init__(
        self,
        scheme: str = "http",
        fetch_fn=None,
        max_depth: int = 3,
        max_urls_per_host: int = 100_000,
        kind: str = "product_detail",
    ):
        self.scheme = scheme
        self.fetch_fn = fetch_fn
        self.max_depth = max_depth
        self.max_urls = max_urls_per_host
        self.kind = kind
        self._session = None

    def _fetch(self, url: str) -> bytes | None:
        if self.fetch_fn is not None:
            return self.fetch_fn(url)
        import requests

        if self._session is None:
            self._session = requests.Session()
        try:
            r = self._session.get(url, timeout=10)
        except requests.RequestException:
            return None
        return r.content if r.status_code == 200 else None

    def _walk_host(self, host: str) -> list[str]:
        robots = self._fetch(f"{self.scheme}://{host}/robots.txt")
        roots = sitemaps_from_robots(
            robots.decode("utf-8", "replace") if robots else None
        ) or [f"{self.scheme}://{host}/sitemap.xml"]
        seen_maps: set[str] = set()
        pages: list[str] = []
        frontier_maps = list(roots)
        for _depth in range(self.max_depth):
            next_maps: list[str] = []
            for sm in frontier_maps:
                if sm in seen_maps or len(pages) >= self.max_urls:
                    continue
                seen_maps.add(sm)
                payload = self._fetch(sm)
                if payload is None:
                    continue
                p, ch = parse_sitemap(payload)
                pages.extend(p[: self.max_urls - len(pages)])
                next_maps.extend(ch)
            if not next_maps:
                break
            frontier_maps = next_maps
        return pages

    def __call__(self, t: pa.Table) -> pa.Table:
        urls: list[str] = []
        hosts: list[str] = []
        for h in t["host"].to_pylist():
            for u in self._walk_host(h):
                urls.append(u)
                hosts.append(h)
        n = len(urls)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "kind": pa.array([self.kind] * n, pa.string()),
                "depth": pa.array(np.zeros(n, np.int32), pa.int32()),
                "priority": pa.array(np.ones(n, np.float64), pa.float64()),
                "seed_id": pa.array(hosts, pa.string()),
                "caption": pa.array([""] * n, pa.string()),
            },
            schema=FRONTIER,
        )


def sitemap_seed_frontier(
    hosts: list[str] | rd.Dataset, concurrency: int | None = None, **stage_kwargs
) -> rd.Dataset:
    """Expand hosts into FRONTIER seed rows via their sitemap trees. Pass
    a list (driver-side host seeds) or an existing Dataset of
    ``host: string`` rows (discovered hosts at scale)."""
    if isinstance(hosts, list):
        ds = rd.from_arrow(pa.table({"host": pa.array(hosts, pa.string())}))
    else:
        ds = hosts
    kwargs = {}
    if concurrency:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        SitemapDiscoverStage(**stage_kwargs), batch_format="pyarrow", **kwargs
    )
