"""Frontier stages: robots filter, seen-set anti-join, per-host quota
selection (priority frontier).

- ``RobotsFilterStage`` — drops robots-disallowed candidate URLs *before*
  seen-marking (a blocked URL is never visited, so it must stay unmarked:
  a later policy change could admit it). The reference has no robots
  handling; this is north-rule new design.
- ``SeenFilterStage`` — the frontier anti-join (J6 semantics,
  ``ShiweijiaProduct.cs:183``; general mechanism SURVEY.md §2.4): marks at
  enqueue time via ``check_and_insert`` so a URL enters the frontier once,
  ever.
- ``select_per_host`` — the priority frontier shuffle: stable sort by
  ``(-priority, url)`` inside each host group, take the per-host per-round
  quota (O1 staleness-priority ordering + hot-host skew splitting: a hot
  host's backlog spreads across rounds while preserving its chain order).

All deterministic: ties break on the normalized URL, never on arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from crawler_ray.state.politeness import RobotsCache


class RobotsFilterStage:
    def __init__(self, robots_map: dict[str, str]):
        self.cache = RobotsCache(lambda host: robots_map.get(host))

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        mask = self.cache.allowed(urls)
        return batch.filter(pa.array(mask))


class SeenFilterStage:
    def __init__(self, seen):
        self.seen = seen  # SeenSet client

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        seen_mask = self.seen.check_and_insert(batch["url"].to_pylist())
        return batch.filter(pa.array(~seen_mask))


def select_per_host(group: pd.DataFrame, quota: int) -> pd.DataFrame:
    """Per-host top-``quota`` by (priority desc, url asc); adds ``selected``.
    Designed for ``ds.groupby('host').map_groups(...)`` — rows not selected
    remain in the backlog for the next round (marked ``selected=False``)."""
    g = group.sort_values(
        ["priority", "url"], ascending=[False, True], kind="mergesort"
    )
    sel = np.zeros(len(g), dtype=bool)
    sel[:quota] = True
    g = g.assign(selected=sel)
    return g


def split_selected(table: pa.Table, quota: int) -> tuple[pa.Table, pa.Table]:
    """Driver-side (small frontier) variant: returns (selected, backlog)."""
    df = table.to_pandas()
    if df.empty:
        return table, table.slice(0, 0)
    parts = [select_per_host(g, quota) for _, g in df.groupby("host", sort=True)]
    out = pd.concat(parts, ignore_index=True)
    schema = table.schema
    selected = pa.Table.from_pandas(
        out[out["selected"]].drop(columns=["selected"]), schema=schema,
        preserve_index=False,
    )
    backlog = pa.Table.from_pandas(
        out[~out["selected"]].drop(columns=["selected"]), schema=schema,
        preserve_index=False,
    )
    return selected, backlog
