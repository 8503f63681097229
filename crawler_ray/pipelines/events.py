"""Stream-shaped pipelines over the ``events`` table.

Ray Data is a batch engine; the reference is batch too (SURVEY.md §2.9), so
windows are expressed over the event log as an ordered, partitioned table:
tumbling windows = groupby a bucketed time key; session windows = per-user
``map_groups`` over ts-sorted groups (the ordering assumption — events of one
user fit one group — is the documented partitioning contract).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

def _read_events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def hourly_event_counts(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event type. The hour key is computed
    vectorized per batch; the groupby shuffles one row per (hour, type,
    batch) after the in-batch pre-aggregation."""
    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        hour = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        # exact integer-cents partial sums (joins.py li_partial pattern): the
        # value column has 2 decimals, so round(value*100) is an exact int64
        # and the distributed sum is associative — no summation-order flips
        # vs the oracle regardless of block split
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        out = (
            df.assign(hour=hour, cents=cents)
            .groupby(["hour", "event_type"], sort=True)
            .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
            .reset_index()
        )
        # single composite shuffle key (single-key groupby is much cheaper
        # than multi-key in this Ray version); split back after the aggregate
        out["win_key"] = out["hour"] + "|" + out["event_type"]
        # Arrow out: feeds the window-key groupby shuffle
        return pa.Table.from_pandas(
            out[["win_key", "n_events", "sum_cents"]], preserve_index=False
        )

    partial = ds.map_batches(bucket, batch_format="pandas")
    agg = partial.groupby("win_key").aggregate(
        Sum("n_events", alias_name="n_events_f"),
        Sum("sum_cents", alias_name="sum_cents_f"),
    )

    def split(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["win_key"].str.split("|", expand=True, regex=False)
        return pd.DataFrame(
            {
                "hour": parts[0],
                "event_type": parts[1],
                "n_events": df["n_events_f"].astype("int64"),
                # cents/100.0 is the nearest double to the 2-decimal value —
                # identical to DuckDB's ROUND canonical representation
                "sum_value": df["sum_cents_f"].astype("int64") / 100.0,
            }
        )

    return agg.map_batches(split, batch_format="pandas")


HOURLY_EVENTS_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       COUNT(*)             AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def sessionize(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows: per-user, a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Partitioning contract: one user's
    events co-locate in one group (hash-partition by user_id)."""
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "value"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        brk = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            brk[1:] = (np.diff(ts) > gap).astype(np.int64)
        sid = np.cumsum(brk)
        # integer-cents sums: exact, order-independent, and cents/100.0 is the
        # nearest double to the 2-decimal value = DuckDB ROUND's canonical
        # double (float sums + round_np do NOT snap 83.17999... to 83.18)
        cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
        out = (
            g.assign(session_id=sid, cents=cents)
            .groupby("session_id", sort=True)
            .agg(
                user_id=("user_id", "first"),
                n_events=("event_id", "size"),
                sum_cents=("cents", "sum"),
                session_start=("ts", "min"),
            )
            .reset_index()
        )
        out["sum_value"] = out["sum_cents"] / 100.0
        out["session_start_epoch"] = (
            out["session_start"].astype("datetime64[ns]").astype("int64") // 10**9
        )
        return out[["user_id", "session_id", "n_events", "sum_value", "session_start_epoch"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


SESSIONIZE_SQL = """
WITH marked AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                     OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
)
SELECT user_id, session_id::BIGINT AS session_id, COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value,
       (epoch_us(MIN(ts)) // 1000000)::BIGINT AS session_start_epoch
FROM sessions
GROUP BY user_id, session_id
"""


def props_key_sum(sf_dir: str) -> rd.Dataset:
    """JSON property extraction (the reference's tolerant ``TryGetProperty``
    parsing, ``ShiweijiaProduct.cs:249-263``) + grouped sum."""
    ds = _read_events(sf_dir, ["event_type", "props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized extraction of the flat {"k": N} payload (tolerant like
        # the reference's TryGetProperty: missing key / null props -> 0);
        # fall back to per-row json.loads only for rows the regex misses
        ks = pd.to_numeric(
            df["props"].str.extract(r'"k"\s*:\s*(-?\d+)(?![.\d])', expand=False),
            errors="coerce",
        )
        # the regex is only sound for flat objects: nested JSON could match an
        # inner "k" first — route any multi-object string to the JSON parser
        nested = df["props"].str.count(r"\{") > 1
        miss = (ks.isna() | nested) & df["props"].notna() & (df["props"] != "")
        if miss.any():
            ks[miss] = df.loc[miss, "props"].map(
                lambda s: json.loads(s).get("k", 0)
            )
        out = (
            df.assign(k=ks.fillna(0).astype("int64"))
            .groupby("event_type", sort=True)["k"]
            .sum()
            .reset_index(name="k_sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = ds.map_batches(extract, batch_format="pandas")
    return (
        partial.groupby("event_type")
        .aggregate(Sum("k_sum", alias_name="k_sum"))
        .map_batches(
            lambda df: df.assign(k_sum=df["k_sum"].astype("int64")),
            batch_format="pandas",
        )
    )


PROPS_KEY_SUM_SQL = """
SELECT event_type,
       SUM(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS k_sum
FROM events
GROUP BY event_type
"""


def top_users_by_value(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Grouped sum → global top-k (pre-aggregate per batch, tiny sort)."""
    ds = _read_events(sf_dir, ["user_id", "value"])

    def partial(df: pd.DataFrame) -> pa.Table:
        # integer-cents partial sums: exact + order-independent (see sessions)
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        out = (
            df.assign(cents=cents)
            .groupby("user_id", sort=False)["cents"]
            .agg(["sum", "size"])
            .reset_index()
        )
        out.columns = ["user_id", "sum_p", "n_p"]
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Sum("sum_p", alias_name="total_value_f"),
                   Sum("n_p", alias_name="n_events_f"))
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "user_id": df["user_id"].astype("int64"),
                    "total_value": df["total_value_f"].astype("int64") / 100.0,
                    "n_events": df["n_events_f"].astype("int64"),
                }
            ),
            batch_format="pandas",
        )
    )
    return agg.sort(["total_value", "user_id"], descending=[True, False]).limit(k)


TOP_USERS_SQL = """
SELECT user_id, ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY SUM(value) DESC, user_id
LIMIT 10
"""


def distinct_users_hll(sf_dir: str, p: int = 12) -> rd.Dataset:
    """Approximate distinct users per event type via mergeable HLL sketches:
    one serialized sketch per (event_type, batch) inside map_batches, merged
    in a tiny final stage — the shuffle moves sketches, never user ids
    (the distinct-count pattern that survives 100 TB). Rows-only driver
    check (approximate); accuracy asserted vs exact in tests."""
    from crawler_ray.functions.sketches import HyperLogLog

    ds = _read_events(sf_dir, ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=True):
            h = HyperLogLog(p)
            h.add(g["user_id"].astype(str).tolist())
            rows.append({"event_type": et, "sketch": h.serialize()})
        return pd.DataFrame(rows)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        acc = HyperLogLog.deserialize(g["sketch"].iloc[0])
        for s in g["sketch"].iloc[1:]:
            acc.merge(HyperLogLog.deserialize(s))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "approx_distinct_users": [int(round(acc.estimate()))],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(combine, batch_format="pandas")
    )
