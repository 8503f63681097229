"""Large-side joins: explicit partitioned hash join.

The reference only ever joins against small in-memory bags (J1/J2 broadcast
pattern, see relational.py). For two LARGE sides Ray Data's portable pattern
(ray_guide) is an explicit bucketed hash join: add ``bucket = hash(key) % B``
to both sides, tag the side, union, ``groupby(bucket)`` and merge each bucket
pairwise inside ``map_groups``. B controls shuffle granularity; skewed keys
can be salted into sub-buckets (documented knob, not needed for the uniform
TPC-H keys here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from crawler_ray.functions.rounding import round_np
from crawler_ray.pipelines.result import schema_safe


def _tag_and_bucket(ds: rd.Dataset, key: str, side: str, n_buckets: int) -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        keys = t[key].to_numpy()
        bucket = (keys % n_buckets).astype(np.int64)
        return t.append_column("_bucket", pa.array(bucket, pa.int64())).append_column(
            "_side", pa.array([side] * t.num_rows, pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def partitioned_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    n_buckets: int = 32,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Hash-partitioned join of two Datasets on an integer key column.
    Column sets of the two sides must be disjoint apart from ``on``.
    Union requires aligned schemas, so each side is padded with typed null
    columns for the other side's fields before the bucket shuffle. Output
    blocks are Arrow tables with a FIXED schema (left fields then right
    fields minus the key) so empty buckets can't drift dtypes.

    Pass ``left_schema`` / ``right_schema`` when a side's block schema is
    pandas-typed with object columns (bytes vs str is not inferrable)."""
    def _fields(ds: rd.Dataset, given) -> list[tuple[str, pa.DataType]] | None:
        if given is not None:
            return [(f.name, f.type) for f in given]
        # works for Arrow AND (numeric) pandas block schemas
        sch = ds.schema()
        if sch is None:  # zero-block side (empty corpus): no type info
            return None
        out = []
        for name, typ in zip(sch.names, sch.types):
            if not isinstance(typ, pa.DataType):
                typ = pa.from_numpy_dtype(np.dtype(typ))
            out.append((name, typ))
        return out

    lf, rf = _fields(left, left_schema), _fields(right, right_schema)
    if lf is None or rf is None:
        # A schema-less side has zero rows, so the join degenerates: empty
        # for inner (either side) and for left-with-empty-LEFT. The typed
        # result uses every KNOWN field; a left join against an untyped
        # empty right cannot be typed — demand the explicit schema.
        if how == "left" and lf is not None and rf is None:
            raise ValueError(
                "left join against an empty (schema-less) right side needs "
                "right_schema to type the output"
            )
        fields = (lf or []) + [(n, t) for n, t in (rf or []) if n != on]
        return rd.from_arrow(
            pa.schema(fields).empty_table() if fields else pa.table({})
        )
    lcols = [n for n, _ in lf]
    rcols = [n for n, _ in rf]
    l_extra = [(n, t) for n, t in rf if n not in lcols]
    r_extra = [(n, t) for n, t in lf if n not in rcols]

    def pad(extra):
        def fn(t: pa.Table) -> pa.Table:
            for name, typ in extra:
                t = t.append_column(name, pa.nulls(t.num_rows, typ))
            # stable column order for union
            return t.select(sorted(t.column_names))

        return fn

    tagged = (
        _tag_and_bucket(left, on, "L", n_buckets)
        .map_batches(pad(l_extra), batch_format="pyarrow")
        .union(
            _tag_and_bucket(right, on, "R", n_buckets).map_batches(
                pad(r_extra), batch_format="pyarrow"
            )
        )
    )

    out_schema = pa.schema(lf + [(n, t) for n, t in rf if n != on])

    def merge(g: pa.Table) -> pa.Table:
        # split sides in ARROW before any pandas conversion: the padded
        # null columns live only on the OTHER side's rows, so each split
        # frame is null-free — pandas cannot degrade int64 keys to float64
        # (which silently rounds keys wider than 53 bits and breaks the
        # equi-join)
        side = g["_side"]
        lg = g.filter(pa.compute.equal(side, "L")).select(lcols).to_pandas()
        rg = g.filter(pa.compute.equal(side, "R")).select(rcols).to_pandas()
        if how == "inner" and (lg.empty or rg.empty):
            df = pd.DataFrame(columns=[f.name for f in out_schema])
        else:
            df = lg.merge(rg, on=on, how=how)[[f.name for f in out_schema]]
        return pa.Table.from_pandas(df, schema=out_schema, preserve_index=False)

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def order_lineitem_join_totals(sf_dir: str) -> rd.Dataset:
    """Both-sides-large join: lineitem ⨝ orders on orderkey, then per-order
    revenue. The lineitem side is pre-aggregated per (bucket, orderkey)
    BEFORE the join shuffle (combiner), so the exchange moves one row per
    order per side instead of one per lineitem."""
    from crawler_ray.sources.io import read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        target_rows_per_block=4096,
    )

    def li_partial(t: pa.Table) -> pa.Table:
        # exact integer-cents arithmetic: price and discount have 2 decimals,
        # so round(price*100) * round((1-d)*100) is an exact integer (in
        # float64, < 2^53) and the distributed sum is associative — no
        # summation-order rounding flips vs the oracle
        price_c = np.round(t["l_extendedprice"].to_numpy() * 100.0)
        disc_c = np.round((1.0 - t["l_discount"].to_numpy()) * 100.0)
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(),
                "rev": price_c * disc_c,  # revenue in 1e-4 units, exact
            }
        )
        out = (
            df.groupby("l_orderkey", sort=False)
            .agg(rev_p=("rev", "sum"), n_items_p=("rev", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    # ONE exchange for aggregate AND join (round 3): both sides key on the
    # orderkey, so instead of a full groupby().aggregate() exchange followed
    # by a bucketed-join exchange, the combined (li-partial ∪ orders) rows
    # hash-partition ONCE on the key and each partition finishes the
    # aggregation and the merge in pandas. (The replaced shape measured
    # 7.3 s for the Ray Aggregate alone at sf0.1; this runs the whole query
    # in ~1.5 s.) Values stay exact: rev partials are 1e-4-unit integers
    # < 2^53, so float64 passage cannot round them.
    from crawler_ray.sources.io import read_parquet_sized

    n_parts = 32
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"],
        target_rows_per_block=4096,
    )

    def prep_li(t: pa.Table) -> pa.Table:
        p = li_partial(t)
        key = p["l_orderkey"].to_numpy()
        return pa.table(
            {
                "key": p["l_orderkey"],
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "rev_p": p["rev_p"],
                "n_items_p": p["n_items_p"],
                "o_totalprice": pa.nulls(p.num_rows, pa.float64()),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "key": t["o_orderkey"],
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "rev_p": pa.nulls(t.num_rows, pa.float64()),
                "n_items_p": pa.nulls(t.num_rows, pa.int64()),
                "o_totalprice": t["o_totalprice"],
            }
        )

    def merge_part(g: pa.Table) -> pa.Table:
        is_o = pa.compute.is_valid(g["o_totalprice"])
        og = g.filter(is_o).select(["key", "o_totalprice"]).to_pandas()
        lg = g.filter(pa.compute.invert(is_o)).select(
            ["key", "rev_p", "n_items_p"]
        ).to_pandas()
        agg = (
            lg.groupby("key", sort=False)
            .agg(revenue_raw=("rev_p", "sum"), n_items=("n_items_p", "sum"))
            .reset_index()
        )
        m = og.merge(agg, on="key", how="inner")
        return pa.table(
            {
                "o_orderkey": pa.array(m["key"].to_numpy().astype(np.int64)),
                "o_totalprice": pa.array(m["o_totalprice"].to_numpy(), pa.float64()),
                "lineitem_revenue": pa.array(
                    round_np(m["revenue_raw"].to_numpy() / 10000.0, 2), pa.float64()
                ),
                "n_items": pa.array(m["n_items"].to_numpy().astype(np.int64)),
            }
        )

    li_tagged = li.map_batches(prep_li, batch_format="pyarrow")
    o_tagged = orders.map_batches(prep_orders, batch_format="pyarrow")
    return (
        li_tagged.union(o_tagged)
        .groupby("part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


ORDER_LINEITEM_JOIN_SQL = """
SELECT o_orderkey, o_totalprice,
       ROUND(SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100))
             / 10000.0, 2) AS lineitem_revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_totalprice
"""


# ---------------------------------------------------------------------------
# as-of join (time-series point-in-time join) — an operator Ray Data has no
# native verb for: ONE fused hash exchange on the equi-key, then a
# vectorized per-partition backward merge_asof


def events_asof_order_join(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """For each event, the most recent order of the same customer placed at
    or before the event time (backward as-of join), inner semantics.

    Shape: both sides hash-partition ONCE on the shared key
    (user_id = o_custkey) via the same union-exchange trick as
    ``order_lineitem_join_totals`` — every (key, time)-match is confined to
    one partition, so the merge is embarrassingly parallel. Inside each
    partition ``pd.merge_asof`` (vectorized C galloping search over both
    sides sorted by time) resolves the point-in-time match. Ties on
    o_orderdate break to the HIGHEST o_orderkey: the order side is sorted
    by (o_orderdate, o_orderkey) and merge_asof takes the last row ≤ ts,
    matching the oracle's ``ORDER BY o_orderdate DESC, o_orderkey DESC``
    rank-1 row. Skewed keys: a hot user salts into sub-partitions by
    time-range the same way the frontier salts hot hosts (documented knob;
    uniform here)."""
    from crawler_ray.sources.io import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"],
        target_rows_per_block=8192,
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        target_rows_per_block=8192,
    )

    def prep_events(t: pa.Table) -> pa.Table:
        key = t["user_id"].to_numpy()
        return pa.table(
            {
                "key": t["user_id"],
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "event_id": t["event_id"],
                "ts": t["ts"],
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
                "o_totalprice": pa.nulls(t.num_rows, pa.float64()),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        key = t["o_custkey"].to_numpy()
        return pa.table(
            {
                "key": t["o_custkey"],
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "event_id": pa.nulls(t.num_rows, pa.int64()),
                "ts": pa.nulls(t.num_rows, pa.timestamp("us")),
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
            }
        )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("asof_orderkey", pa.int64()), ("asof_totalprice", pa.float64())]
    )

    def merge_part(g: pa.Table) -> pa.Table:
        is_e = pa.compute.is_valid(g["event_id"])
        eg = g.filter(is_e).select(["key", "event_id", "ts"]).to_pandas()
        og = g.filter(pa.compute.invert(is_e)).select(
            ["key", "o_orderkey", "o_orderdate", "o_totalprice"]
        ).to_pandas()
        if eg.empty or og.empty:
            return pa.Table.from_pylist([], schema=out_schema)
        eg = eg.sort_values("ts", kind="stable")
        og = og.sort_values(["o_orderdate", "o_orderkey"], kind="stable")
        m = pd.merge_asof(
            eg, og, left_on="ts", right_on="o_orderdate",
            by="key", direction="backward",
        )
        m = m[m["o_orderkey"].notna()]  # inner: drop events with no prior order
        return pa.table(
            {
                "event_id": pa.array(m["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(m["key"].to_numpy(), pa.int64()),
                "asof_orderkey": pa.array(
                    m["o_orderkey"].to_numpy().astype(np.int64), pa.int64()),
                "asof_totalprice": pa.array(
                    m["o_totalprice"].to_numpy(), pa.float64()),
            }
        )

    return (
        events.map_batches(prep_events, batch_format="pyarrow")
        .union(orders.map_batches(prep_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


EVENTS_ASOF_SQL = """
SELECT event_id, user_id, o_orderkey AS asof_orderkey,
       o_totalprice AS asof_totalprice
FROM (
    SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY e.event_id
                              ORDER BY o.o_orderdate DESC,
                                       o.o_orderkey DESC) AS rn
    FROM events e
    JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# range (interval) self-join — per-event count of the same user's events in
# the following hour, without materializing the joined pairs


def user_events_next_hour(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """For each event, how many LATER events the same user produced within
    the next hour (range join ``b.ts > a.ts AND b.ts <= a.ts + 1h``
    aggregated per left row).

    The naive form materializes the pair blowup; here each partition
    (hash(user) % P — one exchange, same key discipline as the other
    joins) answers all its rows with two vectorized ``searchsorted`` calls
    over ONE composite-sorted timestamp array: user segments are offset so
    ranges never cross users, so counts for every row in the partition come
    from upper-bound minus lower-bound positions — no pair rows exist at
    any point."""
    from crawler_ray.sources.io import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"],
        target_rows_per_block=8192,
    )
    hour_us = 3_600_000_000  # INTERVAL 1 HOUR in microseconds

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["user_id"].to_numpy() % n_parts).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def count_window(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((ts, uid))
        uid_s, ts_s, eid_s = uid[order], ts[order], eid[order]
        # collapse (user, ts) into one monotonic int64 axis: rebase ts and
        # give each user a lane wide enough that a +1h probe cannot reach
        # the next user's lane
        ts0 = ts_s - ts_s.min()
        span = int(ts0.max()) + 2 * hour_us + 1
        lane = np.cumsum(np.r_[False, uid_s[1:] != uid_s[:-1]]).astype(np.int64)
        composite = lane * span + ts0
        lo = np.searchsorted(composite, composite, side="right")
        hi = np.searchsorted(composite, composite + hour_us, side="right")
        return pa.table(
            {"event_id": pa.array(eid_s, pa.int64()),
             "n_next_hour": pa.array((hi - lo).astype(np.int64), pa.int64())}
        )

    return (
        events.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_window, batch_format="pyarrow")
    )


USER_EVENTS_NEXT_HOUR_SQL = """
SELECT a.event_id, COUNT(b.event_id) AS n_next_hour
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.event_id
"""


# ---------------------------------------------------------------------------
# partitioned anti join (NOT EXISTS)


def customers_without_urgent_orders(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """Customers with no '1-URGENT' order (anti join / NOT EXISTS).

    The probe side collapses to DISTINCT keys inside ``map_batches``
    BEFORE the exchange (semi/anti joins never need the probe rows, only
    key presence — the same combiner-first discipline as the aggregates),
    then one hash partition co-locates each customer with every evidence
    key and a vectorized ``isin`` mask drops matches."""
    from crawler_ray.sources.io import read_parquet_sized

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
        target_rows_per_block=8192,
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        target_rows_per_block=8192,
    )

    def prep_cust(t: pa.Table) -> pa.Table:
        key = t["c_custkey"].to_numpy()
        return pa.table(
            {
                "key": t["c_custkey"],
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "c_name": t["c_name"],
                "c_acctbal": t["c_acctbal"],
            }
        )

    def prep_probe(t: pa.Table) -> pa.Table:
        mask = pa.compute.equal(t["o_orderpriority"], "1-URGENT")
        keys = np.unique(t.filter(mask)["o_custkey"].to_numpy())
        n = len(keys)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "part": pa.array((keys % n_parts).astype(np.int64), pa.int64()),
                "c_name": pa.nulls(n, pa.string()),
                "c_acctbal": pa.nulls(n, pa.float64()),
            }
        )

    out_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("c_acctbal", pa.float64())]
    )

    def anti(g: pa.Table) -> pa.Table:
        is_cust = pa.compute.is_valid(g["c_name"])
        cg = g.filter(is_cust)
        probe = g.filter(pa.compute.invert(is_cust))["key"]
        keep = pa.compute.invert(
            pa.compute.is_in(cg["key"], value_set=probe.combine_chunks())
        )
        out = cg.filter(keep)
        return pa.table(
            {"c_custkey": out["key"], "c_name": out["c_name"],
             "c_acctbal": out["c_acctbal"]},
            schema=out_schema,
        )

    return (
        cust.map_batches(prep_cust, batch_format="pyarrow")
        .union(orders.map_batches(prep_probe, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(anti, batch_format="pyarrow")
    )


CUSTOMERS_WITHOUT_URGENT_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


# ---------------------------------------------------------------------------
# partitioned LEFT OUTER join aggregate


def customer_order_counts(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """Every customer with order count and total spend, ZEROS preserved for
    customers with no orders — the LEFT OUTER member of the join-verb family
    (inner = ``partitioned_hash_join``, anti = NOT EXISTS, as-of, range).

    Shape: orders collapse to per-batch (custkey, n, cents) partials BEFORE
    any exchange (combiner-first, integer cents so block split and
    accumulation order cannot flip values); customers and partials co-locate
    on ONE custkey-hash partition; the per-partition fold sums partials and
    left-attaches with zero fill. No second exchange and no padded null
    blowup — the unmatched side is filled in-task."""
    from crawler_ray.sources.io import read_parquet_sized

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        target_rows_per_block=8192,
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"],
        target_rows_per_block=8192,
    )

    _SCHEMA = pa.schema(
        [("key", pa.int64()), ("c_name", pa.string()),
         ("n", pa.int64()), ("cents", pa.int64()),
         ("part", pa.int64())]
    )

    def prep_cust(t: pa.Table) -> pa.Table:
        key = t["c_custkey"].to_numpy()
        return pa.table(
            {"key": t["c_custkey"], "c_name": t["c_name"],
             "n": pa.nulls(t.num_rows, pa.int64()),
             "cents": pa.nulls(t.num_rows, pa.int64()),
             "part": pa.array((key % n_parts).astype(np.int64), pa.int64())}
        ).cast(_SCHEMA)

    def prep_orders(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"key": t["o_custkey"].to_numpy(),
             "cents": np.round(t["o_totalprice"].to_numpy() * 100)
             .astype(np.int64)}
        )
        g = df.groupby("key", sort=False).agg(
            n=("cents", "size"), cents=("cents", "sum")
        ).reset_index()
        keys = g["key"].to_numpy(np.int64)
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "c_name": pa.nulls(len(g), pa.string()),
             "n": pa.array(g["n"].to_numpy(np.int64)),
             "cents": pa.array(g["cents"].to_numpy(np.int64)),
             "part": pa.array((keys % n_parts).astype(np.int64), pa.int64())}
        ).cast(_SCHEMA)

    out_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("n_orders", pa.int64()), ("total_spend", pa.float64())]
    )

    def fold(g: pa.Table) -> pa.Table:
        is_cust = pa.compute.is_valid(g["c_name"])
        cg = g.filter(is_cust).select(["key", "c_name"]).to_pandas()
        og = g.filter(pa.compute.invert(is_cust)).select(
            ["key", "n", "cents"]
        ).to_pandas()
        agg = og.groupby("key", sort=False)[["n", "cents"]].sum()
        m = cg.merge(agg, left_on="key", right_index=True, how="left")
        n = m["n"].fillna(0).astype(np.int64)
        cents = m["cents"].fillna(0).astype(np.int64)
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"c_custkey": m["key"].astype(np.int64),
                 "c_name": m["c_name"],
                 "n_orders": n,
                 "total_spend": cents / 100.0}
            ),
            schema=out_schema, preserve_index=False,
        )

    return (
        cust.map_batches(prep_cust, batch_format="pyarrow")
        .union(orders.map_batches(prep_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .select_columns(["c_custkey", "c_name", "n_orders", "total_spend"])
    )


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey, c.c_name,
       COALESCE(o.n, 0)::BIGINT AS n_orders,
       COALESCE(o.cents, 0) / 100.0 AS total_spend
FROM customer c LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered SEMI join (EXISTS) — completes the join-verb family


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bloom_ref_from_keys(ds: rd.Dataset, col: str, cap: int | None = None):
    """OR-fold per-block Bloom partials over ``ds[col]`` (slim, already
    filtered) and ``ray.put`` the packed state — the build half of the
    bloom-semi-join shape (``orders_from_event_users``), factored so any
    fact-vs-filtered-dim exchange can prefilter its probe side. Only
    fixed-size bit arrays reach the driver.

    Pass ``cap`` (an upper bound, e.g. the dim table's footer row count)
    to size the filter without a counting pass — oversizing only wastes
    bits (at 10^10-key scale, size from a selectivity estimate instead)."""
    from crawler_ray.state.filters import BloomFilter

    if cap is None:
        ds = ds.materialize()
        cap = int(ds.count())
    cap = max(1024, cap)

    def block_bloom(t: pa.Table) -> pa.Table:
        f = BloomFilter(cap)
        f.add(_splitmix64(t[col].to_numpy()))
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.binary())})

    parts = ds.map_batches(block_bloom, batch_format="pyarrow").to_pandas()
    bloom = BloomFilter(cap)
    for b in parts["bits"]:
        bloom.bits |= np.frombuffer(b, dtype=np.uint8)
    return ray.put(bloom.state())


class _BloomGate:
    """Lazy per-worker bloom membership test over one int64 column —
    resolve the broadcast state once per task/actor, filter each batch."""

    def __init__(self, ref, col: str):
        self.ref = ref
        self.col = col
        self._f = None

    def keep(self, t: pa.Table) -> pa.Table:
        if self.ref is None:  # gate disabled (below the bloom crossover)
            return t
        import ray as _ray

        from crawler_ray.state.filters import BloomFilter

        if self._f is None:
            st = (
                _ray.get(self.ref)
                if isinstance(self.ref, _ray.ObjectRef)
                else self.ref
            )
            self._f = BloomFilter.from_state(st)
        keys = t[self.col].to_numpy()
        return t.filter(pa.array(self._f.contains(_splitmix64(keys))))


# bloom-prefilter crossover: the build's materialize gates the probe stream
# (breaks read/shuffle pipelining), so on small facts it costs more than
# the saved exchange; measured at sf0.1 (150k orders) bloom LOSES ~0.6 s
# per query, and wins once the probe fact is ~10x that. Auto mode turns it
# on when the probe side's footer row count clears this bar.
BLOOM_PROBE_CROSSOVER_ROWS = 1_500_000


def _want_bloom(flag: bool | None, probe_parquet: str) -> bool:
    if flag is not None:
        return flag
    import pyarrow.parquet as pq_

    return (
        pq_.ParquetFile(probe_parquet).metadata.num_rows
        >= BLOOM_PROBE_CROSSOVER_ROWS
    )


class _BloomProbe:
    """Task-mode bloom prefilter: the packed bit array ships once via
    ``ray.put`` and is resolved lazily per worker (the BroadcastJoiner
    convention). No false negatives — survivors still get exact
    verification downstream; the bloom only cuts shuffle volume."""

    def __init__(self, state_ref, key: str, n_parts: int):
        self.ref = state_ref
        self.key = key
        self.n_parts = n_parts
        self._f = None

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        from crawler_ray.state.filters import BloomFilter

        if self._f is None:
            st = ray.get(self.ref) if isinstance(self.ref, ray.ObjectRef) else self.ref
            self._f = BloomFilter.from_state(st)
        keys = t[self.key].to_numpy()
        hit = self._f.contains(_splitmix64(keys))
        t = t.filter(pa.array(hit))
        return t.append_column(
            "part",
            pa.array((t[self.key].to_numpy() % self.n_parts).astype(np.int64),
                     pa.int64()),
        )


def orders_from_event_users(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """SEMI join (``WHERE EXISTS``): orders whose customer appears in the
    events stream (testdata convention: ``events.user_id`` keys the
    customer domain) — the bloom-join shape for a fact⋈fact exists-check
    at scale:

    1. distinct build keys via one slim partition fold (per-batch unique
       → coarse key-hash exchange → in-task unique),
    2. a Bloom filter over the distinct keys is OR-folded from per-block
       partials — only fixed-size bit arrays reach the driver — and
       broadcast once with ``ray.put``,
    3. the probe fact PREFILTERS against the bloom inside ``map_batches``
       (no false negatives), so only ~matching + ε·FP rows enter
    4. the exact semi fold (probe rows ∪ distinct build keys co-located
       by key-hash; in-task membership test removes bloom false
       positives).

    The probe side's shuffle volume shrinks from |orders| to
    |semi matches| + FP — the entire point of a bloom join when the probe
    fact is 100× the match rate. Output is exact regardless of FP rate."""
    import ray

    from crawler_ray.sources.io import read_parquet_sized
    from crawler_ray.state.filters import BloomFilter

    events = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])

    def distinct_batch(t: pa.Table) -> pa.Table:
        u = np.unique(t["user_id"].to_numpy())
        return pa.table(
            {"user_id": pa.array(u, pa.int64()),
             "part": pa.array((u % n_parts).astype(np.int64), pa.int64())}
        )

    def distinct_fold(g: pa.Table) -> pa.Table:
        u = np.unique(g["user_id"].to_numpy())
        return pa.table(
            {"user_id": pa.array(u, pa.int64()),
             "part": pa.array((u % n_parts).astype(np.int64), pa.int64())}
        )

    users = (
        events.map_batches(distinct_batch, batch_format="pyarrow")
        .groupby("part")
        .map_groups(distinct_fold, batch_format="pyarrow")
        .materialize()  # slim (user_id, part) rows; reused twice below
    )

    cap = max(1024, int(users.count()))

    def block_bloom(t: pa.Table) -> pa.Table:
        f = BloomFilter(cap)
        f.add(_splitmix64(t["user_id"].to_numpy()))
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.binary())})

    parts = users.map_batches(block_bloom, batch_format="pyarrow").to_pandas()
    bloom = BloomFilter(cap)
    # .empty guard: a zero-user corpus drops the fold's schema; the all-zero
    # filter then correctly rejects every orders probe
    for b in (parts["bits"] if not parts.empty else ()):
        bloom.bits |= np.frombuffer(b, dtype=np.uint8)
    state_ref = ray.put(bloom.state())

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        target_rows_per_block=4096,
    )
    prefiltered = orders.map_batches(
        _BloomProbe(state_ref, "o_custkey", n_parts), batch_format="pyarrow"
    )

    def semi(g: pa.Table) -> pa.Table:
        is_build = pa.compute.is_valid(g["user_id"])
        build = g.filter(is_build)["user_id"].to_numpy(zero_copy_only=False)
        probe = g.filter(pa.compute.invert(is_build))
        keep = np.isin(
            probe["o_custkey"].to_numpy(zero_copy_only=False), build
        )
        out = probe.filter(pa.array(keep))
        return out.select(["o_orderkey", "o_custkey", "o_totalprice"])

    probe_rows = prefiltered.map_batches(
        lambda t: t.append_column("user_id", pa.nulls(t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    build_rows = users.map_batches(
        lambda t: pa.table(
            {"o_orderkey": pa.nulls(t.num_rows, pa.int64()),
             "o_custkey": pa.nulls(t.num_rows, pa.int64()),
             "o_totalprice": pa.nulls(t.num_rows, pa.float64()),
             "part": t["part"],
             "user_id": t["user_id"]}
        ),
        batch_format="pyarrow",
    )
    return (
        probe_rows.union(build_rows)
        .groupby("part")
        .map_groups(semi, batch_format="pyarrow")
    )


ORDERS_FROM_EVENT_USERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = o_custkey)
"""


# ---------------------------------------------------------------------------
# FULL OUTER join aggregate — completes the outer-join family


def customer_order_event_counts(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """FULL OUTER join of two per-key aggregates: order count per customer
    vs event count per user (testdata convention: ``events.user_id`` keys
    the customer domain), zero-filled on BOTH sides — keys present in
    either fact survive. Shape: each fact folds its per-key combiner in
    batch, the two slim partial streams union into ONE key-hash exchange,
    and the in-task pivot sums each side with zero fill. No driver-side
    rows, no second pass over either fact."""
    from crawler_ray.sources.io import read_parquet_sized

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        target_rows_per_block=4096,
    )
    events = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id"],
        target_rows_per_block=4096,
    )

    def partial(col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            k, cnt = np.unique(t[col].to_numpy(), return_counts=True)
            return pa.table(
                {"key_id": pa.array(k, pa.int64()),
                 "part": pa.array((k % n_parts).astype(np.int64), pa.int64()),
                 "side": pa.array(np.full(len(k), side, np.int64), pa.int64()),
                 "n": pa.array(cnt.astype(np.int64), pa.int64())}
            )

        return fn

    def fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        p = df.pivot_table(
            index="key_id", columns="side", values="n", aggfunc="sum",
            fill_value=0,
        ).reindex(columns=[0, 1], fill_value=0)
        return pa.table(
            {"key_id": pa.array(p.index.to_numpy(np.int64), pa.int64()),
             "n_orders": pa.array(p[0].to_numpy(np.int64), pa.int64()),
             "n_events": pa.array(p[1].to_numpy(np.int64), pa.int64())}
        )

    return (
        orders.map_batches(partial("o_custkey", 0), batch_format="pyarrow")
        .union(events.map_batches(partial("user_id", 1), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )


CUSTOMER_ORDER_EVENT_COUNTS_SQL = """
WITH o AS (SELECT o_custkey AS k, COUNT(*)::BIGINT AS n_orders
           FROM orders GROUP BY 1),
     e AS (SELECT user_id AS k, COUNT(*)::BIGINT AS n_events
           FROM events GROUP BY 1)
SELECT COALESCE(o.k, e.k) AS key_id,
       COALESCE(n_orders, 0)::BIGINT AS n_orders,
       COALESCE(n_events, 0)::BIGINT AS n_events
FROM o FULL OUTER JOIN e ON o.k = e.k
"""


# ---------------------------------------------------------------------------
# EXISTS-aggregate (TPC-H Q4 shape): late-shipped order counts by priority


def late_ship_priority_counts(
    sf_dir: str, grace_days: int = 30, n_parts: int = 32
) -> rd.Dataset:
    """Per order priority, how many orders had at least one line item
    shipped more than ``grace_days`` after the order date — the TPC-H Q4
    shape (aggregate over an EXISTS correlated to another fact). ONE
    orderkey-hash exchange co-locates each order with its line items'
    per-batch MAX-shipdate partials (combiner: one slim row per
    (batch, orderkey), never one per line item); the in-task exists-test
    emits per-priority count partials and the final groupby folds
    |priorities| rows."""
    from crawler_ray.sources.io import read_parquet_sized

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        target_rows_per_block=4096,
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"],
        target_rows_per_block=4096,
    )

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"key": t["l_orderkey"].to_numpy(),
             # FULL microsecond resolution: the oracle's `l_shipdate >
             # o_orderdate + INTERVAL 30 DAY` compares TIMESTAMPS; a
             # day-truncated compare silently drops orders whose last ship
             # lands later-in-day than odate+30d on the boundary day
             # (invisible on the midnight-only driver dates; found by the
             # sf0.01-base fuzz, seed 11000)
             "ship": t["l_shipdate"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64)}
        )
        g = df.groupby("key", sort=False)["ship"].max()
        k = g.index.to_numpy(np.int64)
        return pa.table(
            {"key": pa.array(k, pa.int64()),
             "part": pa.array((k % n_parts).astype(np.int64), pa.int64()),
             "ship_max": pa.array(g.to_numpy(np.int64), pa.int64()),
             "odate": pa.nulls(len(k), pa.int64()),
             "priority": pa.nulls(len(k), pa.string())}
        )

    def o_rows(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        od = t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {"key": pa.array(k, pa.int64()),
             "part": pa.array((k % n_parts).astype(np.int64), pa.int64()),
             "ship_max": pa.nulls(len(k), pa.int64()),
             "odate": pa.array(od, pa.int64()),
             "priority": t["o_orderpriority"]}
        )

    def fold(g: pa.Table) -> pd.DataFrame:
        df = g.to_pandas()
        is_li = df["ship_max"].notna()
        mx = df[is_li].groupby("key")["ship_max"].max()
        od = df[~is_li].drop(columns=["ship_max"]).set_index("key")
        joined = od.join(mx, how="inner")
        late = joined[
            joined["ship_max"]
            > joined["odate"] + np.int64(grace_days) * 86_400_000_000
        ]
        out = late.groupby("priority", sort=False).size().rename("n_p")
        return out.reset_index()

    agg = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(o_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("priority")
        .aggregate(Sum("n_p", alias_name="late_orders"))
    )
    return agg.map_batches(
        lambda df: pd.DataFrame(
            {"o_orderpriority": df["priority"],
             "late_orders": df["late_orders"].astype("int64")}
        ),
        batch_format="pandas",
    )


def late_ship_priority_counts_sql(grace_days: int = 30) -> str:
    return f"""
SELECT o_orderpriority, COUNT(*)::BIGINT AS late_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {grace_days} DAY
)
GROUP BY 1
"""


def returned_item_report(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """TPC-H Q10 shape — the 4-relation join report: revenue lost to
    RETURNED items per customer over a date window, with the customer's
    nation name, top 20. Exercises the full join toolkit in one plan:

    - lineitem filtered to ``l_returnflag='R'`` AT THE READ side and
      pre-aggregated per (block, orderkey) — the combiner — in exact
      1e-4-unit integer revenue;
    - lineitem-partials ⋈ orders (date-window filtered) in ONE fused
      union-exchange on orderkey (the ``order_lineitem_join_totals``
      shape), re-keyed to custkey with in-partition partial sums;
    - ONE custkey exchange finishes the per-customer fold;
    - customer and nation are BROADCAST dimensions (1500 + 25 rows —
      shipping them to every task beats shuffling the fact);
    - deterministic top-20: (revenue_raw DESC, custkey ASC) over exact
      integers, folded per-block then once globally (bounded driver set).
    """
    import pyarrow.compute as pc_

    from crawler_ray.sources.io import read_parquet_sized

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        target_rows_per_block=4096,
    )

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc_.equal(t["l_returnflag"], "R"))
        price_c = np.round(t["l_extendedprice"].to_numpy() * 100.0)
        disc_c = np.round((1.0 - t["l_discount"].to_numpy()) * 100.0)
        df = pd.DataFrame(
            {"key": t["l_orderkey"].to_numpy(), "rev": price_c * disc_c}
        )
        out = df.groupby("key", sort=False)["rev"].sum().reset_index()
        key = out["key"].to_numpy()
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "rev": pa.array(out["rev"].to_numpy(), pa.float64()),
                "o_custkey": pa.nulls(len(out), pa.int64()),
            }
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        target_rows_per_block=4096,
    )

    def o_rows(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        key = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "rev": pa.nulls(t.num_rows, pa.float64()),
                "o_custkey": t["o_custkey"].cast(pa.int64()),
            }
        )

    def merge_orderkey(g: pa.Table) -> pa.Table:
        # join + re-key to custkey with an in-partition partial fold
        is_o = pa.compute.is_valid(g["o_custkey"])
        og = g.filter(is_o).select(["key", "o_custkey"]).to_pandas()
        lg = g.filter(pa.compute.invert(is_o)).select(["key", "rev"]).to_pandas()
        m = og.merge(
            lg.groupby("key", sort=False)["rev"].sum().reset_index(),
            on="key", how="inner",
        )
        out = m.groupby("o_custkey", sort=False)["rev"].sum().reset_index()
        ck = out["o_custkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "c_custkey": pa.array(ck, pa.int64()),
                "rev": pa.array(out["rev"].to_numpy(), pa.float64()),
            }
        )

    def fold_custkey(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        out = df.groupby("c_custkey", sort=False)["rev"].sum().reset_index()
        # per-partition top-20 prefilter: the global top 20 is a subset of
        # the union of per-partition top 20s
        out = out.sort_values(
            ["rev", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(20)
        return pa.Table.from_pandas(out, preserve_index=False)

    folded = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(o_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(merge_orderkey, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_custkey, batch_format="pyarrow")
    )

    # bounded final fold (≤ 20 × n_parts rows) + broadcast dims
    import pyarrow.parquet as pq_

    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    ).to_pandas()
    nation = pq_.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    dim = cust.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )[["c_custkey", "c_name", "n_name"]]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["rev", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(20)
        m = df.merge(dim, on="c_custkey", how="left")
        return pd.DataFrame(
            {
                "c_custkey": m["c_custkey"].astype("int64"),
                "c_name": m["c_name"],
                "n_name": m["n_name"],
                "revenue": round_np(m["rev"] / 10000.0, 2),
            }
        )

    out = folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
    return schema_safe(out, pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("n_name", pa.string()), ("revenue", pa.float64())]
    ))


RETURNED_ITEM_REPORT_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100))
             / 10000.0, 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100))
         DESC, c_custkey
LIMIT 20
"""


def local_supplier_volume(
    sf_dir: str, region: str = "ASIA", n_parts: int = 32
) -> rd.Dataset:
    """TPC-H Q5 shape — the 6-relation join: revenue per nation from
    orders whose customer AND line-supplier sit in the SAME nation of one
    region, over a date window. The widest join plan in the suite, and a
    worked example of choosing per-relation strategies by size:

    - region ⋈ nation: driver-side (5 × 25 rows) → the set of in-region
      nation keys;
    - supplier: slim (s_suppkey → s_nationkey) map, PRE-FILTERED to
      in-region nations and BROADCAST into the lineitem combiner
      (supplier is ~1/10000 of lineitem — shipping it beats a shuffle);
      lineitem rows of out-of-region suppliers die at the read;
    - orders (date-filtered) ⋈ customer: both large → ONE tagged-union
      custkey exchange, emitting (o_orderkey, c_nationkey) re-keyed by
      orderkey;
    - lineitem partials (per-block (orderkey, s_nat) integer-revenue
      combiner) join that stream in ONE orderkey exchange, keeping rows with
      c_nationkey == s_nationkey (the Q5 "local" predicate) and folding
      to per-nation partials in-task;
    - the final groupby moves ≤ |nations| × n_parts rows.

    Revenue is exact 1e-4-unit integers end to end (the
    ``returned_item_report`` convention); /10000 + round(2) happens once
    at the finish with the oracle's arithmetic."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_

    from crawler_ray.sources.io import read_parquet_sized

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    # driver-side dims: region⋈nation (tiny)
    nat = pq_.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq_.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    in_region = nat.merge(
        reg[reg["r_name"] == region], left_on="n_regionkey",
        right_on="r_regionkey",
    )
    nat_names = dict(
        zip(in_region["n_nationkey"].astype(int), in_region["n_name"])
    )
    nat_keys = set(nat_names)

    # broadcast supplier map, pre-filtered to the region
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    sup = sup[sup["s_nationkey"].isin(nat_keys)]
    sup_ref = ray.put(
        dict(zip(sup["s_suppkey"].astype(int), sup["s_nationkey"].astype(int)))
    )

    # orders (date-filtered) ⋈ customer on custkey — tagged union exchange
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        target_rows_per_block=4096,
    )

    def o_rows(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        ck = t["o_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "c_nat": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        target_rows_per_block=4096,
    )

    def c_rows(t: pa.Table) -> pa.Table:
        # only in-region customers can satisfy c_nat == s_nat later
        keep = np.isin(t["c_nationkey"].to_numpy(), list(nat_keys))
        t = t.filter(pa.array(keep))
        ck = t["c_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "c_nat": t["c_nationkey"].cast(pa.int64()),
            }
        )

    def merge_custkey(g: pa.Table) -> pa.Table:
        is_c = pc_.is_valid(g["c_nat"])
        cg = g.filter(is_c).select(["key", "c_nat"]).to_pandas()
        og = g.filter(pc_.invert(is_c)).select(["key", "o_orderkey"]).to_pandas()
        m = og.merge(cg, on="key", how="inner")
        ok = m["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array((ok % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ok, pa.int64()),
                "c_nat": pa.array(m["c_nat"].to_numpy(np.int64), pa.int64()),
                "rev": pa.nulls(len(m), pa.float64()),
                "s_nat": pa.nulls(len(m), pa.int64()),
            }
        )

    o_c = (
        orders.map_batches(o_rows, batch_format="pyarrow")
        .union(cust.map_batches(c_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(merge_custkey, batch_format="pyarrow")
    )

    # lineitem combiner: broadcast supplier map, per-block integer partials
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        target_rows_per_block=4096,
    )

    class LiPartial:
        def __init__(self, ref):
            self.ref = ref
            self._map: dict | None = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._map is None:
                self._map = (
                    ray.get(self.ref)
                    if isinstance(self.ref, ray.ObjectRef)
                    else self.ref
                )
                keys = np.fromiter(self._map, dtype=np.int64)
                vals = np.fromiter(self._map.values(), dtype=np.int64)
                order = np.argsort(keys)
                self._keys, self._vals = keys[order], vals[order]
            sk = t["l_suppkey"].to_numpy()
            pos = np.searchsorted(self._keys, sk)
            pos = np.clip(pos, 0, max(len(self._keys) - 1, 0))
            # empty key list (no in-region suppliers): every probe misses
            hit = (
                self._keys[pos] == sk  # in-region suppliers only
                if len(self._keys)
                else np.zeros(len(sk), bool)
            )
            t = t.filter(pa.array(hit))
            s_nat = self._vals[pos[hit]]
            rev = np.round(t["l_extendedprice"].to_numpy() * 100.0) * np.round(
                (1.0 - t["l_discount"].to_numpy()) * 100.0
            )
            df = pd.DataFrame(
                {
                    "key": t["l_orderkey"].to_numpy(),
                    "s_nat": s_nat,
                    "rev": rev,
                }
            )
            out = (
                df.groupby(["key", "s_nat"], sort=False)["rev"]
                .sum()
                .reset_index()
            )
            key = out["key"].to_numpy(np.int64)
            return pa.table(
                {
                    "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                    "key": pa.array(key, pa.int64()),
                    "c_nat": pa.nulls(len(out), pa.int64()),
                    "rev": pa.array(out["rev"].to_numpy(), pa.float64()),
                    "s_nat": pa.array(
                        out["s_nat"].to_numpy(np.int64), pa.int64()
                    ),
                }
            )

    def merge_orderkey(g: pa.Table) -> pa.Table:
        is_li = pc_.is_valid(g["s_nat"])
        lg = g.filter(is_li).select(["key", "s_nat", "rev"]).to_pandas()
        og = g.filter(pc_.invert(is_li)).select(["key", "c_nat"]).to_pandas()
        m = lg.merge(og, on="key", how="inner")
        m = m[m["s_nat"] == m["c_nat"]]  # the Q5 "local" predicate
        out = m.groupby("s_nat", sort=False)["rev"].sum().reset_index()
        return pa.table(
            {
                "nat": pa.array(out["s_nat"].to_numpy(np.int64), pa.int64()),
                "rev": pa.array(out["rev"].to_numpy(), pa.float64()),
            }
        )

    folded = (
        li.map_batches(LiPartial(sup_ref), batch_format="pyarrow")
        .union(o_c)
        .groupby("part")
        .map_groups(merge_orderkey, batch_format="pyarrow")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("nat", sort=False)["rev"].sum().reset_index()
        out["n_name"] = out["nat"].map(nat_names)
        out = out.sort_values("rev", ascending=False, kind="mergesort")
        return pd.DataFrame(
            {
                "n_name": out["n_name"],
                "revenue": round_np(out["rev"] / 10000.0, 2),
            }
        )

    out = folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
    return schema_safe(out, pa.schema(
        [("n_name", pa.string()), ("revenue", pa.float64())]
    ))


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       ROUND(SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100))
             / 10000.0, 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

# ---------------------------------------------------------------------------
# TPC-H Q7 shape: two-nation trade flows — a 6-relation join where BOTH join
# keys (custkey then orderkey) get exactly one exchange each and both nation
# dimensions are driver-resolved / broadcast


def nation_trade_flows(
    sf_dir: str,
    nat_a: str = "NATION_12",
    nat_b: str = "NATION_11",
    n_parts: int = 32,
    bloom_prefilter: bool | None = None,
) -> rd.Dataset:
    """Revenue shipped between two nations per direction per ship-year
    (TPC-H Q7 shape). Reference parity: the reference's report joins are
    broadcast-bag lookups (SURVEY.md §2.6); this is the large-fact
    generalization.

    Plan (two exchanges total, both on integer keys):
    - nation: driver-side name→key (25 rows);
    - supplier: slim suppkey→nationkey map PRE-FILTERED to the two nations,
      broadcast via ``ray.put`` as sorted arrays (searchsorted probe — rows
      of out-of-pair suppliers die inside the lineitem combiner);
    - orders ⋈ customer (filtered to the two nations): ONE tagged-union
      custkey exchange emitting (orderkey, c_nat);
    - lineitem combiner: ship-year window filter + supplier probe + exact
      1e-4-unit integer revenue, pre-folded per (orderkey, s_nat, year);
      joins the o_c stream in ONE orderkey exchange, keeping opposite-nation
      rows only (a ≠ b ⇒ s_nat ≠ c_nat), folded to
      (s_nat, c_nat, year) partials in-task;
    - final groupby moves ≤ 2 directions × 2 years × n_parts rows.
    """
    import pyarrow.parquet as pq_

    from crawler_ray.sources.io import read_parquet_sized

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1998-01-01")

    nat = pq_.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    key_of = dict(zip(nat["n_name"], nat["n_nationkey"].astype(int)))
    name_of = {v: k for k, v in key_of.items()}
    if nat_a not in key_of or nat_b not in key_of:
        # empty corpus / unknown nation: typed empty flows, not a KeyError
        return rd.from_arrow(
            pa.table({"supp_nation": pa.array([], pa.string()),
                      "cust_nation": pa.array([], pa.string()),
                      "l_year": pa.array([], pa.int64()),
                      "revenue": pa.array([], pa.float64())})
        )
    ka, kb = key_of[nat_a], key_of[nat_b]
    pair = {ka, kb}

    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    sup = sup[sup["s_nationkey"].isin(pair)].sort_values("s_suppkey")
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_nationkey"].to_numpy(np.int64),
        )
    )

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        target_rows_per_block=4096,
    )

    def c_rows(t: pa.Table) -> pa.Table:
        keep = np.isin(t["c_nationkey"].to_numpy(), list(pair))
        t = t.filter(pa.array(keep))
        ck = t["c_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "c_nat": t["c_nationkey"].cast(pa.int64()),
            }
        )

    # bloom-prefilter the orders probe: only ~2/|nations| of customers
    # qualify, so shipping every order through the custkey exchange wastes
    # the dominant shuffle at scale — the bloom (no false negatives; the
    # in-partition merge stays exact) cuts it to ~matching + ε·FP rows.
    # Auto mode (``_want_bloom``): the build's materialize gates the probe
    # stream, so below the measured crossover the gate is skipped. When
    # on: the filtered dim materializes ONCE (it is the c_rows stream
    # too) and the filter is capacity-sized from the parquet footer.
    if _want_bloom(bloom_prefilter, f"{sf_dir}/orders.parquet"):
        cust_f = cust.map_batches(c_rows, batch_format="pyarrow").materialize()
        cap = pq_.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
        bloom_ref = _bloom_ref_from_keys(cust_f, "key", cap=cap)
    else:
        cust_f = cust.map_batches(c_rows, batch_format="pyarrow")
        bloom_ref = None

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        target_rows_per_block=4096,
    )

    class ORows(_BloomGate):
        def __call__(self, t: pa.Table) -> pa.Table:
            t = self.keep(t)
            ck = t["o_custkey"].to_numpy()
            return pa.table(
                {
                    "part": pa.array(
                        (ck % n_parts).astype(np.int64), pa.int64()
                    ),
                    "key": pa.array(ck, pa.int64()),
                    "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                    "c_nat": pa.nulls(t.num_rows, pa.int64()),
                }
            )

    o_rows = ORows(bloom_ref, "o_custkey")

    def merge_custkey(g: pa.Table) -> pa.Table:
        is_c = pc.is_valid(g["c_nat"])
        cg = g.filter(is_c).select(["key", "c_nat"]).to_pandas()
        og = g.filter(pc.invert(is_c)).select(["key", "o_orderkey"]).to_pandas()
        m = og.merge(cg, on="key", how="inner")
        ok = m["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array((ok % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ok, pa.int64()),
                "c_nat": pa.array(m["c_nat"].to_numpy(np.int64), pa.int64()),
                "s_nat": pa.nulls(len(m), pa.int64()),
                "year": pa.nulls(len(m), pa.int64()),
                "rev": pa.nulls(len(m), pa.float64()),
            }
        )

    o_c = (
        orders.map_batches(o_rows, batch_format="pyarrow")
        .union(cust_f)
        .groupby("part")
        .map_groups(merge_custkey, batch_format="pyarrow")
    )

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate",
        ],
        target_rows_per_block=4096,
    )

    class LiPartial:
        def __init__(self, ref):
            self.ref = ref
            self._keys = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._keys is None:
                self._keys, self._vals = (
                    ray.get(self.ref)
                    if isinstance(self.ref, ray.ObjectRef)
                    else self.ref
                )
            d = t["l_shipdate"].to_numpy()
            t = t.filter(pa.array((d >= lo) & (d < hi)))
            sk = t["l_suppkey"].to_numpy()
            pos = np.searchsorted(self._keys, sk)
            pos = np.clip(pos, 0, max(len(self._keys) - 1, 0))
            hit = (
                self._keys[pos] == sk
                if len(self._keys)
                else np.zeros(len(sk), bool)
            )
            t = t.filter(pa.array(hit))
            s_nat = self._vals[pos[hit]]
            year = (
                t["l_shipdate"].to_numpy().astype("datetime64[Y]").astype(np.int64)
                + 1970
            )
            rev = np.round(t["l_extendedprice"].to_numpy() * 100.0) * np.round(
                (1.0 - t["l_discount"].to_numpy()) * 100.0
            )
            df = pd.DataFrame(
                {
                    "key": t["l_orderkey"].to_numpy(),
                    "s_nat": s_nat,
                    "year": year,
                    "rev": rev,
                }
            )
            out = (
                df.groupby(["key", "s_nat", "year"], sort=False)["rev"]
                .sum()
                .reset_index()
            )
            key = out["key"].to_numpy(np.int64)
            return pa.table(
                {
                    "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                    "key": pa.array(key, pa.int64()),
                    "c_nat": pa.nulls(len(out), pa.int64()),
                    "s_nat": pa.array(out["s_nat"].to_numpy(np.int64), pa.int64()),
                    "year": pa.array(out["year"].to_numpy(np.int64), pa.int64()),
                    "rev": pa.array(out["rev"].to_numpy(), pa.float64()),
                }
            )

    def merge_orderkey(g: pa.Table) -> pa.Table:
        is_li = pc.is_valid(g["s_nat"])
        lg = g.filter(is_li).select(["key", "s_nat", "year", "rev"]).to_pandas()
        og = g.filter(pc.invert(is_li)).select(["key", "c_nat"]).to_pandas()
        m = lg.merge(og, on="key", how="inner")
        m = m[m["s_nat"] != m["c_nat"]]  # opposite-direction flows only
        out = (
            m.groupby(["s_nat", "c_nat", "year"], sort=False)["rev"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    folded = (
        li.map_batches(LiPartial(sup_ref), batch_format="pyarrow")
        .union(o_c)
        .groupby("part")
        .map_groups(merge_orderkey, batch_format="pyarrow")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["s_nat", "c_nat", "year"], sort=False)["rev"]
            .sum()
            .reset_index()
        )
        out = out.sort_values(["s_nat", "c_nat", "year"], kind="mergesort")
        # typed construction so an empty fold still yields the full schema
        return pd.DataFrame(
            {
                # object (not pandas "string") dtype: Arrow round-trips the
                # pandas extension dtype through block metadata, so the
                # driver-side to_pandas() would diverge from DuckDB's object
                # columns on a strict dtype compare
                "supp_nation": out["s_nat"].map(name_of).astype(object),
                "cust_nation": out["c_nat"].map(name_of).astype(object),
                "l_year": out["year"].astype("int64"),
                "revenue": round_np(out["rev"] / 10000.0, 2),
            }
        )

    out = folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
    return schema_safe(out, pa.schema(
        [("supp_nation", pa.string()), ("cust_nation", pa.string()),
         ("l_year", pa.int64()), ("revenue", pa.float64())]
    ))


def nation_trade_flows_sql(nat_a: str = "NATION_12", nat_b: str = "NATION_11") -> str:
    return f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,
       ROUND(SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100))
             / 10000.0, 2) AS revenue
FROM lineitem
JOIN supplier  ON l_suppkey = s_suppkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = '{nat_a}' AND cn.n_name = '{nat_b}')
    OR (sn.n_name = '{nat_b}' AND cn.n_name = '{nat_a}'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share — the same two-exchange plan as Q7
# but the per-year fold carries TWO exact integer accumulators (target
# revenue, total revenue) whose ratio is taken once at the finish


def nation_market_share(
    sf_dir: str,
    region: str = "AMERICA",
    target: str = "NATION_1",
    n_parts: int = 32,
    bloom_prefilter: bool | None = None,
) -> rd.Dataset:
    """Per order-year, the fraction of in-region customers' purchase revenue
    supplied by ``target`` (TPC-H Q8 shape). The share is a ratio of two
    exact 1e-4-unit integer sums, so the float64 division at the finish is
    the ONLY inexact step — identical to the oracle's arithmetic.

    - region ⋈ nation driver-side → in-region nation-key set;
    - supplier: FULL slim suppkey→nationkey broadcast (every lineitem needs
      its supplier classified target/other — no prefilter possible);
    - orders (date-window, carrying order-year) ⋈ customer (in-region
      filtered): ONE custkey exchange → (orderkey, year);
    - lineitem combiner folds per (orderkey, is_target) exact revenue,
      joins the (orderkey, year) stream in ONE orderkey exchange, emitting
      per-(year) [target, total] integer partials;
    - final fold is |years| × n_parts rows.
    """
    import pyarrow.parquet as pq_

    from crawler_ray.sources.io import read_parquet_sized

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1998-01-01")

    nat = pq_.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq_.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    in_region = set(
        nat.merge(
            reg[reg["r_name"] == region],
            left_on="n_regionkey",
            right_on="r_regionkey",
        )["n_nationkey"].astype(int)
    )
    tgt_rows = nat.loc[nat["n_name"] == target, "n_nationkey"]
    if tgt_rows.empty:  # empty corpus / unknown nation: typed empty share
        return rd.from_arrow(
            pa.table({"o_year": pa.array([], pa.int64()),
                      "mkt_share": pa.array([], pa.float64())})
        )
    target_key = int(tgt_rows.iloc[0])

    sup = (
        pq_.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        .to_pandas()
        .sort_values("s_suppkey")
    )
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            (sup["s_nationkey"].to_numpy(np.int64) == target_key),
        )
    )

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        target_rows_per_block=4096,
    )

    def c_rows(t: pa.Table) -> pa.Table:
        keep = np.isin(t["c_nationkey"].to_numpy(), list(in_region))
        t = t.filter(pa.array(keep))
        ck = t["c_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "year": pa.nulls(t.num_rows, pa.int64()),
                "is_cust": pa.array(np.ones(t.num_rows, bool), pa.bool_()),
            }
        )

    # bloom-prefilter the orders probe to in-region customers (the
    # nation_trade_flows rationale + the same measured crossover gate)
    if _want_bloom(bloom_prefilter, f"{sf_dir}/orders.parquet"):
        cust_f = cust.map_batches(c_rows, batch_format="pyarrow").materialize()
        cap = pq_.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
        bloom_ref = _bloom_ref_from_keys(cust_f, "key", cap=cap)
    else:
        cust_f = cust.map_batches(c_rows, batch_format="pyarrow")
        bloom_ref = None

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        target_rows_per_block=4096,
    )

    class ORows(_BloomGate):
        def __call__(self, t: pa.Table) -> pa.Table:
            d = t["o_orderdate"].to_numpy()
            t = t.filter(pa.array((d >= lo) & (d < hi)))
            t = self.keep(t)
            ck = t["o_custkey"].to_numpy()
            year = (
                t["o_orderdate"].to_numpy().astype("datetime64[Y]")
                .astype(np.int64) + 1970
            )
            return pa.table(
                {
                    "part": pa.array(
                        (ck % n_parts).astype(np.int64), pa.int64()
                    ),
                    "key": pa.array(ck, pa.int64()),
                    "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                    "year": pa.array(year, pa.int64()),
                    "is_cust": pa.nulls(t.num_rows, pa.bool_()),
                }
            )

    o_rows = ORows(bloom_ref, "o_custkey")

    def merge_custkey(g: pa.Table) -> pa.Table:
        is_c = pc.is_valid(g["is_cust"])
        cg = g.filter(is_c).select(["key"]).to_pandas()
        og = g.filter(pc.invert(is_c)).select(
            ["key", "o_orderkey", "year"]
        ).to_pandas()
        m = og.merge(cg, on="key", how="inner")
        ok = m["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array((ok % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ok, pa.int64()),
                "year": pa.array(m["year"].to_numpy(np.int64), pa.int64()),
                "rev_t": pa.nulls(len(m), pa.float64()),
                "rev_all": pa.nulls(len(m), pa.float64()),
            }
        )

    o_c = (
        orders.map_batches(o_rows, batch_format="pyarrow")
        .union(cust_f)
        .groupby("part")
        .map_groups(merge_custkey, batch_format="pyarrow")
    )

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        target_rows_per_block=4096,
    )

    class LiPartial:
        def __init__(self, ref):
            self.ref = ref
            self._keys = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._keys is None:
                self._keys, self._is_tgt = (
                    ray.get(self.ref)
                    if isinstance(self.ref, ray.ObjectRef)
                    else self.ref
                )
            sk = t["l_suppkey"].to_numpy()
            pos = np.searchsorted(self._keys, sk)
            pos = np.clip(pos, 0, max(len(self._keys) - 1, 0))
            # empty key list (no target-nation suppliers): every probe misses
            is_tgt = (
                self._is_tgt[pos] & (self._keys[pos] == sk)
                if len(self._keys)
                else np.zeros(len(sk), bool)
            )
            rev = np.round(t["l_extendedprice"].to_numpy() * 100.0) * np.round(
                (1.0 - t["l_discount"].to_numpy()) * 100.0
            )
            df = pd.DataFrame(
                {
                    "key": t["l_orderkey"].to_numpy(),
                    "rev_t": np.where(is_tgt, rev, 0.0),
                    "rev_all": rev,
                }
            )
            out = df.groupby("key", sort=False).sum().reset_index()
            key = out["key"].to_numpy(np.int64)
            return pa.table(
                {
                    "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                    "key": pa.array(key, pa.int64()),
                    "year": pa.nulls(len(out), pa.int64()),
                    "rev_t": pa.array(out["rev_t"].to_numpy(), pa.float64()),
                    "rev_all": pa.array(out["rev_all"].to_numpy(), pa.float64()),
                }
            )

    def merge_orderkey(g: pa.Table) -> pa.Table:
        is_li = pc.is_valid(g["rev_all"])
        lg = g.filter(is_li).select(["key", "rev_t", "rev_all"]).to_pandas()
        og = g.filter(pc.invert(is_li)).select(["key", "year"]).to_pandas()
        m = lg.merge(og, on="key", how="inner")
        out = (
            m.groupby("year", sort=False)[["rev_t", "rev_all"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    folded = (
        li.map_batches(LiPartial(sup_ref), batch_format="pyarrow")
        .union(o_c)
        .groupby("part")
        .map_groups(merge_orderkey, batch_format="pyarrow")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("year", sort=False)[["rev_t", "rev_all"]].sum().reset_index()
        out = out.sort_values("year", kind="mergesort")
        return pd.DataFrame(
            {
                "o_year": out["year"].astype("int64"),
                "mkt_share": round_np(out["rev_t"] / out["rev_all"], 6),
            }
        )

    out = folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
    return schema_safe(out, pa.schema(
        [("o_year", pa.int64()), ("mkt_share", pa.float64())]
    ))


def nation_market_share_sql(region: str = "AMERICA", target: str = "NATION_1") -> str:
    return f"""
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
       ROUND(
         SUM(CASE WHEN sn.n_name = '{target}'
                  THEN ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100)
                  ELSE 0 END)
         / SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100)),
         6) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders — a grouped HAVING over one fact that
# then re-joins the other fact and a broadcast dimension


def large_volume_customers(
    sf_dir: str, min_qty: int = 200, k: int = 100, n_parts: int = 32
) -> rd.Dataset:
    """Top-``k`` orders by total line-item quantity above ``min_qty``, with
    the customer's name (TPC-H Q18 shape). Quantities are integer-valued
    doubles (1..50), so per-block partial sums are exact.

    - lineitem: per-(block, orderkey) quantity partials (combiner) join
      orders in ONE orderkey union-exchange; the HAVING (> min_qty) fires
      in-task, so only qualifying orders (a tiny fraction) leave;
    - customer name attaches via a BROADCAST slim map (the qualifying set
      is small, shipping the dim beats a second exchange — and the dim is
      already bounded: one name per custkey);
    - deterministic top-k: (total_qty DESC, o_orderkey ASC), per-partition
      prefilter then one bounded driver fold.
    """
    import pyarrow.parquet as pq_

    from crawler_ray.sources.io import read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"],
        target_rows_per_block=4096,
    )

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": t["l_orderkey"].to_numpy(),
                "qty": t["l_quantity"].to_numpy(),
            }
        )
        out = df.groupby("key", sort=False)["qty"].sum().reset_index()
        key = out["key"].to_numpy(np.int64)
        return pa.table(
            {
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(key, pa.int64()),
                "qty": pa.array(out["qty"].to_numpy(), pa.float64()),
                "o_custkey": pa.nulls(len(out), pa.int64()),
                "o_orderdate": pa.nulls(len(out), pa.timestamp("us")),
                "o_totalprice": pa.nulls(len(out), pa.float64()),
            }
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        target_rows_per_block=4096,
    )

    def o_rows(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(key, pa.int64()),
                "qty": pa.nulls(t.num_rows, pa.float64()),
                "o_custkey": t["o_custkey"].cast(pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
            }
        )

    def merge_orderkey(g: pa.Table) -> pa.Table:
        is_li = pc.is_valid(g["qty"])
        lg = g.filter(is_li).select(["key", "qty"]).to_pandas()
        og = g.filter(pc.invert(is_li)).select(
            ["key", "o_custkey", "o_orderdate", "o_totalprice"]
        ).to_pandas()
        tot = lg.groupby("key", sort=False)["qty"].sum().reset_index()
        tot = tot[tot["qty"] > float(min_qty)]
        m = og.merge(tot, on="key", how="inner")
        # per-partition top-k prefilter
        m = m.sort_values(
            ["qty", "key"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(m, preserve_index=False)

    folded = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(o_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(merge_orderkey, batch_format="pyarrow")
    )

    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["qty", "key"], ascending=[False, True], kind="mergesort"
        ).head(k)
        m = df.merge(cust, left_on="o_custkey", right_on="c_custkey", how="left")
        return pd.DataFrame(
            {
                "c_name": m["c_name"],
                "c_custkey": m["o_custkey"].astype("int64"),
                "o_orderkey": m["key"].astype("int64"),
                "o_orderdate": m["o_orderdate"],
                "o_totalprice": m["o_totalprice"],
                "total_qty": m["qty"],
            }
        )

    return folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )


def large_volume_customers_sql(min_qty: int = 200, k: int = 100) -> str:
    return f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > {min_qty}
ORDER BY SUM(l_quantity) DESC, o_orderkey
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: the sole-late-supplier count — per-order set logic
# (EXISTS another supplier / NOT EXISTS another late supplier) resolved
# inside one orderkey partition


def waiting_supplier_counts(
    sf_dir: str, grace_days: int = 60, n_parts: int = 32
) -> rd.Dataset:
    """Per supplier, how many multi-supplier orders this supplier alone
    shipped late (last ship > order date + ``grace_days``) — the TPC-H Q21
    shape with the reference schema's dates (no commit/receipt columns;
    lateness is vs the order date, same semantics class).

    The Q21 double-correlation (EXISTS a second supplier, NOT EXISTS a
    second LATE supplier) is per-order set logic, so ONE orderkey exchange
    resolves it: lineitem pre-folds per (block, orderkey, suppkey) max-ship
    partials, orders contribute (orderkey, orderdate), and the in-task fold
    re-maxes per (orderkey, suppkey), flags lateness, and keeps orders with
    ≥ 2 suppliers of which EXACTLY ONE is late — emitting that supplier.
    The final fold is one count row per supplier, named via the broadcast
    100-row supplier dim."""
    import pyarrow.parquet as pq_

    from crawler_ray.sources.io import read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        target_rows_per_block=4096,
    )

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": t["l_orderkey"].to_numpy(),
                "supp": t["l_suppkey"].to_numpy(),
                # microsecond resolution — same boundary-day reasoning as
                # late_ship_priority_counts (the oracle compares TIMESTAMPS)
                "ship": t["l_shipdate"].to_numpy()
                .astype("datetime64[us]")
                .astype(np.int64),
            }
        )
        out = (
            df.groupby(["key", "supp"], sort=False)["ship"].max().reset_index()
        )
        key = out["key"].to_numpy(np.int64)
        return pa.table(
            {
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(key, pa.int64()),
                "supp": pa.array(out["supp"].to_numpy(np.int64), pa.int64()),
                "ship": pa.array(out["ship"].to_numpy(np.int64), pa.int64()),
                "odate": pa.nulls(len(out), pa.int64()),
            }
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        target_rows_per_block=4096,
    )

    def o_rows(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy()
        od = t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(key, pa.int64()),
                "supp": pa.nulls(t.num_rows, pa.int64()),
                "ship": pa.nulls(t.num_rows, pa.int64()),
                "odate": pa.array(od, pa.int64()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        is_li = df["odate"].isna()
        ps = (
            df[is_li]
            .groupby(["key", "supp"], sort=False)["ship"]
            .max()
            .reset_index()
        )
        od = df[~is_li][["key", "odate"]]
        m = ps.merge(od, on="key", how="inner")
        m["late"] = (
            m["ship"] > m["odate"] + np.int64(grace_days) * 86_400_000_000
        )
        grp = m.groupby("key", sort=False)["late"].agg(["size", "sum"])
        keep_orders = grp[(grp["size"] >= 2) & (grp["sum"] == 1)].index
        culprit = m[m["late"] & m["key"].isin(keep_orders)]
        out = culprit.groupby("supp", sort=False).size().rename("n_p").reset_index()
        return pa.table(
            {
                "supp": pa.array(out["supp"].to_numpy(np.int64), pa.int64()),
                "n_p": pa.array(out["n_p"].to_numpy(np.int64), pa.int64()),
            }
        )

    agg = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(o_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("supp")
        .aggregate(Sum("n_p", alias_name="numwait"))
    )

    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(sup, left_on="supp", right_on="s_suppkey", how="left")
        m = m.sort_values(
            ["numwait", "s_name"], ascending=[False, True], kind="mergesort"
        )
        return pd.DataFrame(
            {"s_name": m["s_name"], "numwait": m["numwait"].astype("int64")}
        )

    return agg.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )


def waiting_supplier_counts_sql(grace_days: int = 60) -> str:
    return f"""
WITH per_supp AS (
    SELECT l_orderkey, l_suppkey,
           MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL {grace_days} DAY
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
),
flagged AS (
    SELECT l_orderkey FROM per_supp
    GROUP BY 1 HAVING COUNT(*) >= 2 AND SUM(late) = 1
)
SELECT s_name, COUNT(*)::BIGINT AS numwait
FROM per_supp
JOIN flagged USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: dormant high-balance customers — a global scalar
# aggregate feeding an anti-join, folded per nation


def dormant_customer_balance(
    sf_dir: str, cutoff: str = "2000-01-01", n_parts: int = 32
) -> rd.Dataset:
    """Per nation, the count and total balance of customers whose account
    balance is above the average POSITIVE balance and who placed NO order
    since ``cutoff`` (TPC-H Q22 shape; the phone-prefix country code is the
    nation key here, and "never ordered" becomes "dormant since cutoff" —
    this corpus has no order-less customers).

    - pass A (tiny): exact global (sum_cents, count) of positive balances
      via per-block integer partials — the Q22 scalar subquery;
    - the threshold test is EXACT integer cross-multiply
      (bal_cents × n_pos > sum_cents), no float division;
    - ONE custkey exchange: qualifying customers ∪ per-block DISTINCT
      custkeys of post-cutoff orders (combiner) → in-task anti join →
      per-nation (count, balance_cents) partials;
    - final fold is |nations| × n_parts rows, named via broadcast nation.
    """
    import pyarrow.parquet as pq_

    from crawler_ray.sources.io import read_parquet_sized

    cut = np.datetime64(cutoff)

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
        target_rows_per_block=4096,
    )

    # pass A: exact scalar stats of positive balances (bounded driver fold:
    # one row per block)
    def pos_partial(t: pa.Table) -> pa.Table:
        cents = np.round(t["c_acctbal"].to_numpy() * 100.0)
        pos = cents > 0
        return pa.table(
            {
                "s": pa.array([float(cents[pos].sum())], pa.float64()),
                "n": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    stats = cust.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
    if stats.empty:  # empty corpus: Ray drops the fold's schema entirely
        sum_cents, n_pos = 0.0, 0
    else:
        sum_cents, n_pos = float(stats["s"].sum()), int(stats["n"].sum())

    def c_rows(t: pa.Table) -> pa.Table:
        cents = np.round(t["c_acctbal"].to_numpy() * 100.0)
        keep = cents * float(n_pos) > sum_cents  # bal > avg, exactly
        t = t.filter(pa.array(keep))
        ck = t["c_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "nat": t["c_nationkey"].cast(pa.int64()),
                "cents": pa.array(cents[keep], pa.float64()),
            }
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        target_rows_per_block=4096,
    )

    def o_rows(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        t = t.filter(pa.array(d >= cut))
        ck = np.unique(t["o_custkey"].to_numpy())  # per-block distinct
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "nat": pa.nulls(len(ck), pa.int64()),
                "cents": pa.nulls(len(ck), pa.float64()),
            }
        )

    def anti_fold(g: pa.Table) -> pa.Table:
        is_c = pc.is_valid(g["nat"])
        cg = g.filter(is_c).select(["key", "nat", "cents"]).to_pandas()
        active = g.filter(pc.invert(is_c))["key"].to_numpy()
        keep = cg[~cg["key"].isin(pd.unique(active))]
        out = (
            keep.groupby("nat", sort=False)["cents"]
            .agg(["size", "sum"])
            .reset_index()
        )
        return pa.table(
            {
                "nat": pa.array(out["nat"].to_numpy(np.int64), pa.int64()),
                "n_p": pa.array(out["size"].to_numpy(np.int64), pa.int64()),
                "cents_p": pa.array(out["sum"].to_numpy(), pa.float64()),
            }
        )

    folded = (
        cust.map_batches(c_rows, batch_format="pyarrow")
        .union(orders.map_batches(o_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(anti_fold, batch_format="pyarrow")
    )

    nat = pq_.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("nat", sort=False)[["n_p", "cents_p"]].sum().reset_index()
        )
        out = out.sort_values("nat", kind="mergesort")
        return pd.DataFrame(
            {
                "n_name": out["nat"].map(name_of),
                "numcust": out["n_p"].astype("int64"),
                "totacctbal": round_np(out["cents_p"] / 100.0, 2),
            }
        )

    return folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )


def dormant_customer_balance_sql(cutoff: str = "2000-01-01") -> str:
    return f"""
WITH st AS (
    SELECT SUM(ROUND(c_acctbal * 100)) AS s, COUNT(*)::DOUBLE AS n
    FROM customer WHERE ROUND(c_acctbal * 100) > 0
)
SELECT n_name, COUNT(*)::BIGINT AS numcust,
       ROUND(SUM(ROUND(c_acctbal * 100)) / 100.0, 2) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey, st
WHERE ROUND(c_acctbal * 100) * st.n > st.s
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '{cutoff}'
  )
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# skew handling: hot-key detection + salted partitioned hash join — the
# documented "salt hot keys" knob of ``partitioned_hash_join``, made real


def detect_hot_keys(
    ds: rd.Dataset,
    key: str,
    n_buckets: int = 32,
    hot_factor: float = 4.0,
    topk_per_block: int = 16,
) -> np.ndarray:
    """Find join keys hot enough to skew a ``% n_buckets`` exchange: keys
    whose global row count exceeds ``hot_factor ×`` the average bucket
    load. ONE pass: each block emits its top-``topk_per_block`` key counts
    plus its row count (bounded combiner rows), the driver folds that
    small table. Per-block top-k makes the fold an UNDER-estimate of a
    key's true count — a key spread thinly across blocks can evade
    detection — but a key big enough to hurt one bucket is by construction
    concentrated enough to surface in block top-ks."""
    def partial(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy()
        vals, counts = np.unique(k, return_counts=True)
        top = np.argsort(counts)[::-1][:topk_per_block]
        return pa.table(
            {
                "k": pa.array(vals[top], pa.int64()),
                "c": pa.array(counts[top].astype(np.int64), pa.int64()),
                "n_rows": pa.array(
                    [len(k)] + [0] * (len(top) - 1) if len(top) else [],
                    pa.int64(),
                ),
            }
        )

    df = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if df.empty:
        return np.empty(0, np.int64)
    total = int(df["n_rows"].sum())
    cnt = df.groupby("k", sort=False)["c"].sum()
    threshold = hot_factor * total / n_buckets
    return np.sort(cnt.index.to_numpy(np.int64)[cnt.to_numpy() > threshold])


def salted_partitioned_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    n_buckets: int = 32,
    n_salts: int = 8,
    hot_keys: np.ndarray | None = None,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """``partitioned_hash_join`` with hot-key salting: rows of a HOT key
    on the (large) left side spread round-robin across ``n_salts``
    dedicated buckets, and the right side's rows for that key REPLICATE
    into all of them — so one hot key's merge work parallelizes ``n_salts``
    ways instead of serializing in a single bucket. Cold keys take the
    normal ``key % n_buckets`` route; output row SET is identical to the
    unsalted join (each left row still meets each matching right row
    exactly once).

    ``hot_keys=None`` auto-detects on the left with ``detect_hot_keys``.
    ``how`` is limited to ``inner``/``left``: replication would duplicate
    unmatched RIGHT rows under right/full-outer semantics."""
    if how not in ("inner", "left"):
        raise ValueError("salted join supports how='inner'|'left' only")
    if hot_keys is None:
        hot_keys = detect_hot_keys(left, on, n_buckets=n_buckets)
    hot_keys = np.sort(np.asarray(hot_keys, np.int64))
    if len(hot_keys) == 0:
        return partitioned_hash_join(
            left, right, on,
            n_buckets=n_buckets, how=how,
            left_schema=left_schema, right_schema=right_schema,
        )

    def _fields(ds: rd.Dataset, given) -> list[tuple[str, pa.DataType]]:
        if given is not None:
            return [(f.name, f.type) for f in given]
        sch = ds.schema()
        out = []
        for name, typ in zip(sch.names, sch.types):
            if not isinstance(typ, pa.DataType):
                typ = pa.from_numpy_dtype(np.dtype(typ))
            out.append((name, typ))
        return out

    lf, rf = _fields(left, left_schema), _fields(right, right_schema)
    lcols = [n for n, _ in lf]
    rcols = [n for n, _ in rf]
    l_extra = [(n, t) for n, t in rf if n not in lcols]
    r_extra = [(n, t) for n, t in lf if n not in rcols]
    out_schema = pa.schema(lf + [(n, t) for n, t in rf if n != on])

    def hot_idx(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(hot_keys, keys)
        pos = np.clip(pos, 0, len(hot_keys) - 1)
        return hot_keys[pos] == keys, pos

    def tag_left(t: pa.Table) -> pa.Table:
        for name, typ in l_extra:
            t = t.append_column(name, pa.nulls(t.num_rows, typ))
        keys = t[on].to_numpy()
        is_hot, idx = hot_idx(keys)
        # cold: key % n_buckets; hot: dedicated bucket range, rows spread
        # round-robin by in-block position (placement only — never affects
        # the output row set)
        salt = np.arange(len(keys), dtype=np.int64) % n_salts
        bucket = np.where(
            is_hot,
            n_buckets + idx * n_salts + salt,
            keys % n_buckets,
        ).astype(np.int64)
        t = t.append_column("_bucket", pa.array(bucket, pa.int64()))
        t = t.append_column("_side", pa.array(["L"] * t.num_rows, pa.string()))
        return t.select(sorted(t.column_names))

    def tag_right(t: pa.Table) -> pa.Table:
        for name, typ in r_extra:
            t = t.append_column(name, pa.nulls(t.num_rows, typ))
        keys = t[on].to_numpy()
        is_hot, idx = hot_idx(keys)
        cold = t.filter(pa.array(~is_hot))
        cold_bucket = (cold[on].to_numpy() % n_buckets).astype(np.int64)
        cold = cold.append_column("_bucket", pa.array(cold_bucket, pa.int64()))
        hot = t.filter(pa.array(is_hot))
        hot_i = idx[is_hot]
        # replicate each hot right row into all n_salts sub-buckets
        rep_idx = np.repeat(np.arange(hot.num_rows), n_salts)
        hot = hot.take(pa.array(rep_idx, pa.int64()))
        rep_bucket = (
            n_buckets
            + np.repeat(hot_i, n_salts) * n_salts
            + np.tile(np.arange(n_salts, dtype=np.int64), len(hot_i))
        )
        hot = hot.append_column("_bucket", pa.array(rep_bucket, pa.int64()))
        both = pa.concat_tables([cold, hot])
        both = both.append_column(
            "_side", pa.array(["R"] * both.num_rows, pa.string())
        )
        return both.select(sorted(both.column_names))

    def merge(g: pa.Table) -> pa.Table:
        side = g["_side"]
        lg = g.filter(pc.equal(side, "L")).select(lcols).to_pandas()
        rg = g.filter(pc.equal(side, "R")).select(rcols).to_pandas()
        if how == "inner" and (lg.empty or rg.empty):
            df = pd.DataFrame(columns=[f.name for f in out_schema])
        else:
            df = lg.merge(rg, on=on, how=how)[[f.name for f in out_schema]]
        return pa.Table.from_pandas(df, schema=out_schema, preserve_index=False)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    return tagged.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority top-k — segment-filtered customer gate,
# unshipped-revenue fold per order


def shipping_priority_orders(
    sf_dir: str,
    segment: str = "BUILDING",
    date: str = "1997-01-01",
    k: int = 10,
    n_parts: int = 32,
    bloom_prefilter: bool | None = None,
) -> rd.Dataset:
    """Top-``k`` orders by outstanding revenue: customer in ``segment``,
    order placed BEFORE ``date``, line items shipping AFTER it (TPC-H Q3;
    the reference schema has no o_shippriority, so o_orderpriority is
    reported instead). Two exchanges: segment-filtered customers join
    date-filtered orders on custkey, the (orderkey, odate, opriority)
    stream joins post-date lineitem revenue combiners on orderkey;
    deterministic top-k = (revenue DESC, orderkey ASC) over exact
    integers, per-partition prefilter then one bounded driver fold."""
    from crawler_ray.sources.io import read_parquet_sized

    cut = np.datetime64(date)

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        target_rows_per_block=4096,
    )

    def c_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], segment))
        ck = t["c_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
                "priority": pa.nulls(t.num_rows, pa.string()),
            }
        )

    # bloom-prefilter the orders probe to the segment's customers
    # (same measured crossover gate as nation_trade_flows)
    import pyarrow.parquet as pq_

    if _want_bloom(bloom_prefilter, f"{sf_dir}/orders.parquet"):
        cust_f = cust.map_batches(c_rows, batch_format="pyarrow").materialize()
        cap = pq_.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
        bloom_ref = _bloom_ref_from_keys(cust_f, "key", cap=cap)
    else:
        cust_f = cust.map_batches(c_rows, batch_format="pyarrow")
        bloom_ref = None

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        target_rows_per_block=4096,
    )

    class ORows(_BloomGate):
        def __call__(self, t: pa.Table) -> pa.Table:
            d = t["o_orderdate"].to_numpy()
            t = t.filter(pa.array(d < cut))
            t = self.keep(t)
            ck = t["o_custkey"].to_numpy()
            return pa.table(
                {
                    "part": pa.array(
                        (ck % n_parts).astype(np.int64), pa.int64()
                    ),
                    "key": pa.array(ck, pa.int64()),
                    "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                    "o_orderdate": t["o_orderdate"],
                    "priority": t["o_orderpriority"],
                }
            )

    o_rows = ORows(bloom_ref, "o_custkey")

    def merge_custkey(g: pa.Table) -> pa.Table:
        is_c = pc.is_valid(g["o_orderkey"])
        og = g.filter(is_c).select(
            ["key", "o_orderkey", "o_orderdate", "priority"]
        ).to_pandas()
        cg = g.filter(pc.invert(is_c)).select(["key"]).to_pandas()
        m = og.merge(cg, on="key", how="inner")
        ok = m["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array((ok % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ok, pa.int64()),
                "o_orderdate": pa.array(m["o_orderdate"], pa.timestamp("us")),
                "priority": pa.array(m["priority"], pa.string()),
                "rev": pa.nulls(len(m), pa.float64()),
            }
        )

    o_c = (
        cust_f.union(orders.map_batches(o_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(merge_custkey, batch_format="pyarrow")
    )

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        target_rows_per_block=4096,
    )

    def li_partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].to_numpy()
        t = t.filter(pa.array(d > cut))
        rev = np.round(t["l_extendedprice"].to_numpy() * 100.0) * np.round(
            (1.0 - t["l_discount"].to_numpy()) * 100.0
        )
        df = pd.DataFrame({"key": t["l_orderkey"].to_numpy(), "rev": rev})
        out = df.groupby("key", sort=False)["rev"].sum().reset_index()
        key = out["key"].to_numpy(np.int64)
        return pa.table(
            {
                "part": pa.array((key % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(key, pa.int64()),
                "o_orderdate": pa.nulls(len(out), pa.timestamp("us")),
                "priority": pa.nulls(len(out), pa.string()),
                "rev": pa.array(out["rev"].to_numpy(), pa.float64()),
            }
        )

    def merge_orderkey(g: pa.Table) -> pa.Table:
        is_li = pc.is_valid(g["rev"])
        lg = g.filter(is_li).select(["key", "rev"]).to_pandas()
        og = g.filter(pc.invert(is_li)).select(
            ["key", "o_orderdate", "priority"]
        ).to_pandas()
        agg = lg.groupby("key", sort=False)["rev"].sum().reset_index()
        m = og.merge(agg, on="key", how="inner")
        m = m.sort_values(
            ["rev", "key"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(m, preserve_index=False)

    folded = (
        o_c.union(li.map_batches(li_partial, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(merge_orderkey, batch_format="pyarrow")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["rev", "key"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                "l_orderkey": df["key"].astype("int64"),
                "revenue": round_np(df["rev"] / 10000.0, 2),
                "o_orderdate": df["o_orderdate"],
                "o_orderpriority": df["priority"],
            }
        )

    out = folded.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
    return schema_safe(out, pa.schema(
        [("l_orderkey", pa.int64()), ("revenue", pa.float64()),
         ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())]
    ))


def shipping_priority_orders_sql(
    segment: str = "BUILDING", date: str = "1997-01-01", k: int = 10
) -> str:
    return f"""
SELECT l_orderkey,
       ROUND(SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100))
             / 10000.0, 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{date}'
  AND l_shipdate  > TIMESTAMP '{date}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100))
         DESC, l_orderkey
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution — a two-level aggregate
# where the SECOND groupby key is the FIRST aggregate's value


def order_count_distribution(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """How many customers placed exactly N orders, for every N including 0
    (TPC-H Q13). One custkey exchange: per-block per-custkey order-count
    combiners ∪ bare customer keys; each partition zero-fills its
    customers and emits a per-count distribution PARTIAL, so the second
    aggregate's exchange is |distinct counts| × n_parts rows."""
    from crawler_ray.sources.io import read_parquet_sized

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        target_rows_per_block=4096,
    )

    def c_rows(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "n_p": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        target_rows_per_block=4096,
    )

    def o_partial(t: pa.Table) -> pa.Table:
        ck, cnt = np.unique(t["o_custkey"].to_numpy(), return_counts=True)
        return pa.table(
            {
                "part": pa.array((ck % n_parts).astype(np.int64), pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        is_c = df["n_p"].isna()
        per_cust = (
            df[~is_c].groupby("key", sort=False)["n_p"].sum()
        )
        all_keys = df[is_c]["key"]
        counts = per_cust.reindex(all_keys, fill_value=0).astype(np.int64)
        dist = counts.value_counts()
        return pa.table(
            {
                "c_count": pa.array(dist.index.to_numpy(np.int64), pa.int64()),
                "d_p": pa.array(dist.to_numpy(np.int64), pa.int64()),
            }
        )

    agg = (
        cust.map_batches(c_rows, batch_format="pyarrow")
        .union(orders.map_batches(o_partial, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("d_p", alias_name="custdist"))
    )
    return agg.map_batches(
        lambda df: pd.DataFrame(
            {
                "c_count": df["c_count"].astype("int64"),
                "custdist": df["custdist"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


ORDER_COUNT_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*)::BIGINT AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) t
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by windowed revenue — aggregate + global
# argmax KEEPING TIES (exact integers make the tie test trustworthy)


def top_revenue_suppliers(
    sf_dir: str, lo: str = "1996-01-01", hi: str = "1996-04-01"
) -> rd.Dataset:
    """Every supplier achieving the MAXIMUM revenue over the ship-date
    window (TPC-H Q15 — the view + WHERE total = MAX(total) shape; exact
    integer revenue makes tie detection deterministic where float sums
    would flap). Per-block (suppkey, rev) combiners → one slim suppkey
    fold (supplier-cardinality exchange) → bounded driver argmax-with-ties
    + broadcast name attach."""
    import pyarrow.parquet as pq_

    from crawler_ray.sources.io import read_parquet_sized

    d_lo, d_hi = np.datetime64(lo), np.datetime64(hi)

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        target_rows_per_block=4096,
    )

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].to_numpy()
        t = t.filter(pa.array((d >= d_lo) & (d < d_hi)))
        rev = np.round(t["l_extendedprice"].to_numpy() * 100.0) * np.round(
            (1.0 - t["l_discount"].to_numpy()) * 100.0
        )
        df = pd.DataFrame({"supp": t["l_suppkey"].to_numpy(), "rev": rev})
        out = df.groupby("supp", sort=False)["rev"].sum().reset_index()
        return pa.table(
            {
                "supp": pa.array(out["supp"].to_numpy(np.int64), pa.int64()),
                "rev": pa.array(out["rev"].to_numpy(), pa.float64()),
            }
        )

    agg = li.map_batches(partial, batch_format="pyarrow").groupby(
        "supp"
    ).aggregate(Sum("rev", alias_name="total"))

    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        best = df["total"].max()
        top = df[df["total"] == best].copy()  # exact ints: safe tie test
        m = top.merge(sup, left_on="supp", right_on="s_suppkey", how="left")
        m = m.sort_values("s_suppkey", kind="mergesort")
        return pd.DataFrame(
            {
                "s_suppkey": m["s_suppkey"].astype("int64"),
                "s_name": m["s_name"],
                "total_revenue": round_np(m["total"] / 10000.0, 2),
            }
        )

    out = agg.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
    return schema_safe(out, pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()),
         ("total_revenue", pa.float64())]
    ))


def top_revenue_suppliers_sql(lo: str = "1996-01-01", hi: str = "1996-04-01") -> str:
    return f"""
WITH rev AS (
    SELECT l_suppkey,
           SUM(ROUND(l_extendedprice * 100) * ROUND((1 - l_discount) * 100))
               AS total
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{lo}' AND l_shipdate < TIMESTAMP '{hi}'
    GROUP BY 1
)
SELECT s_suppkey, s_name, ROUND(total / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total = (SELECT MAX(total) FROM rev)
"""
