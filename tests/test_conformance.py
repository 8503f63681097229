"""Ray pipelines vs DuckDB oracles — mirrors the driver's correctness gate
(row count + column names + order-insensitive values) on sf0.001."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, oracle_con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    exp = _canon(oracle_con.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6, rtol=1e-9)


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    q = entry_mod.queries()[name]
    df = _to_pandas(q(SF_DIR))
    assert df is not None
    assert not any(c is None for c in df.columns)


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    df = _to_pandas(ds.limit(5)) if hasattr(ds, "limit") else _to_pandas(ds)
    assert set(df.columns) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}


def test_props_key_sum_escaped_quote_adversarial(ray_session, tmp_path):
    """Round-2 advice: a '"k": N' sequence hiding inside an ESCAPED-QUOTE
    string value of a flat JSON object must not fool the regex fast path —
    such rows route to the json.loads fallback and match the json_extract
    oracle."""
    import json as _json

    import duckdb as _duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.events import props_key_sum

    rows = [
        ("click", _json.dumps({"s": '"k": 5', "k": 7})),   # escaped quote trap
        ("click", _json.dumps({"k": 3})),                   # plain fast path
        ("view", _json.dumps({"a": 1, "k": 11, "b": 2})),   # later key
        ("view", '{"s": "\\"k\\": 99"}'),                    # trap, key absent -> 0
        ("view", None),                                      # null props -> 0
    ]
    t = pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "props": pa.array([r[1] for r in rows]),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = (
        props_key_sum(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = _duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.sql(
        "SELECT event_type, COALESCE(SUM(json_extract_string(props, '$.k')::BIGINT), 0)::BIGINT"
        " AS k_sum FROM events GROUP BY event_type ORDER BY event_type"
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_user_activity_streaks_planted(ray_session, tmp_path):
    """Gaps-and-islands semantics on a hand-built fixture: longest run
    wins, ties broken by EARLIEST start, single-day users count as a
    1-day streak."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.events import user_activity_streaks

    day = 86_400_000_000  # us
    rows = [
        # user 1: runs [d0..d2] (len 3) and [d10..d11] (len 2) -> (3, d0)
        (1, 0), (1, 1), (1, 2), (1, 10), (1, 11),
        # user 2: two len-2 runs -> earliest start wins: (2, d5)
        (2, 5), (2, 6), (2, 20), (2, 21),
        # user 3: single day (duplicate events same day collapse)
        (3, 7), (3, 7),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array(
            np.array([r[1] * day + 3600_000_000 for r in rows], "datetime64[us]")
        ),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        user_activity_streaks(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"user_id": [1, 2, 3], "best_streak": [3, 2, 1],
         "streak_start": [0, 5, 7]}
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_day_uid_pack_envelope_guard(ray_session, tmp_path):
    """A negative user_id (or pre-1970 ts) would borrow across the 32-bit
    boundary of the (day << 32 | uid) pack; the presence-fold verbs must
    refuse loudly instead of silently corrupting keys."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.events import daily_active_users

    t = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array(np.array([86_400_000_000, 86_400_000_000], "datetime64[us]")),
        "user_id": pa.array([1, -5], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="daily_active_users pack requires"):
        daily_active_users(str(tmp_path)).to_pandas()
