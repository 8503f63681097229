"""HLL sketch properties + the distributed distinct-count pipeline."""

import duckdb
import numpy as np
import pytest

from crawler_ray.functions.sketches import HyperLogLog
from tests.conftest import SF_DIR


def test_hll_accuracy_and_merge():
    h = HyperLogLog(p=12)
    h.add([f"user-{i}" for i in range(10_000)])
    est = h.estimate()
    assert abs(est - 10_000) / 10_000 < 0.05  # ~1.04/sqrt(4096) ≈ 1.6% σ

    # merge == union semantics
    a, b = HyperLogLog(p=12), HyperLogLog(p=12)
    a.add([f"x{i}" for i in range(5000)])
    b.add([f"x{i}" for i in range(2500, 7500)])  # overlap 2500
    a.merge(b)
    assert abs(a.estimate() - 7500) / 7500 < 0.05

    # serialization round-trip
    c = HyperLogLog.deserialize(a.serialize())
    assert c.estimate() == a.estimate()

    # deterministic regardless of insertion order
    d1, d2 = HyperLogLog(p=10), HyperLogLog(p=10)
    keys = [f"k{i}" for i in range(1000)]
    d1.add(keys)
    d2.add(list(reversed(keys)))
    assert np.array_equal(d1.registers, d2.registers)


def test_distinct_users_hll_pipeline(ray_session):
    from crawler_ray.pipelines.events import distinct_users_hll

    got = distinct_users_hll(SF_DIR).to_pandas().set_index("event_type")
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
        f"read_parquet('{SF_DIR}/events.parquet') GROUP BY event_type"
    ).df().set_index("event_type")
    assert set(got.index) == set(exact.index)
    for et in exact.index:
        e, g = exact.loc[et, "n"], got.loc[et, "approx_distinct_users"]
        assert abs(g - e) / max(e, 1) < 0.1


# ------------------------------------------------------------- MRLQuantile


def test_mrl_rank_error_and_weight():
    import numpy as np

    from crawler_ray.functions.sketches import MRLQuantile

    rng = np.random.Generator(np.random.PCG64(5))
    for dist in (rng.normal(size=50_000), rng.zipf(1.5, 50_000).astype(float)):
        xs = np.sort(dist)
        n = len(xs)
        s = MRLQuantile(256).add(dist)
        assert s.total_weight() == n  # exact weight conservation
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            est = s.quantile(q)
            # with heavy ties (zipf) the estimate covers a rank INTERVAL;
            # error is the distance from q*n to that interval
            lo = np.searchsorted(xs, est, side="left")
            hi = np.searchsorted(xs, est, side="right")
            err = max(lo / n - q, q - hi / n, 0)
            assert err < 0.02, (q, lo / n, hi / n)


def test_mrl_merge_matches_single_stream_bounds():
    import numpy as np

    from crawler_ray.functions.sketches import MRLQuantile

    rng = np.random.Generator(np.random.PCG64(6))
    x = rng.exponential(size=30_000)
    xs = np.sort(x)
    merged = MRLQuantile(256)
    for part in np.array_split(x, 17):  # batch-wise sketches, tree merge
        merged = merged.merge(MRLQuantile(256).add(part))
    assert merged.n == len(x) and merged.total_weight() == len(x)
    for q in (0.05, 0.5, 0.95):
        rank = np.searchsorted(xs, merged.quantile(q), side="right")
        assert abs(rank / len(x) - q) < 0.02


def test_mrl_serialize_roundtrip_and_determinism():
    import numpy as np

    from crawler_ray.functions.sketches import MRLQuantile

    rng = np.random.Generator(np.random.PCG64(7))
    x = rng.normal(size=10_000)
    a = MRLQuantile(128).add(x)
    b = MRLQuantile.deserialize(a.serialize())
    assert b.n == a.n and b.parity == a.parity
    assert all(np.array_equal(p, q) for p, q in zip(a.levels, b.levels))
    # deterministic: the same input stream always yields the same sketch
    c = MRLQuantile(128).add(x)
    assert all(np.array_equal(p, q) for p, q in zip(a.levels, c.levels))


def test_event_value_quantiles_accuracy(ray_session):
    import duckdb
    import numpy as np

    from crawler_ray.pipelines.events import event_value_quantiles

    sf = "/root/testdata/sf0.01"
    got = event_value_quantiles(sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    counts = con.sql(
        "SELECT event_type, COUNT(*) c FROM events GROUP BY 1"
    ).df().set_index("event_type")["c"]
    for _, r in got.iterrows():
        # rank of the estimate in the true distribution ≈ q
        rank = con.sql(
            f"SELECT COUNT(*) FROM events WHERE event_type = '{r.event_type}' "
            f"AND value <= {r.value_est}"
        ).fetchone()[0]
        n = counts[r.event_type]
        assert abs(rank / n - r.q) < 0.03, (r.event_type, r.q, rank / n)


def test_count_min_bounds_and_merge():
    """est >= true always; est <= true + eps*N on a Zipf stream; merging two
    sketches equals sketching the concatenated stream exactly."""
    import numpy as np

    from crawler_ray.functions.sketches import CountMin

    rng = np.random.default_rng(7)
    stream = (rng.zipf(1.5, size=20000) % 500).astype(str)
    width, depth = 2048, 4
    eps = np.e / width
    vals, true = np.unique(stream, return_counts=True)

    cm = CountMin(width, depth).add(stream)
    est = cm.estimate(vals)
    assert (est >= true).all()
    assert (est <= true + eps * len(stream)).all()

    a = CountMin(width, depth).add(stream[:9000])
    b = CountMin(width, depth).add(stream[9000:])
    merged = a.merge(b)
    assert (merged.table == cm.table).all()
    assert merged.n == cm.n

    # serialize roundtrip is exact
    rt = CountMin.deserialize(cm.serialize())
    assert (rt.table == cm.table).all() and rt.n == cm.n


def test_user_event_counts_cms_pipeline(ray_session):
    """Pipeline estimates obey the one-sided CMS bound vs exact counts."""
    import duckdb

    from crawler_ray.pipelines.events import user_event_counts_cms

    sf = "/root/testdata/sf0.001"
    out = user_event_counts_cms(sf).to_pandas()
    exact = duckdb.sql(
        f"SELECT CAST(user_id AS VARCHAR) u, COUNT(*) c "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
    ).df().set_index("u")["c"]
    n = int(exact.sum())
    eps = __import__("numpy").e / 4096
    for uid, est in zip(out["user_id"], out["approx_events"]):
        t = int(exact.loc[str(uid)])
        assert est >= t
        assert est <= t + eps * n
