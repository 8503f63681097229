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
