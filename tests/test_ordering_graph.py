"""Unit tests for the round-3 late additions: global order statistics
(NTILE), the CUBE/correlated-subquery relational verbs, the uniform
k-sample fold, and fixed-point PageRank — beyond the DuckDB conformance
rows, these assert the DISTRIBUTION-invariance properties the oracles
can't see (results independent of partition count / block structure)."""

import numpy as np
import pandas as pd

from crawler_ray.pipelines import clusters, relational, textops
from tests.conftest import SF_DIR


def test_ntile_sizes_follow_sql_standard(ray_session):
    out = relational.order_price_ntile(SF_DIR, n=7).to_pandas()
    sizes = out.groupby("tile").size().sort_index()
    total = len(out)
    q, rem = divmod(total, 7)
    expect = [q + 1] * rem + [q] * (7 - rem)
    assert sizes.tolist() == expect
    assert sorted(sizes.index) == list(range(1, 8))


def test_pagerank_partition_invariance(ray_session):
    a = (
        clusters.doc_link_pagerank(SF_DIR, n_parts=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        clusters.doc_link_pagerank(SF_DIR, n_parts=17)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # total mass is conserved up to integer-floor leakage: every node
    # contributes at most its full rank, and the damping sum is exact
    assert (a["rank_scaled"] > 0).all()


def test_pagerank_sink_gets_more_than_base(ray_session):
    # node (0*7+1)%N = 1 receives in-links; base-only rank is 150_000_000
    out = clusters.doc_link_pagerank(SF_DIR).to_pandas().set_index("doc_id")
    assert out["rank_scaled"].max() > 150_000_000


def test_above_avg_excludes_single_order_customers(ray_session):
    out = relational.orders_above_customer_avg(SF_DIR).to_pandas()
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    ).to_pandas()
    counts = orders.groupby("o_custkey").size()
    singles = set(counts[counts == 1].index)
    assert not set(out["o_custkey"]) & singles
    # strictly-above means no customer has ALL orders selected
    sel = out.groupby("o_custkey").size()
    assert (sel < counts.loc[sel.index]).all()


def test_revenue_cube_grouping_sets_consistent(ray_session):
    cube = relational.revenue_cube(SF_DIR)
    fine = cube[(cube.priority != "ALL") & (cube.status != "ALL")]
    total = cube[(cube.priority == "ALL") & (cube.status == "ALL")]
    assert len(total) == 1
    assert int(fine["n_orders"].sum()) == int(total["n_orders"].iloc[0])
    by_pri = cube[(cube.priority != "ALL") & (cube.status == "ALL")]
    assert np.isclose(by_pri["revenue"].sum(), total["revenue"].iloc[0])


def test_uniform_sample_is_prefix_of_shuffle_order(ray_session):
    k = 20
    samp = textops.uniform_sample_docs(SF_DIR, k=k)
    rank = textops.shuffled_export(SF_DIR, seed=7).to_pandas()
    expect = set(rank.nsmallest(k, "shuffle_rank")["doc_id"])
    assert set(samp["doc_id"]) == expect
    assert samp["sample_rank"].tolist() == list(range(1, k + 1))
