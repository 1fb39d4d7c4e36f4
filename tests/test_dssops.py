"""Batch-28 semantic invariants beyond oracle frame-equality: Q13 buckets
partition the customer set exactly; Q17's qualifying rows replay under a
brute-force per-part threshold; Q18's output is the true top of the
qualifying set with correct per-order sums; Q22's survivors all beat the
positive-balance average and have < 5 orders."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.dssops import (
    _Q22_MAX_ORDERS,
    custdist_q13,
    large_order_customers_q18,
    low_engagement_q22,
    small_lot_revenue_q17,
)

SF = "/root/testdata/sf0.001"


def _c(x):
    return np.floor(np.asarray(x) * 100 + 0.5).astype(np.int64)


@pytest.mark.usefixtures("ray_session")
def test_q13_buckets_partition_customers():
    out = custdist_q13(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    assert int(out["custdist"].sum()) == len(cust)
    assert int((out["c_count"] * out["custdist"]).sum()) == len(orders)
    vc = orders.groupby("o_custkey").size().value_counts()
    got = out.set_index("c_count")["custdist"]
    for c_count, n in vc.items():
        assert int(got.loc[c_count]) == int(n)


@pytest.mark.usefixtures("ray_session")
def test_q17_replays_per_part_threshold():
    out = small_lot_revenue_q17(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    brand = part["p_brand"].min()
    assert out["brand"].iloc[0] == brand
    keys = set(part.loc[part["p_brand"] == brand, "p_partkey"])
    sub = li[li["l_partkey"].isin(keys)].copy()
    sub["qc"] = _c(sub["l_quantity"])
    sub["pc"] = _c(sub["l_extendedprice"])
    n_q, cents = 0, 0
    for _, g in sub.groupby("l_partkey"):
        sq, np_ = int(g["qc"].sum()), len(g)
        m = 5 * g["qc"] * np_ < sq
        n_q += int(m.sum())
        cents += int(g["pc"][m].sum())
    assert int(out["n_qualifying"].iloc[0]) == n_q
    assert int(out["avg_yearly_cents"].iloc[0]) == cents // 7


@pytest.mark.usefixtures("ray_session")
def test_q18_top_is_true_top_of_qualifying_set():
    out = large_order_customers_q18(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    po = li.assign(qc=_c(li["l_quantity"])).groupby("l_orderkey")["qc"].sum()
    tot, n = int(po.sum()), len(po)
    qual = po[po * n > 2 * tot]
    merged = orders[orders["o_orderkey"].isin(qual.index)].copy()
    merged["total_cents"] = _c(merged["o_totalprice"])
    want = merged.sort_values(["total_cents", "o_orderkey"],
                              ascending=[False, True]).head(100)
    assert list(out["o_orderkey"]) == list(want["o_orderkey"])
    for _, r in out.iterrows():
        assert int(r["sum_qty_c"]) == int(qual.loc[r["o_orderkey"]])
        # every reported order beats twice the average order quantity
        assert int(r["sum_qty_c"]) * n > 2 * tot


@pytest.mark.usefixtures("ray_session")
def test_q22_survivors_beat_average_and_are_low_engagement():
    out = low_engagement_q22(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cust["bc"] = _c(cust["c_acctbal"])
    pos = cust[cust["bc"] > 0]
    s_pos, n_pos = int(pos["bc"].sum()), len(pos)
    oc = orders.groupby("o_custkey").size()
    cust["n_ord"] = cust["c_custkey"].map(oc).fillna(0).astype("int64")
    surv = cust[(cust["n_ord"] < _Q22_MAX_ORDERS)
                & (cust["bc"] * n_pos > s_pos)]
    want = surv.groupby("c_nationkey").agg(
        n_cust=("bc", "size"), bal_cents=("bc", "sum")).reset_index()
    assert int(out["n_cust"].sum()) == len(surv)
    got = out.set_index("c_nationkey")
    for _, r in want.iterrows():
        assert int(got.loc[r["c_nationkey"], "n_cust"]) == int(r["n_cust"])
        assert int(got.loc[r["c_nationkey"], "bal_cents"]) == \
            int(r["bal_cents"])
