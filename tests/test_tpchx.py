"""Batch-65 semantic invariants beyond oracle frame-equality: a planted
micro-TPC-H fixture with hand-computable revenue/profit checks the join
paths, the floor-cents quantization, the top-k tie-break, and the post-limit
dim attach."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.tpchx import (
    q3_shipping_priority,
    q9_profit_by_nation_year,
    q10_returned_items,
)

SF = "/root/testdata/sf0.001"


def _ts(s):
    return np.datetime64(s, "us")


def _plant(tmp_path):
    """2 customers (one BUILDING), 3 orders, 4 lines, 2 parts (one 'red'),
    1 supplier, 1 nation — every output value hand-computable."""
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["alice", "bob"]),
        "c_nationkey": pa.array([0, 0], pa.int64()),
        "c_acctbal": pa.array([10.555, 20.0], pa.float64()),
        "c_mktsegment": pa.array(["BUILDING", "MACHINERY"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 200, 300], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 3),
        "o_totalprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
        # orders 100/200 qualify for Q3's date cut; 300 is the other segment
        "o_orderdate": pa.array([_ts("1997-06-01"), _ts("1997-07-01"),
                                 _ts("1997-08-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 100, 200, 300], pa.int64()),
        "l_partkey": pa.array([7, 8, 7, 7], pa.int64()),
        "l_suppkey": pa.array([5, 5, 5, 5], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
        "l_quantity": pa.array([2.0, 3.0, 1.0, 4.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.005, 30.0, 40.0], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.5, 0.25], pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["R", "N", "R", "R"]),
        "l_linestatus": pa.array(["O"] * 4),
        # all after Q3's cut; first three inside Q10's 1999-H1 window
        "l_shipdate": pa.array([_ts("1999-02-01"), _ts("1999-03-01"),
                                _ts("1999-04-01"), _ts("2000-01-01")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([7, 8], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"]),
        "p_brand": pa.array(["B1", "B2"]),
        "p_type": pa.array(["ECONOMY", "PROMO"]),
        "p_size": pa.array([1, 2], pa.int64()),
        "p_retailprice": pa.array([3.005, 9.99], pa.float64()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([5], pa.int64()),
        "s_name": pa.array(["sup5"]),
        "s_nationkey": pa.array([0], pa.int64()),
        "s_acctbal": pa.array([0.0], pa.float64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["WONDERLAND"]),
        "n_regionkey": pa.array([0], pa.int64()),
    }), str(tmp_path / "nation.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_q3_planted(tmp_path):
    _plant(tmp_path)
    out = q3_shipping_priority(str(tmp_path)).to_pandas()
    # only customer 1 is BUILDING; orders 100, 200 both before the cut
    # order 100 revenue: floor(10*0.9*100+.5)=900 + floor(20.005*100+.5)=2001
    # order 200 revenue: floor(30*0.5*100+.5)=1500
    assert out["l_orderkey"].tolist() == [100, 200]
    assert out["revenue_cents"].tolist() == [2901, 1500]
    assert out["o_orderpriority"].tolist() == ["1-URGENT", "2-HIGH"]


@pytest.mark.usefixtures("ray_session")
def test_q10_planted(tmp_path):
    _plant(tmp_path)
    out = q10_returned_items(str(tmp_path)).to_pandas()
    # R-flag lines in 1999-H1: line1 (order 100) + line3 (order 200), BOTH
    # customer 1 (900 + 1500); line4 (cust 2) ships 2000 — out of window
    assert out["custkey"].tolist() == [1]
    assert out["revenue_cents"].tolist() == [2400]
    assert out["c_name"].tolist() == ["alice"]
    assert out["n_name"].unique().tolist() == ["WONDERLAND"]
    # acctbal floor-cents: 10.555 -> 1056 (floor(1055.5+0.5))
    assert out["acctbal_cents"].tolist() == [1056]


@pytest.mark.usefixtures("ray_session")
def test_q9_planted(tmp_path):
    _plant(tmp_path)
    out = q9_profit_by_nation_year(str(tmp_path)).to_pandas()
    # 'red' part = partkey 7 only; retail cents floor(300.5+0.5)=301
    # 1999: line1 rev 900 - 301*2 = 298; line3 rev 1500 - 301*1 = 1199
    # 2000: line4 rev floor(40*0.75*100+.5)=3000 - 301*4 = 1796
    assert out["n_name"].unique().tolist() == ["WONDERLAND"]
    assert out[["yr", "profit_cents", "n_lines"]].values.tolist() == [
        [1999, 298 + 1199, 2], [2000, 1796, 1]]


@pytest.mark.usefixtures("ray_session")
def test_real_data_shapes():
    q3 = q3_shipping_priority(SF).to_pandas()
    assert len(q3) == 10
    assert (q3["revenue_cents"].diff().dropna() <= 0).all()  # desc order
    q10 = q10_returned_items(SF).to_pandas()
    assert len(q10) == 20
    assert (q10["revenue_cents"].diff().dropna() <= 0).all()
    q9 = q9_profit_by_nation_year(SF).to_pandas()
    # bounded domain: nations x ship-years
    assert q9.groupby(["n_name", "yr"]).size().max() == 1
