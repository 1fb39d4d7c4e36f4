"""Batch-83 planted invariants: Q6's boundary discounts (0.05/0.07
inclusive, 0.04/0.08 out), Q14's promo share arithmetic, Q16's exclusion
predicates + distinct counting, Q19's arm disjointness on a planted grid."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.tpchx2 import (
    q6_forecast_revenue,
    q14_promo_share,
    q16_parts_supplier_cnt,
    q19_disjunctive_revenue,
)


def _ts(s):
    return np.datetime64(s, "us")


def _tables(tmp_path, li_rows, part_rows):
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(len(li_rows)), pa.int64()),
        "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
        "l_linenumber": pa.array([1] * len(li_rows), pa.int32()),
        "l_quantity": pa.array([r[2] for r in li_rows], pa.float64()),
        "l_extendedprice": pa.array([r[3] for r in li_rows], pa.float64()),
        "l_discount": pa.array([r[4] for r in li_rows], pa.float64()),
        "l_tax": pa.array([0.0] * len(li_rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(li_rows)),
        "l_linestatus": pa.array(["O"] * len(li_rows)),
        "l_shipdate": pa.array([_ts(r[5]) for r in li_rows],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in part_rows], pa.int64()),
        "p_name": pa.array([r[1] for r in part_rows]),
        "p_brand": pa.array([r[2] for r in part_rows]),
        "p_type": pa.array([r[3] for r in part_rows]),
        "p_size": pa.array([r[4] for r in part_rows], pa.int64()),
        "p_retailprice": pa.array([1.0] * len(part_rows), pa.float64()),
    }), str(tmp_path / "part.parquet"))


PARTS = [
    (1, "a", "Brand#1", "PROMO", 3),
    (2, "b", "Brand#2", "ECONOMY", 8),
    (3, "c", "Brand#3", "PROMO", 12),
    (4, "d", "Brand#1", "STANDARD", 1),   # excluded by Q16's size rule
]


@pytest.mark.usefixtures("ray_session")
def test_q6_boundaries(tmp_path):
    _tables(tmp_path, [
        (1, 1, 10.0, 100.0, 0.05, "1996-06-01"),  # in (boundary low)
        (1, 1, 10.0, 100.0, 0.07, "1996-06-01"),  # in (boundary high)
        (1, 1, 10.0, 100.0, 0.04, "1996-06-01"),  # out: discount
        (1, 1, 24.0, 100.0, 0.06, "1996-06-01"),  # out: quantity
        (1, 1, 10.0, 100.0, 0.06, "1997-01-01"),  # out: date
    ], PARTS)
    out = q6_forecast_revenue(str(tmp_path)).to_pandas()
    assert out["n_rows"].iloc[0] == 2
    # rev = ep * DISCOUNT: 100*0.05*100=500 + 100*0.07*100=700
    assert out["revenue_cents"].iloc[0] == 1200


@pytest.mark.usefixtures("ray_session")
def test_q14_share(tmp_path):
    _tables(tmp_path, [
        (1, 1, 1.0, 100.0, 0.0, "1996-06-15"),  # promo part: 10000c
        (2, 1, 1.0, 300.0, 0.0, "1996-06-20"),  # non-promo: 30000c
    ], PARTS)
    out = q14_promo_share(str(tmp_path)).to_pandas()
    assert out["month"].tolist() == [199606]
    assert out["promo_ppm"].iloc[0] == 250_000  # 1/4 in ppm


@pytest.mark.usefixtures("ray_session")
def test_q16_exclusions_and_distinct(tmp_path):
    _tables(tmp_path, [
        (2, 10, 1.0, 1.0, 0.0, "1996-01-01"),
        (2, 11, 1.0, 1.0, 0.0, "1996-01-02"),
        (2, 10, 1.0, 1.0, 0.0, "1996-01-03"),  # dup supplier: counts once
        (1, 12, 1.0, 1.0, 0.0, "1996-01-04"),  # Brand#1: excluded
        (4, 13, 1.0, 1.0, 0.0, "1996-01-05"),  # size 1: excluded
    ], PARTS)
    out = q16_parts_supplier_cnt(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["brand"], r["type"], r["size"], r["supplier_cnt"]) == \
        ("Brand#2", "ECONOMY", 8, 2)


@pytest.mark.usefixtures("ray_session")
def test_q19_arms(tmp_path):
    _tables(tmp_path, [
        (1, 1, 5.0, 100.0, 0.0, "1996-01-01"),   # arm1 (B1, size3, qty5)
        (2, 1, 15.0, 200.0, 0.0, "1996-01-02"),  # arm2 (B2, size8, qty15)
        (3, 1, 25.0, 400.0, 0.0, "1996-01-03"),  # arm3 (B3, size12, qty25)
        (1, 1, 12.0, 100.0, 0.0, "1996-01-04"),  # qty 12: no arm
        (3, 1, 25.0, 400.0, 0.5, "1996-01-05"),  # arm3 with discount
    ], PARTS)
    out = q19_disjunctive_revenue(str(tmp_path)).to_pandas() \
        .set_index("arm")
    assert out.loc["arm1", "n_rows"] == 1
    assert out.loc["arm1", "revenue_cents"] == 10_000
    assert out.loc["arm2", "revenue_cents"] == 20_000
    assert out.loc["arm3", "n_rows"] == 2
    assert out.loc["arm3", "revenue_cents"] == 40_000 + 20_000
