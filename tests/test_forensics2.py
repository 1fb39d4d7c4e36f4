"""Batch-57 semantic invariants beyond oracle frame-equality: the
second-digit Benford expectations sum to ~1e6 and a planted uniform
second digit under-shows digit 0; a planted brand with half its parts
unsold in the late window reads exactly 500000 dead ppm; CV is exactly
0 for constant orders and replays against the definition."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.forensics2 import (
    _BENFORD2_PPM,
    benford2_audit,
    dead_stock_census,
    value_cv_by_priority,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_benford2_shares_and_planted_uniform(tmp_path):
    assert abs(sum(_BENFORD2_PPM) - 1_000_000) <= 5
    # real data: spine complete, shares conserve
    out = benford2_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert list(out["digit"]) == list(range(10))
    assert 1_000_000 - 10 <= int(out["obs_ppm"].sum()) <= 1_000_000
    # planted: second digit always 5 -> digit 0 gap strongly negative
    vals = [1.5 + d for d in range(9)]  # cents 150, 250, ... second=5
    n = len(vals)
    pq.write_table(pa.table({
        "event_type": pa.array(["purchase"] * n),
        "value": pa.array(vals, pa.float64()),
        "ts": pa.array(pd.to_datetime(np.arange(n), unit="s"),
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    p = benford2_audit(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    assert int(p.loc[p["digit"] == 5, "obs"].iloc[0]) == 9
    assert int(p.loc[p["digit"] == 0, "gap_ppm"].iloc[0]) < -100_000


@pytest.mark.usefixtures("ray_session")
def test_dead_stock_planted_half(tmp_path):
    pq.write_table(pa.table({
        "p_partkey": pa.array([0, 1, 2, 3], pa.int64()),
        "p_brand": pa.array(["b", "b", "b", "b"]),
    }), str(tmp_path / "part.parquet"))
    # parts 0,1 ship late; part 2 only early; part 3 never ships
    dates = pd.to_datetime(["2020-01-01", "2020-12-31", "2020-12-30",
                            "2020-02-01"])
    pq.write_table(pa.table({
        "l_partkey": pa.array([0, 0, 1, 2], pa.int64()),
        "l_shipdate": pa.array(dates, pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = dead_stock_census(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_parts"]) == 4
    assert int(r["n_dead"]) == 2  # parts 2 and 3
    assert int(r["dead_ppm"]) == 500_000


@pytest.mark.usefixtures("ray_session")
def test_cv_constant_zero_and_replay(tmp_path):
    pq.write_table(pa.table({
        "o_orderpriority": pa.array(["1-URGENT"] * 5 + ["2-HIGH"] * 4),
        "o_totalprice": pa.array([10.0] * 5 + [5.0, 10.0, 15.0, 20.0],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = value_cv_by_priority(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("prio")
    assert int(g.loc["1-URGENT", "cv_milli"]) == 0
    c = np.array([500, 1000, 1500, 2000], dtype=object)
    n, s, ss = 4, int(c.sum()), int((c * c).sum())
    want = 1000 * math.isqrt(n * ss - s * s) // s
    assert int(g.loc["2-HIGH", "cv_milli"]) == want
