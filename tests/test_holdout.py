"""Batch-70 semantic invariants: leakage counting on a planted two-sided
user, R/S closed forms (constant series → 0; alternating series → exact
hand value), and the LSH planner's s-curve shape properties."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.holdout import (
    hurst_rs_audit,
    lsh_param_planner,
    temporal_holdout_census,
)

SF = "/root/testdata/sf0.001"
_CUT_S = 1_705_881_600  # 2024-01-22


def _events(tmp_path, rows):
    """rows: (event_id, epoch_s, user_id, event_type)"""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }), str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_holdout_planted_leak(tmp_path):
    _events(tmp_path, [
        (0, _CUT_S - 100, 1, "click"),   # user 1: train only
        (1, _CUT_S - 50, 2, "click"),    # user 2: both sides -> leaked
        (2, _CUT_S + 50, 2, "click"),
        (3, _CUT_S + 100, 3, "click"),   # user 3: test only
        (4, _CUT_S, 4, "view"),          # boundary ts == cutoff -> test
    ])
    out = temporal_holdout_census(str(tmp_path)).to_pandas()
    click = out[out["event_type"] == "click"].iloc[0]
    assert (click["n_events_train"], click["n_events_test"]) == (2, 2)
    assert (click["n_users_train"], click["n_users_test"]) == (2, 2)
    assert click["n_users_leaked"] == 1
    view = out[out["event_type"] == "view"].iloc[0]
    assert (view["n_events_train"], view["n_events_test"]) == (0, 1)
    assert view["n_users_leaked"] == 0


@pytest.mark.usefixtures("ray_session")
def test_hurst_closed_forms(tmp_path):
    # constant daily counts: every window has zero variance -> rs 0
    rows = []
    eid = 0
    for day in range(16):
        for _ in range(5):
            rows.append((eid, day * 86_400 + eid % 3600, 0, "click")); eid += 1
    _events(tmp_path, rows)
    z = hurst_rs_audit(str(tmp_path)).to_pandas()
    assert z["mean_rs_ppm"].tolist() == [0, 0]
    # alternating 1/3 counts, w=4: x=[1,3,1,3], S=8, P=[1,4,5,8],
    # D_j = 4P-jS = [-4, 0, -4, 0], R'=4, d=4*20-64=16 -> rs=4/4=1.0
    rows = []
    eid = 0
    for day in range(16):
        for _ in range(1 if day % 2 == 0 else 3):
            rows.append((eid, day * 86_400 + eid % 3600, 0, "click")); eid += 1
    _events(tmp_path, rows)
    r = hurst_rs_audit(str(tmp_path)).to_pandas()
    got = dict(zip(r["w"], r["mean_rs_ppm"]))
    assert got[4] == 1_000_000
    # w=8: x alternating over 8 days: S=16, D_j=8P-j*16:
    # P=[1,4,5,8,9,12,13,16] -> D=[-8,0,-8,0,-8,0,-8,0], R'=8
    # d = 8*40 - 256 = 64 -> rs = 8/8 = 1.0
    assert got[8] == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_lsh_planner_scurve_shape():
    out = lsh_param_planner(SF).to_pandas()
    assert len(out) == 16
    # monotone in s for fixed (b, r)
    for (b, r), g in out.groupby(["bands", "rows_per_band"]):
        g = g.sort_values("s_ppm")
        assert g["collide_ppm"].is_monotonic_increasing
    # more rows per band -> stricter at low s
    low = out[out["s_ppm"] == 500_000].set_index("rows_per_band")["collide_ppm"]
    assert low[2] > low[16]
    # at s=0.9, wide-band configs catch nearly everything
    hi = out[(out["s_ppm"] == 900_000) & (out["rows_per_band"] == 2)]
    assert int(hi["collide_ppm"].iloc[0]) > 999_000
