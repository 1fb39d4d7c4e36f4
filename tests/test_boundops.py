"""Batch-48 semantic invariants beyond oracle frame-equality: Hoeffding
eps shrinks like 1/sqrt(n) and brackets the replayed conversion; Sn is
0 for a constant series and immune to a single planted outlier that
inflates the range; Mann-Kendall reads +-1e6 on monotone plantings;
record days read exactly n on strictly increasing and 1 on decreasing
series."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.boundops import (
    _HOEFF_A_T12,
    hoeffding_ci_conversion,
    mann_kendall_trend,
    record_days_audit,
    sn_scale_daily,
)

SF = "/root/testdata/sf0.001"


def _events_days(days, types=None):
    n = len(days)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types if types is not None
                               else ["click"] * n),
        "value": pa.array([1.0] * n, pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_hoeffding_replay_and_shrinkage():
    out = hoeffding_ci_conversion(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    buyers = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    for _, r in out.iterrows():
        users = set(ev.loc[ev["event_type"] == r["event_type"],
                           "user_id"])
        conv = sum(1 for u in users if u in buyers)
        assert int(r["n_users"]) == len(users)
        assert int(r["n_converted"]) == conv
        assert int(r["eps_ppm"]) == math.isqrt(_HOEFF_A_T12 // len(users))
    # eps strictly shrinks with n
    s = out.sort_values("n_users")
    assert (np.diff(s["eps_ppm"].to_numpy()) <= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_sn_constant_zero_and_outlier_immune(tmp_path):
    # constant 5/day for 15 days -> Sn = 0 even with one 500-event day
    days = [d for d in range(15) for _ in range(5)] + [7] * 495
    pq.write_table(_events_days(days), str(tmp_path / "events.parquet"))
    out = sn_scale_daily(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert int(out["sn_scale"].iloc[0]) == 0  # 14 of 15 days identical
    real = sn_scale_daily(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert (real["sn_scale"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_mann_kendall_monotone_extremes(tmp_path):
    days = [d for d in range(12) for _ in range(d + 1)]  # increasing
    pq.write_table(_events_days(days), str(tmp_path / "events.parquet"))
    up = mann_kendall_trend(str(tmp_path))
    up = up.to_pandas() if not isinstance(up, pd.DataFrame) else up
    assert int(up["s_ppm"].iloc[0]) == 1_000_000
    days = [d for d in range(12) for _ in range(12 - d)]  # decreasing
    pq.write_table(_events_days(days), str(tmp_path / "events.parquet"))
    dn = mann_kendall_trend(str(tmp_path))
    dn = dn.to_pandas() if not isinstance(dn, pd.DataFrame) else dn
    assert int(dn["s_ppm"].iloc[0]) == -1_000_000


@pytest.mark.usefixtures("ray_session")
def test_record_days_extremes(tmp_path):
    n = 12
    days = [d for d in range(n) for _ in range(d + 1)]  # increasing
    pq.write_table(_events_days(days), str(tmp_path / "events.parquet"))
    up = record_days_audit(str(tmp_path))
    up = up.to_pandas() if not isinstance(up, pd.DataFrame) else up
    assert int(up["records"].iloc[0]) == n
    h_n = sum(1_000_000 // k for k in range(1, n + 1))
    assert int(up["expected_ppm"].iloc[0]) == h_n
    days = [d for d in range(n) for _ in range(n - d)]  # decreasing
    pq.write_table(_events_days(days), str(tmp_path / "events.parquet"))
    dn = record_days_audit(str(tmp_path))
    dn = dn.to_pandas() if not isinstance(dn, pd.DataFrame) else dn
    assert int(dn["records"].iloc[0]) == 1
