"""Batch-54 semantic invariants beyond oracle frame-equality: the
midmean replays against a sorted slice and ignores planted extreme
outliers entirely; the quadratic contrast is 0 on a line, positive on a
planted V, negative on a planted peak; the milestone read is exact on a
planted two-user stream."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.midops import (
    days_to_spend_milestone,
    interquartile_mean,
    quadratic_trend_sign,
)

SF = "/root/testdata/sf0.001"


def _events_days(days, values=None, users=None, types=None):
    n = len(days)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array(users if users is not None else [0] * n,
                            pa.int64()),
        "event_type": pa.array(types if types is not None
                               else ["purchase"] * n),
        "value": pa.array(values if values is not None else [1.0] * n,
                          pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_midmean_replay_and_outlier_immunity(tmp_path):
    out = interquartile_mean(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    c = np.sort(np.floor(
        ev.loc[ev["event_type"] == "purchase", "value"].to_numpy() * 100
        + 0.5).astype(np.int64))
    n = len(c)
    lo, hi = (n + 3) // 4, (3 * n + 3) // 4
    mid = c[lo:hi]
    r = out.iloc[0]
    assert int(r["k_mid"]) == len(mid)
    assert int(r["midmean_milli"]) == int(mid.sum()) * 1000 // len(mid)
    # outliers at both ends leave the midmean untouched
    vals = [10.0] * 8 + [0.01, 99999.0]
    pq.write_table(_events_days(list(range(10)), values=vals),
                   str(tmp_path / "events.parquet"))
    p = interquartile_mean(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    assert int(p["midmean_milli"].iloc[0]) == 1000 * 1000  # exactly 10.00


@pytest.mark.usefixtures("ray_session")
def test_quadratic_contrast_line_v_peak(tmp_path):
    # straight line: counts 1..12 -> U = 0 exactly (contrast kills it)
    days = [d for d in range(12) for _ in range(d + 1)]
    pq.write_table(_events_days(days, types=["click"] * len(days)),
                   str(tmp_path / "events.parquet"))
    z = quadratic_trend_sign(str(tmp_path))
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert int(z["curvature"].iloc[0]) == 0
    # V shape: high at the ends, low in the middle -> convex (+1)
    days = [d for d in range(12)
            for _ in range(abs(2 * d - 11) + 1)]
    pq.write_table(_events_days(days, types=["click"] * len(days)),
                   str(tmp_path / "events.parquet"))
    v = quadratic_trend_sign(str(tmp_path))
    v = v.to_pandas() if not isinstance(v, pd.DataFrame) else v
    assert int(v["curvature"].iloc[0]) == 1
    # peak: high in the middle -> concave (-1)
    days = [d for d in range(12)
            for _ in range(12 - abs(2 * d - 11) // 2)]
    pq.write_table(_events_days(days, types=["click"] * len(days)),
                   str(tmp_path / "events.parquet"))
    p = quadratic_trend_sign(str(tmp_path))
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    assert int(p["curvature"].iloc[0]) == -1


@pytest.mark.usefixtures("ray_session")
def test_milestone_planted_two_users(tmp_path):
    # user 1: $20 on day 0, $40 on day 3 -> crosses $50 at day 3 (off 3)
    # user 2: $10 then $15 -> never reaches
    days = [0, 3, 1, 2]
    users = [1, 1, 2, 2]
    vals = [20.0, 40.0, 10.0, 15.0]
    pq.write_table(_events_days(days, values=vals, users=users),
                   str(tmp_path / "events.parquet"))
    out = days_to_spend_milestone(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_buyers"]) == 2
    assert int(r["n_reached"]) == 1
    assert int(r["reach_ppm"]) == 500_000
    assert int(r["median_days"]) == 3
