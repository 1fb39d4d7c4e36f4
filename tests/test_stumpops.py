"""Batch-47 semantic invariants beyond oracle frame-equality: the stump
finds a perfectly separating planted threshold with 100% accuracy and
always beats (or ties) the majority baseline; the median polish
reproduces planted additive dow/week effects with zero residual; the
runs test reads exactly 2 runs on a trending planted series and ~n runs
on an alternating one."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.stumpops import (
    decision_stump_audit,
    median_polish_dowweek,
    runs_test_audit,
)

SF = "/root/testdata/sf0.001"


def _events_days(days):
    n = len(days)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([1.0] * n, pa.float64()),
    })


def _letters(i):
    s, i = "", i + 1
    while i:
        s += chr(ord("a") + i % 26)
        i //= 26
    return s


@pytest.mark.usefixtures("ray_session")
def test_stump_separates_planted_and_beats_baseline(tmp_path):
    # short docs (few terms) vs long docs (>= 200 distinct terms):
    # perfectly separable at the length boundary
    poor = ["w " * 20] * 6
    rich = [" ".join("q" + _letters(j) for j in range(220))] * 4
    texts = poor + rich
    pq.write_table(pa.table({
        "text": pa.array(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = decision_stump_audit(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["errors"]) == 0
    assert int(r["acc_ppm"]) == 1_000_000
    assert int(r["threshold"]) == len(poor[0])
    real = decision_stump_audit(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    assert int(real["acc_ppm"].iloc[0]) >= \
        int(real["baseline_acc_ppm"].iloc[0])


@pytest.mark.usefixtures("ray_session")
def test_median_polish_recovers_planted_effects(tmp_path):
    # counts = 10 + dow_effect + week_effect (purely additive):
    # dow effects (0,1,2,0,1,2,0), week effects (0, 5) over 2 weeks
    dow_eff = [0, 1, 2, 0, 1, 2, 0]
    week_eff = [0, 5]
    days = []
    for w, we in enumerate(week_eff):
        for dow, de in enumerate(dow_eff):
            days += [w * 7 + dow] * (10 + de + we)
    pq.write_table(_events_days(days), str(tmp_path / "events.parquet"))
    out = median_polish_dowweek(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    resid = int(out.loc[out["kind"] == 2, "value"].iloc[0])
    assert resid == 0  # purely additive matrix polishes clean
    rows = out[out["kind"] == 0].set_index("idx")["value"]
    # row medians absorb base+dow (+ median week effect)
    diffs = [int(rows.loc[i]) - int(rows.loc[0]) for i in range(7)]
    assert diffs == [e - dow_eff[0] for e in dow_eff]


@pytest.mark.usefixtures("ray_session")
def test_runs_trending_vs_alternating(tmp_path):
    # trending: counts 1..14 increasing -> exactly 2 runs
    days = []
    for d in range(14):
        days += [d] * (d + 1)
    pq.write_table(_events_days(days), str(tmp_path / "events.parquet"))
    t = runs_test_audit(str(tmp_path))
    t = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
    assert int(t["runs"].iloc[0]) == 2
    assert int(t["gap_milli"].iloc[0]) < 0  # far fewer than expected
    # alternating high/low -> near-maximal runs
    days = []
    for d in range(14):
        days += [d] * (9 if d % 2 == 0 else 1)
    pq.write_table(_events_days(days), str(tmp_path / "events.parquet"))
    a = runs_test_audit(str(tmp_path))
    a = a.to_pandas() if not isinstance(a, pd.DataFrame) else a
    assert int(a["runs"].iloc[0]) == 14
    assert int(a["gap_milli"].iloc[0]) > 0
