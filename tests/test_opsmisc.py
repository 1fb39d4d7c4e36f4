"""Batch-56 semantic invariants beyond oracle frame-equality: trigram
coverage reads exactly 1/k² for a single repeated cycle and the observed
set replays; the repeat-price rate is exactly the planted fraction with
subscription users counted once; the quiet-run scan finds the planted
outage window exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.opsmisc import (
    longest_quiet_run,
    repeat_price_rate,
    type_trigram_coverage,
)

SF = "/root/testdata/sf0.001"


def _events(days_or_secs, types, users=None, values=None, unit="s"):
    n = len(days_or_secs)
    mult = 86_400 if unit == "d" else 1
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days_or_secs) * mult,
                                      unit="s"), pa.timestamp("us")),
        "user_id": pa.array(users if users is not None else [0] * n,
                            pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(values if values is not None else [1.0] * n,
                          pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_trigram_coverage_cycle(tmp_path):
    # one user cycling a->b->c: observed trigrams = {abc, bca, cab} = 3
    # of 27 possible
    seq = ["a", "b", "c"] * 5
    pq.write_table(_events(list(range(len(seq))), seq),
                   str(tmp_path / "events.parquet"))
    out = type_trigram_coverage(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["observed"]) == 3
    assert int(r["possible"]) == 27
    assert int(r["coverage_ppm"]) == 3 * 1_000_000 // 27
    real = type_trigram_coverage(SF)
    real = real.to_pandas() if not isinstance(real, pd.DataFrame) else real
    rr = real.iloc[0]
    assert 0 < int(rr["observed"]) <= int(rr["possible"])


@pytest.mark.usefixtures("ray_session")
def test_repeat_price_planted(tmp_path):
    # user 1: 5 purchases at 9.99 (4 repeating pairs); user 2: 3 distinct
    # prices (0 repeats of 2 pairs) -> 4/6 repeats, 1 user with repeat
    secs = [0, 60, 120, 180, 240, 0, 60, 120]
    users = [1] * 5 + [2] * 3
    vals = [9.99] * 5 + [1.0, 2.0, 3.0]
    pq.write_table(_events(secs, ["purchase"] * 8, users=users,
                           values=vals),
                   str(tmp_path / "events.parquet"))
    out = repeat_price_rate(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_pairs"]) == 6
    assert int(r["n_repeats"]) == 4
    assert int(r["repeat_ppm"]) == 4 * 1_000_000 // 6
    assert int(r["users_with_repeat"]) == 1


@pytest.mark.usefixtures("ray_session")
def test_quiet_run_planted_outage(tmp_path):
    # type "up": every day 0..19; type "down": days 0..4 and 12..19 ->
    # 7 quiet days in one run
    days, types = [], []
    for d in range(20):
        days.append(d)
        types.append("up")
        if d < 5 or d >= 12:
            days.append(d)
            types.append("down")
    pq.write_table(_events(days, types, unit="d"),
                   str(tmp_path / "events.parquet"))
    out = longest_quiet_run(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    g = out.set_index("event_type")
    assert int(g.loc["up", "quiet_days"]) == 0
    assert int(g.loc["up", "longest_run"]) == 0
    assert int(g.loc["down", "quiet_days"]) == 7
    assert int(g.loc["down", "longest_run"]) == 7
