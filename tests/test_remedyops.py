"""Batch-39 semantic invariants beyond oracle frame-equality: DiD is zero
when treatment and control move in lockstep and exactly the planted
effect when only treatment jumps; the salting plan catches a planted
whale and its projected max beats the pre-salting max; planted retry
bursts are counted exactly and sub-window-only; a corpus of planted
copies has zero originality while disjoint docs read 1e6."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.remedyops import (
    did_audit,
    event_dedup_census,
    originality_census,
    salting_plan,
)

SF = "/root/testdata/sf0.001"


def _events(days, types, users=None, values=None, us_offsets=None):
    n = len(days)
    base = np.asarray(days) * 86_400_000_000
    if us_offsets is not None:
        base = base + np.asarray(us_offsets)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(base, unit="us"), pa.timestamp("us")),
        "user_id": pa.array(users if users is not None else [0] * n,
                            pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(values if values is not None else [1.0] * n,
                          pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_did_lockstep_zero_and_planted_effect():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_did")
    os.makedirs(root, exist_ok=True)
    # 10 days; both types 5/day -> DiD = 0
    days, types = [], []
    for d in range(10):
        days += [d] * 10
        types += ["purchase"] * 5 + ["click"] * 5
    pq.write_table(_events(days, types), os.path.join(root, "events.parquet"))
    z = did_audit(root)
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert int(z["did_milli"].iloc[0]) == 0
    # purchases jump to 9/day post-mid (days 5..9), clicks flat
    days, types = [], []
    for d in range(10):
        np_ = 9 if d > 4 else 5
        days += [d] * (np_ + 5)
        types += ["purchase"] * np_ + ["click"] * 5
    pq.write_table(_events(days, types), os.path.join(root, "events.parquet"))
    p = did_audit(root)
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    assert int(p["did_milli"].iloc[0]) == 4000  # +4 events/day


@pytest.mark.usefixtures("ray_session")
def test_salting_catches_planted_whale():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_salt")
    os.makedirs(root, exist_ok=True)
    # 20 users x 5 events + user 99 with 100 events: mean = 200//21 = 9
    users = [u for u in range(20) for _ in range(5)] + [99] * 100
    pq.write_table(_events([0] * len(users), ["click"] * len(users),
                           users=users),
                   os.path.join(root, "events.parquet"))
    out = salting_plan(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    summary = out[out["user_id"] == -1].iloc[0]
    hot = out[out["user_id"] >= 0]
    assert list(hot["user_id"]) == [99]
    mean = 200 // 21
    want_salts = -(-100 // mean)
    assert int(hot["salts"].iloc[0]) == want_salts
    assert int(summary["salts"]) == 1  # one hot key
    # projected max: max(cold max = 5, ceil(100 / salts))
    assert int(summary["load"]) == max(5, -(-100 // want_salts))
    assert int(summary["load"]) < 100  # salting actually helped


@pytest.mark.usefixtures("ray_session")
def test_retry_storm_counted_exactly():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_retry")
    os.makedirs(root, exist_ok=True)
    # user 0: 3 identical clicks 100 ms apart (2 dups), then one 5 s
    # later (no dup), then a purchase of different cents (no dup)
    us_off = [0, 100_000, 200_000, 5_200_000, 5_300_000]
    types = ["click", "click", "click", "click", "purchase"]
    pq.write_table(_events([0] * 5, types, us_offsets=us_off),
                   os.path.join(root, "events.parquet"))
    out = event_dedup_census(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    got = out.set_index("event_type")["n_dups"]
    assert int(got.loc["click"]) == 2
    assert int(got.loc["purchase"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_originality_extremes():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_orig")
    os.makedirs(root, exist_ok=True)
    span = "alpha beta gamma delta epsilon zeta eta"
    # two copies of the same text + one disjoint -> copies tainted
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([span, span,
                          "one two three four five six seven"]),
    }), os.path.join(root, "documents.parquet"))
    out = originality_census(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert int(out["eligible_docs"].iloc[0]) == 3
    assert int(out["fully_original"].iloc[0]) == 1
    # all disjoint -> 1e6
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([span, "one two three four five six seven"]),
    }), os.path.join(root, "documents.parquet"))
    z = originality_census(root)
    z = z.to_pandas() if not isinstance(z, pd.DataFrame) else z
    assert int(z["original_ppm"].iloc[0]) == 1_000_000
