"""Batch-76 semantic invariants: funnel deadline boundaries (inclusive at
exactly 1 h / 2 h, exclusive past), the first-eligible-chain rule (a later
in-window click does NOT rescue an expired first click), even/odd median
rank cuts, and the argmin tie-break."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.funnelx import (
    gap_median_by_type,
    q2_min_cost_supplier,
    strict_funnel_timed,
)

H = 3600


def _events(tmp_path, rows):
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }), str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_funnel_deadlines(tmp_path):
    _events(tmp_path, [
        # u1: full chain, both deadlines EXACTLY met (inclusive)
        (0, 0, 1, "view"), (1, H, 1, "click"), (2, 3 * H, 1, "purchase"),
        # u2: click 1 s past the view deadline -> stuck at view,
        # and the chain anchors on the FIRST eligible click — the purchase
        # right after doesn't count because the click window expired
        (3, 0, 2, "view"), (4, H + 1, 2, "click"), (5, H + 2, 2, "purchase"),
        # u3: click ok, purchase 1 s past the 2 h window -> stuck at click
        (6, 0, 3, "view"), (7, 10, 3, "click"), (8, 10 + 2 * H + 1, 3,
                                                 "purchase"),
        # u4: purchase BEFORE any view -> no chain, stage view
        (9, 0, 4, "purchase"), (10, 5, 4, "view"),
        # u5: no view at all -> none
        (11, 0, 5, "click"),
    ])
    out = strict_funnel_timed(str(tmp_path)).to_pandas()
    got = dict(zip(out["stage"], out["n_users"]))
    assert got == {"purchase": 1, "view": 2, "click": 1, "none": 1}


@pytest.mark.usefixtures("ray_session")
def test_gap_median_rank_cuts(tmp_path):
    # odd count: gaps 10, 20, 1000 -> median 20
    _events(tmp_path, [(i, t, 1, "click")
                       for i, t in enumerate([0, 10, 30, 1030])])
    out = gap_median_by_type(str(tmp_path)).to_pandas()
    assert out.iloc[0]["n_gaps"] == 3 and out.iloc[0]["median_gap_s"] == 20
    # even count: gaps 10, 20, 30, 1000 -> lower middle = 20
    _events(tmp_path, [(i, t, 1, "click")
                       for i, t in enumerate([0, 10, 30, 60, 1060])])
    out = gap_median_by_type(str(tmp_path)).to_pandas()
    assert out.iloc[0]["n_gaps"] == 4 and out.iloc[0]["median_gap_s"] == 20


@pytest.mark.usefixtures("ray_session")
def test_q2_argmin_tiebreak(tmp_path):
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["a", "b", "c"]),
        "s_nationkey": pa.array([0, 0, 0], pa.int64()),
        "s_acctbal": pa.array([5.0, 5.0, -1.005], pa.float64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([7, 7, 7, 8, 8], pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 2, 1], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = q2_min_cost_supplier(str(tmp_path)).to_pandas().set_index(
        "l_partkey")
    # part 7: suppliers 1 and 2 tie on acctbal -> min suppkey wins
    assert out.loc[7, "s_suppkey"] == 1
    assert out.loc[7, "acctbal_cents"] == 500
    # part 8 same tie set; negative balances pack correctly too
    assert out.loc[8, "s_suppkey"] == 1
    # supplier 3 unused: floor(-100.5 + 0.5) = -100 never appears
    assert set(out["s_suppkey"]) == {1}


@pytest.mark.usefixtures("ray_session")
def test_activity_half_life_planted(tmp_path):
    """Batch 85: front-loaded stream crosses half-mass on day 1; uniform
    stream at the middle day; the ceil(total/2) threshold is pinned on an
    odd total."""
    from omni_ray.pipelines.halflife import activity_half_life

    rows, eid = [], 0
    # 'burst': 6 events day 0, 1 event on each of days 1..4 (total 10,
    # need 5 -> crossed on day 0, days_to_half = 1)
    for _ in range(6):
        rows.append((eid, 10 + eid, 1, "burst")); eid += 1
    for d in range(1, 5):
        rows.append((eid, d * 86_400 + 10, 1, "burst")); eid += 1
    # 'steady': 1 event per day for 5 days (total 5, need 3 -> day index 3)
    for d in range(5):
        rows.append((eid, d * 86_400 + 20, 2, "steady")); eid += 1
    _events(tmp_path, rows)
    out = activity_half_life(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert out.loc["burst", "days_to_half"] == 1
    assert out.loc["burst", "half_day"] == 0
    assert out.loc["steady", "days_to_half"] == 3
    assert out.loc["steady", "n_events"] == 5
