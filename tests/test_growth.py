"""Batch-21 semantic invariants beyond oracle frame-equality: the growth
ledger satisfies the accounting identity (actives = new+retained+resurrected,
churned_w = actives_{w-1} - retained_w), the survival curve is a valid
monotone CDF complement anchored at the user count, the LTV triangle is
monotone in age and conserves total purchase revenue, and the heatmap
conserves the event count."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.growth import (
    cohort_ltv,
    dow_hour_heatmap,
    growth_accounting,
    user_survival_curve,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_growth_accounting_identity_holds():
    out = growth_accounting(SF).to_pandas()
    ev = _events()
    ev["week"] = (ev["ts"].astype("int64") // 86_400_000_000) // 7
    uw = ev[["user_id", "week"]].drop_duplicates()
    actives = uw.groupby("week").size()
    for i, r in out.iterrows():
        got_active = r["new_u"] + r["retained_u"] + r["resurrected_u"]
        assert got_active == actives.get(r["week"], 0)
        if i > 0:
            prev = out.iloc[i - 1]
            prev_active = (prev["new_u"] + prev["retained_u"]
                           + prev["resurrected_u"])
            assert r["churned_u"] == prev_active - r["retained_u"]
    # every user is new exactly once
    assert int(out["new_u"].sum()) == uw["user_id"].nunique()


@pytest.mark.usefixtures("ray_session")
def test_survival_curve_is_monotone_cdf_complement():
    out = user_survival_curve(SF).to_pandas()
    ev = _events()
    day = ev["ts"].astype("int64") // 86_400_000_000
    lt = day.groupby(ev["user_id"]).agg(["min", "max"])
    lifetimes = (lt["max"] - lt["min"]).to_numpy()
    s = out["surviving_users"].to_numpy()
    assert s[0] == len(lifetimes)  # everyone survives age 0
    assert (s[:-1] >= s[1:]).all()
    assert int(out["age_days"].iloc[-1]) == int(lifetimes.max())
    assert s[-1] == int((lifetimes == lifetimes.max()).sum() +
                        (lifetimes > lifetimes.max()).sum())
    for _, r in out.sample(8, random_state=0).iterrows():
        assert r["surviving_users"] == int((lifetimes >= r["age_days"]).sum())


@pytest.mark.usefixtures("ray_session")
def test_cohort_ltv_monotone_and_conserves_revenue():
    out = cohort_ltv(SF).to_pandas()
    ev = _events()
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    total = int(cents[(ev["event_type"] == "purchase").to_numpy()].sum())
    last_age = out.loc[out.groupby("cohort")["age"].idxmax()]
    assert int(last_age["cum_rev_cents"].sum()) == total
    for _, g in out.groupby("cohort"):
        c = g.sort_values("age")["cum_rev_cents"].to_numpy()
        assert (c[1:] >= c[:-1]).all()
    # cohort user counts partition the user base
    per_cohort = out.drop_duplicates("cohort")
    assert int(per_cohort["users"].sum()) == ev["user_id"].nunique()


@pytest.mark.usefixtures("ray_session")
def test_heatmap_conserves_events():
    out = dow_hour_heatmap(SF).to_pandas()
    ev = _events()
    assert int(out["n_events"].sum()) == len(ev)
    assert out["dow_idx"].between(0, 6).all()
    assert out["hour"].between(0, 23).all()
    assert not out.duplicated(["dow_idx", "hour"]).any()
