"""Batch-22 semantic invariants beyond oracle frame-equality: the waterfill
allocation is feasible AND maximal (level+1 would blow the budget), the
forward-filled series carries the true last observation at every sampled
day, readability scores reproduce the formula per document, and PSI terms
are sign-consistent with the share movement."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.opsaudit import (
    _RS_SYL,
    _RS_WORD,
    ffill_gaps,
    host_budget_waterfill,
    psi_drift,
    readability_scores,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_waterfill_is_feasible_and_maximal():
    out = host_budget_waterfill(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source"]).to_pandas()
    demand = docs.groupby("source").size()
    budget = int(demand.sum()) // 2
    assert (out.set_index("source")["demand"] == demand).all()
    level = int(out["level"].iloc[0])
    assert (out["alloc"] == np.minimum(out["demand"], level)).all()
    assert int(out["alloc"].sum()) <= budget
    # maximality: raising the water level by 1 must exceed the budget
    # (unless every demand is already fully served)
    if (out["alloc"] < out["demand"]).any():
        assert int(np.minimum(out["demand"], level + 1).sum()) > budget


@pytest.mark.usefixtures("ray_session")
def test_ffill_carries_true_last_observation():
    out = ffill_gaps(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["us"] = ev["ts"].astype("int64")
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    max_day = int(ev["day"].max())
    # dense spine per user, ending at the global max day
    for uid, g in out.groupby("user_id"):
        d = g["day"].to_numpy()
        assert d[-1] == max_day and (np.diff(d) == 1).all()
    # sampled check: value at day == last event (ts, event_id order) <= day
    rng = np.random.RandomState(7)
    for _, r in out.sample(25, random_state=3).iterrows():
        past = ev[(ev["user_id"] == r["user_id"]) & (ev["day"] <= r["day"])]
        last = past.sort_values(["us", "event_id"]).iloc[-1]
        assert int(r["cents_ff"]) == int(last["cents"])
    del rng


@pytest.mark.usefixtures("ray_session")
def test_readability_formula_per_document():
    out = readability_scores(SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    scores = {}
    for _, r in docs.iterrows():
        low = r["text"].lower()
        w = len(_RS_WORD.findall(low))
        if w == 0:
            continue
        s = len(r["text"].split(". "))
        sy = len(_RS_SYL.findall(low))
        val = (206835 - 1015 * (w * 1000 // s) // 1000
               - 84600 * (sy * 1000 // w) // 1000)
        scores.setdefault(r["source"], []).append(val)
    for src, vals in scores.items():
        assert int(out.loc[src, "n_docs"]) == len(vals)
        assert int(out.loc[src, "mean_m"]) == sum(vals) // len(vals)
        assert int(out.loc[src, "min_m"]) == min(vals)
        assert int(out.loc[src, "max_m"]) == max(vals)


@pytest.mark.usefixtures("ray_session")
def test_psi_terms_sign_consistent():
    out = psi_drift(SF).to_pandas()
    # PSI term (p-q)*ln(p/q) is non-negative whenever the quantized log
    # agrees in sign with (p-q); with ppm quantization a tiny |p-q| can
    # round ln to 0, so terms are >= 0 up to the zero-rounded band
    d = out["p_ppm"] - out["q_ppm"]
    assert ((out["psi_term"] >= 0) | (d.abs() <= 1)).all()
    # shares are normalized (floor division loses < n_bands ppm)
    assert abs(int(out["p_ppm"].sum()) - 1_000_000) < len(out)
    assert abs(int(out["q_ppm"].sum()) - 1_000_000) < len(out)
    # at least one band actually moved
    assert (d != 0).any()
