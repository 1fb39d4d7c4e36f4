"""Batch-34 semantic invariants beyond oracle frame-equality: a planted
lead-follow pair is detected at exactly its lag with strongly positive
ccf; a planted 7-day-periodic series carries ~all its energy in the
weekly bin while a constant series carries none; the movers list is the
true top of the |df2-df1| ordering; peak census replayed brute-force."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.specops import (
    daily_ccf_best_lag,
    daily_peaks,
    term_movers_topk,
    weekly_spectrum,
)

SF = "/root/testdata/sf0.001"


def _events(days, types):
    n = len(days)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([1.0] * n, pa.float64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_ccf_detects_planted_lead():
    # "click" spikes on days 0,7,14; "purchase" mirrors it 2 days later
    days, types = [], []
    for d in range(21):
        c = 10 if d % 7 == 0 else 1
        p = 10 if d % 7 == 2 else 1
        days += [d] * c + [d] * p
        types += ["click"] * c + ["purchase"] * p
    root = os.path.join(tempfile.gettempdir(), "omni_ray_ccf")
    os.makedirs(root, exist_ok=True)
    pq.write_table(_events(days, types), os.path.join(root, "events.parquet"))
    out = daily_ccf_best_lag(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.set_index(["type_a", "type_b"])
    assert int(r.loc[("click", "purchase"), "best_lag"]) == 2
    assert int(r.loc[("click", "purchase"), "ccf_ppm"]) > 800_000
    # symmetric direction: purchase leads click by... nothing in 0..3
    # except lag 5 (not scanned) -> the best in-range is weaker
    assert abs(int(r.loc[("purchase", "click"), "ccf_ppm"])) \
        <= int(r.loc[("click", "purchase"), "ccf_ppm"])


@pytest.mark.usefixtures("ray_session")
def test_weekly_spectrum_periodic_vs_flat():
    days, types = [], []
    for d in range(28):
        c = 12 if d % 7 == 0 else 2   # strong weekly period
        days += [d] * c + [d] * 3     # "flat": constant 3/day
        types += ["weekly"] * c + ["flat"] * 3
    root = os.path.join(tempfile.gettempdir(), "omni_ray_spec")
    os.makedirs(root, exist_ok=True)
    pq.write_table(_events(days, types), os.path.join(root, "events.parquet"))
    out = weekly_spectrum(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.set_index("event_type")
    assert int(r.loc["flat", "power_scaled"]) == 0  # zero deviations
    # spike train: 1/3 of energy in the fundamental pair
    assert 250_000 < int(r.loc["weekly", "power_ppm"]) <= 400_000
    assert (out["power_scaled"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_movers_are_true_top_shifts():
    import re
    out = term_movers_topk(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas() \
        .sort_values("doc_id")
    n = len(docs)
    cut = docs["doc_id"].iloc[(5 * n + 9) // 10 - 1]
    word = re.compile(r"[a-z]+")
    df: dict = {}
    for _, d in docs.iterrows():
        for w in set(word.findall((d["text"] or "").lower())):
            a = df.setdefault(w, [0, 0])
            a[0 if d["doc_id"] <= cut else 1] += 1
    pool = sorted(df, key=lambda w: (-(df[w][0] + df[w][1]), w))[:100]
    movers = sorted(pool, key=lambda w: (-abs(df[w][1] - df[w][0]), w))[:10]
    assert list(out["term"]) == movers
    for _, r in out.iterrows():
        assert int(r["df1"]) == df[r["term"]][0]
        assert int(r["df2"]) == df[r["term"]][1]
        assert int(r["shift"]) == abs(df[r["term"]][1] - df[r["term"]][0])


@pytest.mark.usefixtures("ray_session")
def test_peaks_bruteforce_replay():
    out = daily_peaks(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    lo, hi = int(ev["day"].min()), int(ev["day"].max())
    for etype, g in ev.groupby("event_type"):
        x = np.zeros(hi - lo + 1, np.int64)
        vc = g["day"].value_counts()
        x[vc.index.to_numpy(np.int64) - lo] = vc.to_numpy(np.int64)
        mid = x[1:-1]
        is_peak = (mid > x[:-2]) & (mid > x[2:])
        r = out.set_index("event_type").loc[etype]
        assert int(r["n_peaks"]) == int(is_peak.sum())
        assert int(r["peak_mass"]) == int(mid[is_peak].sum())
        if is_peak.any():
            assert int(r["tallest"]) == int(mid[is_peak].max())
