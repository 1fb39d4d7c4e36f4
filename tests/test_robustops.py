"""Batch-30 semantic invariants beyond oracle frame-equality: Theil-Sen
ignores a planted outlier day that would bend OLS and matches a
brute-force pairwise-median replay; tau's pair counts partition n(n-1)/2
and a monotone-aligned planting gives tau exactly +1; the JL census
covers every valid pair with mass concentrated near ratio 1; the novelty
curve is monotone with its final decile equal to the true distinct
shingle count."""

import hashlib
import os
import re
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.robustops import (
    _TAU_TOP,
    gram_novelty_curve,
    jl_distortion_audit,
    rank_stability_tau,
    theil_sen_daily,
)
from omni_ray.pipelines.tsops import _trunc_div

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


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
def test_theil_sen_robust_to_planted_outlier_and_replays():
    # linear growth 1,2,...,10 per day with day 5 spiked to 500 events:
    # the pairwise-slope median stays ~1/day, unmoved by the spike
    days, types = [], []
    for d in range(10):
        c = 500 if d == 5 else d + 1
        days += [d] * c
        types += ["click"] * c
    root = os.path.join(tempfile.gettempdir(), "omni_ray_ts")
    os.makedirs(root, exist_ok=True)
    pq.write_table(_events(days, types), os.path.join(root, "events.parquet"))
    out = theil_sen_daily(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert int(out["slope_milli"].iloc[0]) == 1000  # exactly 1 per day
    # real data: replay the pairwise median per type
    got = theil_sen_daily(SF)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    lo, hi = int(ev["day"].min()), int(ev["day"].max())
    for etype, g in ev.groupby("event_type"):
        x = np.zeros(hi - lo + 1, np.int64)
        vc = g["day"].value_counts()
        x[vc.index.to_numpy(np.int64) - lo] = vc.to_numpy(np.int64)
        i, j = np.triu_indices(len(x), k=1)
        num, den = x[j] - x[i], (j - i).astype(np.int64)
        order = np.lexsort((den, num, num / den))
        mid = order[(len(order) - 1) // 2]
        r = got.set_index("event_type").loc[etype]
        assert int(r["n_pairs"]) == len(num)
        assert int(r["slope_milli"]) == _trunc_div(
            1000 * int(num[mid]), int(den[mid]))


@pytest.mark.usefixtures("ray_session")
def test_tau_partitions_pairs_and_detects_alignment():
    out = rank_stability_tau(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    n = int(r["n_terms"])
    assert n == _TAU_TOP
    assert (int(r["concordant"]) + int(r["discordant"]) + int(r["tied"])
            == n * (n - 1) // 2)
    assert -1000 <= int(r["tau_milli"]) <= 1000
    # planted: every term appears in BOTH halves with identical ordering
    # (term k in docs 0..k of each half) -> df1 == df2 ranks, tau = +1000
    words = [chr(ord("a") + k) * 3 for k in range(21)]
    texts = {}
    half = 50
    for k, w in enumerate(words):
        for d in list(range(k + 1)) + list(range(half, half + k + 1)):
            texts.setdefault(d, []).append(w)
    ids = sorted(texts)
    root = os.path.join(tempfile.gettempdir(), "omni_ray_tau")
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([" ".join(texts[d]) for d in ids]),
    }), os.path.join(root, "documents.parquet"))
    p = rank_stability_tau(root)
    p = p.to_pandas() if not isinstance(p, pd.DataFrame) else p
    assert int(p["discordant"].iloc[0]) == 0
    assert int(p["tau_milli"].iloc[0]) == 1000


@pytest.mark.usefixtures("ray_session")
def test_jl_census_covers_pairs_and_centers_near_one():
    out = jl_distortion_audit(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = set(emb["vec_id"].astype("int64"))
    n_pairs = sum(1 for m in range(max(ids) // 2 + 1)
                  if 2 * m in ids and 2 * m + 1 in ids)
    assert int(out["n_pairs"].sum()) == n_pairs
    assert out["band"].between(0, 30).all()
    # mass concentrated around ratio 1 (band 10): weighted mean in [5, 15]
    wm = float((out["band"] * out["n_pairs"]).sum() / out["n_pairs"].sum())
    assert 5 <= wm <= 15


@pytest.mark.usefixtures("ray_session")
def test_novelty_curve_monotone_and_total():
    out = gram_novelty_curve(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert list(out["decile"]) == list(range(1, 11))
    assert (out["new_novel"] >= 0).all()
    assert list(out["cum_novel"]) == list(out["new_novel"].cumsum())
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    sh = set()
    for t in docs["text"]:
        ws = _WORD.findall((t or "").lower())
        for k in range(len(ws) - 4):
            sh.add(int(hashlib.md5(" ".join(ws[k:k + 5]).encode())
                       .hexdigest()[:15], 16))
    assert int(out["cum_novel"].iloc[-1]) == len(sh)
