"""Batch-42 semantic invariants beyond oracle frame-equality: the AND
search's hits genuinely contain all three query terms (replay) and the
summary count is exact; Lincoln-Petersen is exact on a planted
overlap design; adaptation is 1e6 for an always-doubled planted term
and 0 for singleton terms; weekend lift reads exactly the planted
ratio."""

import os
import re
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.lexops import (
    boolean_and_search,
    capture_recapture_vocab,
    term_adaptation_topk,
    weekend_lift,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


@pytest.mark.usefixtures("ray_session")
def test_boolean_and_replay():
    out = boolean_and_search(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    df: dict = {}
    for _, d in docs.iterrows():
        for w in set(_WORD.findall((d["text"] or "").lower())):
            df[w] = df.get(w, 0) + 1
    q = set(sorted(df, key=lambda w: (-df[w], w))[:3])
    hits = sorted(
        int(d["doc_id"]) for _, d in docs.iterrows()
        if q <= set(_WORD.findall((d["text"] or "").lower())))
    total = int(out.loc[out["doc_id"] == -1, "n_hits"].iloc[0])
    assert total == len(hits)
    assert list(out.loc[out["doc_id"] >= 0, "doc_id"]) == hits[:10]


@pytest.mark.usefixtures("ray_session")
def test_capture_recapture_planted(tmp_path):
    # half 1 = docs 0..4, half 2 = docs 5..9 (median cut at doc 4):
    # n1 = 6 terms, n2 = 4, both = 2 -> estimate 6*4//2 = 12, observed 8
    h1_words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    h2_words = ["ee", "ff", "gg", "hh"]
    texts = [" ".join(h1_words)] * 5 + [" ".join(h2_words)] * 5
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    out = capture_recapture_vocab(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    assert int(r["n_half1"]) == 6
    assert int(r["n_half2"]) == 4
    assert int(r["n_both"]) == 2
    assert int(r["observed_vocab"]) == 8
    assert int(r["estimated_vocab"]) == 12
    assert int(r["unseen_ppm"]) == 4 * 1_000_000 // 12


@pytest.mark.usefixtures("ray_session")
def test_adaptation_extremes(tmp_path):
    # "dup" always appears twice per doc -> adaptation 1e6;
    # "solo" once per doc -> 0; both df = 20 (top terms)
    texts = [f"dup dup solo filler{i:03d}".replace("0", "o")
             .replace("1", "l").replace("2", "t").replace("3", "h")
             .replace("4", "f").replace("5", "v").replace("6", "s")
             .replace("7", "z").replace("8", "e").replace("9", "n")
             for i in range(20)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    out = term_adaptation_topk(str(tmp_path))
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    got = out.set_index("term")
    assert int(got.loc["dup", "adaptation_ppm"]) == 1_000_000
    assert int(got.loc["solo", "adaptation_ppm"]) == 0
    assert int(got.loc["dup", "df"]) == 20


@pytest.mark.usefixtures("ray_session")
def test_weekend_lift_planted():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_wkl")
    os.makedirs(root, exist_ok=True)
    # 14 days (0..13): weekend days are 2,3,9,10 (4 days), weekdays 10.
    # plant 8 events per weekend day, 2 per weekday -> lift = 4e6
    days, types = [], []
    for d in range(14):
        c = 8 if d % 7 in (2, 3) else 2
        days += [d] * c
        types += ["click"] * c
    n = len(days)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.asarray(days) * 86_400, unit="s"),
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array([1.0] * n, pa.float64()),
    }), os.path.join(root, "events.parquet"))
    out = weekend_lift(root)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    r = out.iloc[0]
    # weekend: 4 days x 8 = 32; weekday: 10 days x 2 = 20
    assert int(r["weekend_events"]) == 32
    assert int(r["weekday_events"]) == 20
    assert int(r["lift_ppm"]) == 32 * 10 * 1_000_000 // (20 * 4)
