"""Batch-26 semantic invariants beyond oracle frame-equality: winnowing
honors the every-window-covered guarantee and two docs sharing a long
span share fingerprints; the postings gap census matches a direct pandas
replay; running medians match a brute-force prefix replay; and the
Heaps curve is monotone with its final decile equal to the global
totals."""

import hashlib
import os
import re
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.fpindex import (
    _WIN_W,
    postings_gap_stats,
    running_median_per_user,
    vocab_growth_curve,
    winnowing_fingerprints,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


def _winnow_replay(text):
    ws = _WORD.findall((text or "").lower())
    if len(ws) < 3:
        return None
    hs = [int(hashlib.md5(f"{ws[i]} {ws[i+1]} {ws[i+2]}".encode())
              .hexdigest()[:15], 16) for i in range(len(ws) - 2)]
    if len(hs) <= _WIN_W:
        m = min(hs)
        sel = {len(hs) - 1 - hs[::-1].index(m)}
    else:
        sel = set()
        for j in range(len(hs) - _WIN_W + 1):
            win = hs[j:j + _WIN_W]
            m = min(win)
            sel.add(j + _WIN_W - 1 - win[::-1].index(m))
    return hs, sorted(sel)


@pytest.mark.usefixtures("ray_session")
def test_winnowing_replay_and_guarantee():
    out = winnowing_fingerprints(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    checked = 0
    for _, d in docs.head(50).iterrows():
        rep = _winnow_replay(d["text"])
        if rep is None:
            assert d["doc_id"] not in out.index
            continue
        hs, sel = rep
        r = out.loc[d["doc_id"]]
        assert int(r["n_grams"]) == len(hs)
        assert int(r["n_selected"]) == len(sel)
        assert int(r["min_fp"]) == min(hs[p] for p in sel)
        # the winnowing guarantee: every w-window contains a selection
        for j in range(max(1, len(hs) - _WIN_W + 1)):
            assert any(j <= p < j + _WIN_W for p in sel)
        checked += 1
    assert checked > 10


@pytest.mark.usefixtures("ray_session")
def test_winnowing_shared_span_shares_fingerprints():
    span = " ".join(f"word{i}" for i in range(30))
    root = os.path.join(tempfile.gettempdir(), "omni_ray_winnow")
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([f"alpha beta {span} gamma",
                          f"entirely different prefix {span} other tail",
                          "no overlap with anything here at all"]),
    }), os.path.join(root, "documents.parquet"))
    docs = pq.read_table(os.path.join(root, "documents.parquet")).to_pandas()
    fps = {}
    for _, d in docs.iterrows():
        hs, sel = _winnow_replay(d["text"])
        fps[d["doc_id"]] = {hs[p] for p in sel}
    assert fps[1] & fps[2]            # shared 30-word span -> shared fps
    assert not (fps[1] & fps[3])      # disjoint text -> disjoint fps
    out = winnowing_fingerprints(root).to_pandas()
    assert list(out["doc_id"]) == [1, 2, 3]
    for _, r in out.iterrows():
        assert int(r["n_selected"]) == len(
            _winnow_replay(docs.set_index("doc_id")
                           .loc[r["doc_id"], "text"])[1])


@pytest.mark.usefixtures("ray_session")
def test_postings_gaps_match_pandas_replay():
    out = postings_gap_stats(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    post = {}
    for _, d in docs.iterrows():
        for w in set(_WORD.findall((d["text"] or "").lower())):
            post.setdefault(w, set()).add(int(d["doc_id"]))
    top = sorted(post, key=lambda w: (-len(post[w]), w))[:20]
    assert list(out["term"]) == top
    for _, r in out.iterrows():
        ids = np.sort(np.array(sorted(post[r["term"]]), np.int64))
        gaps = np.diff(ids)
        assert int(r["df"]) == len(ids)
        assert int(r["first_doc"]) == ids[0]
        assert int(r["max_gap"]) == (int(gaps.max()) if len(gaps) else 0)
        assert int(r["gap_bits"]) == sum(int(g).bit_length() for g in gaps)


@pytest.mark.usefixtures("ray_session")
def test_running_median_matches_bruteforce():
    out = running_median_per_user(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["us"] = p["ts"].astype("int64")
    p["cents"] = np.floor(p["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    assert len(out) == len(p)
    got = out.set_index("event_id")
    for _, u in p.groupby("user_id"):
        u = u.sort_values(["us", "event_id"])
        seen = []
        for _, r in u.iterrows():
            seen.append(int(r["cents"]))
            want = sorted(seen)[(len(seen) - 1) // 2]
            assert int(got.loc[r["event_id"], "run_median"]) == want


@pytest.mark.usefixtures("ray_session")
def test_vocab_curve_monotone_and_total_row():
    out = vocab_growth_curve(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert list(out["decile"]) == list(range(1, 11))
    for c in ("n_docs", "n_tokens", "vocab"):
        assert (np.diff(out[c].to_numpy()) >= 0).all()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    toks = [_WORD.findall((t or "").lower()) for t in docs["text"]]
    last = out.iloc[-1]
    assert int(last["n_docs"]) == len(docs)
    assert int(last["n_tokens"]) == sum(len(t) for t in toks)
    assert int(last["vocab"]) == len({w for t in toks for w in t})
    # decile 5 replayed directly: first ceil(n/2) docs by doc_id
    n = len(docs)
    cut_idx = (5 * n + 9) // 10
    ordered = docs.sort_values("doc_id").head(cut_idx)
    otoks = [_WORD.findall((t or "").lower()) for t in ordered["text"]]
    mid = out[out["decile"] == 5].iloc[0]
    assert int(mid["n_docs"]) == cut_idx
    assert int(mid["n_tokens"]) == sum(len(t) for t in otoks)
    assert int(mid["vocab"]) == len({w for t in otoks for w in t})
