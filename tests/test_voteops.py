"""Batch-51 semantic invariants beyond oracle frame-equality: a planted
dominant source is the Condorcet winner under all three methods; a
planted rock-paper-scissors metric cycle yields NO Condorcet winner
while Borda still produces a total order; approval counts replay against
medians."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.voteops import (
    approval_census,
    borda_ranking,
    copeland_ranking,
)

SF = "/root/testdata/sf0.001"


def _mk_corpus(tmp_path, spec):
    """spec: source -> (n_docs, chars_per_doc, distinct_words_per_doc)"""
    rows = []
    did = 0
    for src, (nd, cpd, vpd) in spec.items():
        for _ in range(nd):
            words = [src * 2 + chr(ord("a") + i % 26)
                     + chr(ord("a") + i // 26) for i in range(vpd)]
            text = " ".join(words)
            rows.append((did, text, src, cpd))
            did += 1
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "source": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([r[3] for r in rows], pa.int64()),
    }), str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_dominant_source_sweeps_all_methods(tmp_path):
    # "z" dominates every metric; "a" > "b" on everything
    _mk_corpus(tmp_path, {"z": (9, 500, 30), "a": (5, 300, 20),
                          "b": (2, 100, 10)})
    cop = copeland_ranking(str(tmp_path))
    cop = cop.to_pandas() if not isinstance(cop, pd.DataFrame) else cop
    assert cop["source"].iloc[0] == "z"
    assert int(cop.set_index("source").loc["z", "condorcet"]) == 1
    assert int(cop["condorcet"].sum()) == 1
    bor = borda_ranking(str(tmp_path))
    bor = bor.to_pandas() if not isinstance(bor, pd.DataFrame) else bor
    assert list(bor["source"]) == ["z", "a", "b"]
    assert list(bor["borda"]) == [6, 3, 0]  # ranks 1,2,3 over 3 metrics


@pytest.mark.usefixtures("ray_session")
def test_condorcet_cycle_has_no_winner(tmp_path):
    # rock-paper-scissors: each source wins exactly one pairwise duel
    # a: docs=3 chars=100 vocab=30 | b: docs=2 chars=300 vocab=20
    # c: docs=1 chars=200 vocab=40  (check: a>b on docs+vocab? a vs b:
    # docs a, chars b, vocab a -> a beats b. b vs c: docs b, chars b,
    # vocab c -> b beats c. c vs a: docs a, chars c, vocab c -> c beats
    # a. cycle!)
    # totals: chars a=300, b=600, c=400 -> the cycle holds
    _mk_corpus(tmp_path, {"a": (3, 100, 30), "b": (2, 300, 20),
                          "c": (1, 400, 40)})
    cop = copeland_ranking(str(tmp_path))
    cop = cop.to_pandas() if not isinstance(cop, pd.DataFrame) else cop
    assert int(cop["condorcet"].sum()) == 0  # no Condorcet winner
    assert (cop["wins"] == 1).all() and (cop["losses"] == 1).all()
    bor = borda_ranking(str(tmp_path))
    bor = bor.to_pandas() if not isinstance(bor, pd.DataFrame) else bor
    assert len(bor) == 3  # Borda still totally orders the cycle


@pytest.mark.usefixtures("ray_session")
def test_approval_replay():
    out = approval_census(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert out["approvals"].between(0, 3).all()
    import re
    w = re.compile(r"[a-z]+")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    m = docs.groupby("source").agg(
        n_docs=("doc_id", "size"), n_chars=("n_chars", "sum")).reset_index()
    voc = {s: len({t for x in g["text"]
                   for t in w.findall((x or "").lower())})
           for s, g in docs.groupby("source")}
    m["vocab"] = m["source"].map(voc)
    got = out.set_index("source")["approvals"]
    for c in ("n_docs", "n_chars", "vocab"):
        v = m[c].to_numpy(np.int64)
        med = int(np.sort(v)[(len(v) - 1) // 2])
        m[f"ap_{c}"] = (v > med).astype(int)
    m["ap"] = m[[f"ap_{c}" for c in ("n_docs", "n_chars", "vocab")]].sum(1)
    for _, r in m.iterrows():
        assert int(got.loc[r["source"]]) == int(r["ap"])
