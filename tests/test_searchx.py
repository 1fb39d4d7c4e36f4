"""Batch-20 semantic invariants beyond oracle frame-equality: significant
terms reproduce a full pandas replay of the JLH-style lift, More-Like-This
scores are genuine distinct-term intersections, bibliographic coupling never
exceeds the out-degree bound and matches a dense replay, and the balanced
downsample keeps exactly the minority-class quota per language."""

import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.searchx import (
    _MLT_QUERY_DOC,
    _ST_FG_SOURCE,
    _ST_MIN_FG,
    _ST_SCALE,
    bib_coupling_topk,
    class_balance_downsample,
    mlt_topk,
    significant_terms,
)

SF = "/root/testdata/sf0.001"
_WORD = re.compile(r"[a-z]+")


def _docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_significant_terms_matches_pandas_replay():
    out = significant_terms(SF).to_pandas()
    docs = _docs()
    n_total = len(docs)
    n_fg = int((docs["source"] == _ST_FG_SOURCE).sum())
    fg, bg = {}, {}
    for _, r in docs.iterrows():
        is_fg = r["source"] == _ST_FG_SOURCE
        for w in set(_WORD.findall(r["text"].lower())):
            bg[w] = bg.get(w, 0) + 1
            if is_fg:
                fg[w] = fg.get(w, 0) + 1
    scored = sorted(
        ((-(f * n_total * _ST_SCALE // (bg[t] * n_fg)), t, f, bg[t])
         for t, f in fg.items() if f >= _ST_MIN_FG))
    want = [(t, f, b, -s) for s, t, f, b in scored[:20]]
    got = list(map(tuple, out[["term", "fg_df", "bg_df", "score_q"]]
                   .to_numpy()))
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_mlt_scores_are_true_intersections():
    out = mlt_topk(SF).to_pandas()
    docs = _docs().set_index("doc_id")
    q = set(_WORD.findall(docs.loc[_MLT_QUERY_DOC, "text"].lower()))
    assert _MLT_QUERY_DOC not in set(out["doc_id"])
    s = out["shared_terms"].to_numpy()
    assert (s[:-1] >= s[1:]).all() and (s > 0).all()
    for _, r in out.iterrows():
        terms = set(_WORD.findall(docs.loc[r["doc_id"], "text"].lower()))
        assert len(q & terms) == r["shared_terms"]


@pytest.mark.usefixtures("ray_session")
def test_bib_coupling_bounded_and_matches_replay():
    out = bib_coupling_topk(SF).to_pandas()
    assert (out["shared"] <= 3).all()  # out-degree bound
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    d = np.arange(n)
    from collections import defaultdict
    by_dst = defaultdict(list)
    for j in (1, 2, 3):
        for s_, t_ in zip(d, (7 * d + j) % n):
            if s_ != t_:
                by_dst[t_].append(s_)
    pairs = {}
    for srcs in by_dst.values():
        srcs = sorted(srcs)
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                k = (srcs[i], srcs[j])
                pairs[k] = pairs.get(k, 0) + 1
    want = sorted(((-c, a, b) for (a, b), c in pairs.items()))[:20]
    got = [(-int(r["shared"]), int(r["a"]), int(r["b"]))
           for _, r in out.iterrows()]
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_class_balance_keeps_minority_quota():
    out = class_balance_downsample(SF).to_pandas().set_index("lang")
    docs = _docs()
    counts = docs.groupby("lang").size()
    quota = int(counts.min())
    assert (out["kept"] == quota).all()
    for lang, row in out.iterrows():
        sub = docs[docs["lang"] == lang].sort_values("doc_id")
        assert int(row["dropped"]) == len(sub) - quota
        assert int(row["kept_id_sum"]) == int(sub["doc_id"].head(quota).sum())
