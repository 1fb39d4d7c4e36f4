"""Batch-17 semantic invariants beyond oracle frame-equality: the KMV
set-difference estimate degrades gracefully to exact when the sketch saw
every hash, mutual-top-1 pairs are truly reciprocal under a brute-force
replay, personalized PageRank puts mass only where seeds can reach, and the
schema-evolution union loses no rows across the two snapshot schemas."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.estmine import (
    _KMV_K,
    _PPR_SEED_MOD,
    kmv_anotb_audit,
    mutual_top1_pairs,
    ppr_seeded,
    schema_evolution_union,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_kmv_anotb_tracks_exact_antijoin():
    out = kmv_anotb_audit(SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    side = ((ev["ts"].astype("int64") // 86_400_000_000) // 7) % 2
    a = set(ev.loc[side == 0, "user_id"])
    b = set(ev.loc[side == 1, "user_id"])
    assert out["exact_anotb"] == len(a - b)
    assert out["err"] == out["exact_anotb"] - out["est_anotb"]
    if out["k_eff"] < _KMV_K:
        # sketch held every distinct hash -> estimator must be exact
        assert out["est_anotb"] == out["exact_anotb"]
    else:
        # k=64 bottom-k bound: relative error well inside 3/sqrt(k) ~ 38%
        assert abs(out["err"]) <= max(4, out["exact_anotb"])


@pytest.mark.usefixtures("ray_session")
def test_mutual_top1_matches_bruteforce_replay():
    got = mutual_top1_pairs(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    order = np.argsort(emb["vec_id"].to_numpy())
    ids = emb["vec_id"].to_numpy()[order].astype(np.int64)
    mat = np.floor(np.stack(emb["embedding"].to_numpy()[order])
                   .astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    d = mat @ mat.T
    np.fill_diagonal(d, np.iinfo(np.int64).min)
    best = np.argmax(d, axis=1)  # first max = smallest vec_id
    want = set()
    for i in range(len(ids)):
        j = best[i]
        if best[j] == i and ids[i] < ids[j]:
            want.add((int(ids[i]), int(ids[j]), int(d[i, j])))
    assert set(map(tuple, got[["id_a", "id_b", "dot_q"]].to_numpy())) == want
    assert len(got) == len(want) > 0


@pytest.mark.usefixtures("ray_session")
def test_ppr_mass_stays_near_seeds():
    out = ppr_seeded(SF)
    assert len(out) == 20
    # descending rank, doc_id tie-break
    r = out["rank"].to_numpy()
    assert (r[:-1] >= r[1:]).all()
    assert (r > 0).all()
    # every seed holds at least the retained 15% teleport share, so the
    # global top-20 must include seeds (seeds are ~1/17 of all docs)
    assert (out["doc_id"] % _PPR_SEED_MOD == 0).any()


@pytest.mark.usefixtures("ray_session")
def test_schema_evolution_union_loses_no_rows():
    out = schema_evolution_union(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"]).to_pandas()
    even = docs[docs["doc_id"] % 2 == 0]
    odd = docs[docs["doc_id"] % 2 == 1]
    assert int(out.loc[out["lang_v"] == "pre_migration", "n_docs"].iloc[0]) \
        == len(even)
    assert int(out["n_docs"].sum()) == len(docs)
    per_lang = odd.groupby("lang")["n_chars"].agg(["count", "sum"])
    for lang, row in per_lang.iterrows():
        m = out[out["lang_v"] == lang]
        assert int(m["n_docs"].iloc[0]) == row["count"]
        assert int(m["chars"].iloc[0]) == row["sum"]
