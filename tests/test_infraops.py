"""Batch-23 semantic invariants beyond oracle frame-equality: the sentence
census counts planted duplicates exactly (the shipped corpus has none), hard
negatives are exactly brute-force ranks 2..6, consistent-hash moves go only
TO the joining node and cover every key once, and the encoding advisor
reproduces a byte-exact pandas replay."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.infraops import (
    _ENC_COLS,
    _ENC_IDX_BYTES,
    _H_MOD,
    _H_MULT,
    _HN_QMOD,
    _owners,
    _ring,
    consistent_hash_ring_moves,
    encoding_advisor,
    hard_negatives_topk,
    sentence_dedup_census,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_sentence_census_counts_planted_duplicates():
    root = os.path.join(tempfile.gettempdir(), "omni_ray_sentcensus")
    os.makedirs(root, exist_ok=True)
    texts = [
        "alpha beta. shared one. unique aa",
        "shared one. gamma delta. shared two",
        "shared two. shared one. unique bb",
    ]
    pq.write_table(pa.table({"text": texts}),
                   os.path.join(root, "documents.parquet"))
    out = sentence_dedup_census(root).to_pandas().set_index("occurrences")
    # 'shared one' x3, 'shared two' x2, four singleton sentences
    assert int(out.loc[3, "n_sentences"]) == 1
    assert int(out.loc[3, "removable_chars"]) == 2 * len("shared one")
    assert int(out.loc[2, "n_sentences"]) == 1
    assert int(out.loc[2, "removable_chars"]) == 1 * len("shared two")
    assert int(out.loc[1, "n_sentences"]) == 4


@pytest.mark.usefixtures("ray_session")
def test_hard_negatives_are_bruteforce_ranks_2_to_6():
    out = hard_negatives_topk(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    order = np.argsort(emb["vec_id"].to_numpy())
    ids = emb["vec_id"].to_numpy()[order].astype(np.int64)
    mat = np.floor(np.stack(emb["embedding"].to_numpy()[order])
                   .astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    d = mat @ mat.T
    for qid, g in out.groupby("query_id"):
        assert qid % _HN_QMOD == 0 and len(g) == 5
        qi = int(np.searchsorted(ids, qid))
        row = d[qi].copy()
        row[qi] = np.iinfo(np.int64).min // 2  # negates safely, sorts last
        full = sorted(zip(-row, ids))  # (dot desc, vec_id asc)
        want = [(int(ids[np.searchsorted(ids, j)]), int(-s))
                for s, j in full[1:6]]
        got = [(int(r["neighbor_id"]), int(r["dot_q"]))
               for _, r in g.sort_values("rnk").iterrows()]
        assert got == want
        # the true top-1 never appears among the negatives
        assert full[0][1] not in {n for n, _ in got}


@pytest.mark.usefixtures("ray_session")
def test_ring_moves_go_only_to_the_new_node():
    out = consistent_hash_ring_moves(SF).to_pandas()
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert int(out["n_keys"].sum()) == n_docs
    assert set(out["old_owner"]) <= set(range(8))
    doc_id = np.arange(n_docs, dtype=np.uint64)
    kh = ((doc_id * _H_MULT) % _H_MOD).astype(np.int64)
    p1, o1 = _ring(8)
    p2, o2 = _ring(9)
    old = _owners(kh, p1, o1)
    new = _owners(kh, p2, o2)
    moved = old != new
    # the consistent-hashing guarantee: every move lands on the joiner
    assert (new[moved] == 8).all()
    per_old = {int(k): int(v) for k, v in
               zip(*np.unique(old[moved], return_counts=True))}
    for _, r in out.iterrows():
        assert int(r["moved"]) == per_old.get(int(r["old_owner"]), 0)


@pytest.mark.usefixtures("ray_session")
def test_encoding_advisor_matches_byte_replay():
    out = encoding_advisor(SF).to_pandas().set_index("col")
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=_ENC_COLS).to_pandas()
    for c in _ENC_COLS:
        vals = orders[c].astype(str)
        ndv = vals.nunique()
        raw = (np.full(len(vals), 8) if c.endswith("key")
               else vals.str.len().to_numpy())
        raw_bytes = int(raw.sum())
        width = 8 if c.endswith("key") else None
        dict_payload = (ndv * 8 if width else
                        int(vals.drop_duplicates().str.len().sum()))
        dict_bytes = dict_payload + len(vals) * _ENC_IDX_BYTES
        r = out.loc[c]
        assert (int(r["ndv"]), int(r["n_rows"]), int(r["raw_bytes"]),
                int(r["dict_bytes"]), int(r["use_dict"])) == (
            ndv, len(vals), raw_bytes, dict_bytes,
            int(dict_bytes < raw_bytes))
