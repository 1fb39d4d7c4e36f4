"""Batch-73 semantic invariants: half-split lang labels on planted
bilingual docs, order-insensitivity of the blocking key, and a brute-force
mirror of the hashed-collision mass."""

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.pipelines.hashfeat import (
    _FH_BUCKETS,
    code_switch_census,
    feature_hash_collision_audit,
    sorted_token_key_dups,
)

EN = ("the and of to you that it is in xx " * 3).strip()
GIB = "zq wv xk jj qq pp mm nn zz yy " * 3


def _docs(tmp_path, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_code_switch_planted(tmp_path):
    switch = EN + " " + GIB + GIB  # en first half, gibberish second
    _docs(tmp_path, [switch, GIB + GIB, EN + " " + EN])
    out = code_switch_census(str(tmp_path)).to_pandas()
    got = {(r["lang_left"], r["lang_right"]): r["n_docs"]
           for _, r in out.iterrows()}
    assert got[("en", "unknown")] == 1
    assert got[("unknown", "unknown")] == 1
    assert got[("en", "en")] == 1


@pytest.mark.usefixtures("ray_session")
def test_blocking_key_order_insensitive(tmp_path):
    _docs(tmp_path, [
        "alpha beta gamma filler filler filler",
        "gamma beta alpha filler filler",       # same token SET -> same key
        "delta epsilon unrelated words here",
    ])
    out = sorted_token_key_dups(str(tmp_path)).to_pandas()
    got = dict(zip(out["cluster_size"], out["n_clusters"]))
    assert got == {1: 1, 2: 1}


@pytest.mark.usefixtures("ray_session")
def test_feature_hash_bruteforce_mirror(tmp_path):
    texts = ["aa bb cc aa", "bb dd ee", "ff gg aa"]
    _docs(tmp_path, texts)
    out = feature_hash_collision_audit(str(tmp_path)).to_pandas()
    # brute force the same keying
    tf = {}
    for t in texts:
        for w in t.split():
            tf[w] = tf.get(w, 0) + 1
    buckets = {}
    for term, c in tf.items():
        b = int.from_bytes(hashlib.md5(term.encode()).digest()[:4],
                           "big") % _FH_BUCKETS
        buckets.setdefault(b, []).append(c)
    collided = sum(sum(v) for v in buckets.values() if len(v) >= 2)
    got_coll = int(out.loc[out["metric"] == "collided_tf_mass", "n"].iloc[0])
    assert got_coll == collided
    hist = out[out["metric"] == "terms_per_bucket"]
    assert int(hist["n"].sum()) == _FH_BUCKETS
    # occupied buckets histogram matches brute force
    from collections import Counter
    want = Counter(len(v) for v in buckets.values())
    got = {int(r["k"]): int(r["n"]) for _, r in hist.iterrows() if r["k"] > 0}
    assert got == dict(want)
