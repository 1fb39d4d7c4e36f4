"""Behavioral tests for span-level and semantic dedup (spandedup.py).

The oracle equivalence of both operators is covered by the parametrized
test_queries sweep; these tests pin the SEMANTICS on planted inputs —
a duplicated 8-word span must vanish byte-exactly, a unique text must
survive byte-identical, and the semantic prune must agree with a
driver-side brute-force replay of its own integer rule.
"""

import hashlib
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_sf(tmp, docs=None, embs=None):
    os.makedirs(tmp, exist_ok=True)
    if docs is not None:
        pq.write_table(pa.table({
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s0"] * len(docs), pa.string()),
            "n_chars": pa.array([len(d or "") for d in docs], pa.int64()),
        }), f"{tmp}/documents.parquet")
    if embs is not None:
        pq.write_table(pa.table({
            "vec_id": pa.array(list(range(len(embs))), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in embs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(embs), pa.int32()),
        }), f"{tmp}/embeddings.parquet")
    return tmp


@pytest.mark.usefixtures("ray_session")
def test_dup_span_removal_masks_planted_span():
    from omni_ray.pipelines.spandedup import dup_span_removal

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = [
        f"one two three {span} four five",
        f"{span} six seven eight nine ten eleven twelve",
        "unique words only here nothing repeats at all today",
        "",  # empty doc: 0 words, md5('')
    ]
    tmp = _write_sf(tempfile.mkdtemp(prefix="spandedup_"), docs=docs)
    out = {r["doc_id"]: r for r in dup_span_removal(tmp).take_all()}

    assert out[0]["n_words"] == 13 and out[0]["n_removed"] == 8
    assert out[0]["clean_md5"] == hashlib.md5(
        b"one two three four five").hexdigest()
    assert out[1]["n_removed"] == 8
    assert out[1]["clean_md5"] == hashlib.md5(
        b"six seven eight nine ten eleven twelve").hexdigest()
    # unique doc passes through byte-identical
    assert out[2]["n_removed"] == 0
    assert out[2]["clean_md5"] == hashlib.md5(docs[2].encode()).hexdigest()
    assert out[3]["n_words"] == 0
    assert out[3]["clean_md5"] == hashlib.md5(b"").hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_dup_span_removal_within_single_doc():
    """A window repeated twice INSIDE one document counts as duplicated."""
    from omni_ray.pipelines.spandedup import dup_span_removal

    span = "a b c d e f g h"
    tmp = _write_sf(tempfile.mkdtemp(prefix="spandedup_"),
                    docs=[f"{span} x {span}", "filler doc with other words"])
    out = {r["doc_id"]: r for r in dup_span_removal(tmp).take_all()}
    assert out[0]["n_removed"] == 16
    assert out[0]["clean_md5"] == hashlib.md5(b"x").hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_semdedup_prune_matches_bruteforce_replay():
    from omni_ray.pipelines.spandedup import (_SEM_K, _SEM_TAU2,
                                              semdedup_prune)

    rng = np.random.RandomState(7)
    m = rng.randn(120, 16) * 0.05
    m[50] = m[10]          # exact copy → must prune 50 in favour of 10
    m[51] = m[10] * 1.01   # near copy → cos 1.0 under quantization
    tmp = _write_sf(tempfile.mkdtemp(prefix="semdedup_"), embs=m)
    got = {(r["vec_id"], r["dup_of"], r["n_close"])
           for r in semdedup_prune(tmp).take_all()}

    # brute-force replay of the documented integer rule
    mf = np.stack(pq.read_table(f"{tmp}/embeddings.parquet")["embedding"]
                  .to_pylist()).astype(np.float64)
    q6 = np.floor(mf * 1e6 + 0.5).astype(np.int64)
    cents = q6[:_SEM_K]
    cl = ((q6[:, None, :] - cents[None, :, :]) ** 2).sum(-1).argmin(1)
    q = np.floor(mf * 100 + 0.5).astype(np.int64)
    want = set()
    for c in np.unique(cl):
        idx = np.where(cl == c)[0]
        dot = q[idx] @ q[idx].T
        nn = np.diag(dot).copy()
        ok = (dot > 0) & (10000 * dot * dot >= _SEM_TAU2 * np.outer(nn, nn))
        np.fill_diagonal(ok, False)
        for a in range(len(idx)):
            lower = [idx[b] for b in range(len(idx))
                     if ok[a, b] and idx[b] < idx[a]]
            if lower:
                want.add((int(idx[a]), int(min(lower)), len(lower)))
    assert got == want
    assert any(v == 50 and d == 10 for v, d, _ in got)
