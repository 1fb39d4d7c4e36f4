"""Batch 95 planted test: exact argmax tie semantics and a planted prefix
mismatch (vectors that agree on full dims but invert on the prefix)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_audit_books():
    import pyarrow.parquet as pq

    from omni_ray.pipelines.mrlops import _STRIDE, mrl_prefix_top1_audit

    t = mrl_prefix_top1_audit("/root/testdata/sf0.001").to_pandas()
    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                        columns=["vec_id"])
    n_sampled = sum(1 for v in emb.column("vec_id").to_pylist()
                    if v % _STRIDE == 0)
    assert t["n_queries"].sum() == n_sampled
    assert (t["n_top1_match"] <= t["n_queries"]).all()
    assert (t["match_ppm"] == (t["n_top1_match"] * 1_000_000)
            // t["n_queries"]).all()


def test_prefix_inversion_detected():
    """Three vectors where the full-dim nearest differs from the prefix-dim
    nearest — the audit's core signal, replayed on the same int math."""
    q = 1 << 20
    # query: strong tail; A matches the tail, B matches the prefix
    vecs = np.array([
        [0.1] * 8 + [0.9] * 8,   # query (id 0)
        [0.0] * 8 + [1.0] * 8,   # A (id 1): best FULL match
        [0.2] * 8 + [0.0] * 8,   # B (id 2): best PREFIX match
    ])
    m = np.floor(vecs * q).astype(np.int64)
    full = m @ m.T
    pre = m[:, :8] @ m[:, :8].T
    np.fill_diagonal(full, np.iinfo(np.int64).min)
    np.fill_diagonal(pre, np.iinfo(np.int64).min)
    assert np.argmax(full[0]) == 1
    assert np.argmax(pre[0]) == 2  # truncation flips the neighbor
