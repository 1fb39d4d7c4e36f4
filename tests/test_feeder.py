"""Feeder contract: streamed batches equal the brute-force concat-and-chunk
of the whole corpus, shapes are fixed, tails are dropped, and the carry
survives Dataset-batch boundaries."""

import numpy as np
import pytest

from omni_ray.stages.feeder import hash_token_ids, iter_training_batches


@pytest.mark.usefixtures("ray_session")
def test_streamed_batches_equal_bruteforce():
    import pyarrow.parquet as pq
    import ray.data

    sf = "/root/testdata/sf0.001"
    seq_len, batch_size, vocab = 64, 4, 1000
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force: one giant concat, chunk, group
    all_ids = np.concatenate(
        [hash_token_ids(t, vocab) for t in docs["text"]])
    n_rows = len(all_ids) // seq_len
    ref_rows = all_ids[: n_rows * seq_len].reshape(n_rows, seq_len)
    n_batches = n_rows // batch_size
    ref = [ref_rows[i * batch_size:(i + 1) * batch_size]
           for i in range(n_batches)]

    ds = ray.data.from_pandas(docs)  # single block: iteration order = sorted
    got = list(iter_training_batches(
        ds, seq_len=seq_len, batch_size=batch_size, vocab_size=vocab))
    assert len(got) == len(ref) > 5
    for g, r in zip(got, ref):
        assert g.shape == (batch_size, seq_len)
        assert g.dtype == np.int64
        np.testing.assert_array_equal(g, r)
    assert (np.concatenate([g.ravel() for g in got]) < vocab).all()


def test_tokenizer_stub_deterministic():
    a = hash_token_ids("Hello WORLD hello", 100)
    b = hash_token_ids("hello world hello", 100)
    np.testing.assert_array_equal(a, b)  # case-folded
    assert a[0] == a[2]  # same word, same id
    assert hash_token_ids("", 100).shape == (0,)
    assert hash_token_ids("123 456", 100).shape == (0,)  # digits not tokens
