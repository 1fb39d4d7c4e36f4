"""Streaming training-batch feeder: the hand-off from a packed corpus
Dataset to a training loop — ``iter_batches`` consumption with a
concat-and-chunk carry buffer, never materializing the dataset (the
brief's "consume with write_parquet, iter_batches, or an aggregate" rule
applied to the training side; trainprep.doc_pack computes the PLAN, this
module streams the actual token batches).

Tokenization is the deterministic hash stub (word → md5-u32 % vocab): a
real BPE is a model artifact the sandbox doesn't ship, and — as with the
media codecs — the deliverable is the PLUMBING: ordering, carry handling,
fixed shapes, tail policy. Swap ``tokenize`` for a real tokenizer at
deployment; everything else stands.

Scale shape: memory is one Dataset batch + a < seq_len carry, regardless
of corpus size; the input should arrive in a deterministic order (sorted
upstream, or doc_pack's bucket order) for reproducible batches.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np

_WORD = re.compile(r"[a-z]+")


def hash_token_ids(text: str, vocab_size: int) -> np.ndarray:
    """Deterministic tokenizer stub: [a-z]+ words → md5-prefix % vocab."""
    words = _WORD.findall((text or "").lower())
    if not words:
        return np.empty(0, dtype=np.int64)
    return np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "big")
         % vocab_size for w in words),
        dtype=np.int64, count=len(words),
    )


def iter_training_batches(
    ds,
    seq_len: int,
    batch_size: int,
    vocab_size: int = 50_257,
    text_col: str = "text",
    tokenize=None,
) -> Iterator[np.ndarray]:
    """Yield (batch_size, seq_len) int64 arrays from ``ds`` by streaming
    ``iter_batches``: documents are tokenized, laid end-to-end (carry
    buffer across Dataset batches), cut into seq_len rows, and grouped
    into fixed-shape training batches. The final partial batch/sequence is
    DROPPED (the standard fixed-shape policy; count the loss with
    trainplan.padding_waste_census / truncation_loss)."""
    tok = tokenize or (lambda s: hash_token_ids(s, vocab_size))
    carry = np.empty(0, dtype=np.int64)
    rows: list[np.ndarray] = []
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=256):
        texts = batch[text_col].to_pylist()
        if not texts:
            continue
        ids = np.concatenate([carry] + [tok(t) for t in texts])
        n_rows = len(ids) // seq_len
        if n_rows:
            rows.extend(ids[: n_rows * seq_len].reshape(n_rows, seq_len))
        carry = ids[n_rows * seq_len:]
        while len(rows) >= batch_size:
            yield np.stack(rows[:batch_size])
            rows = rows[batch_size:]
    # tail rows/carry dropped (fixed-shape contract)
