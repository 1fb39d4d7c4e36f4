"""Matryoshka-prefix retrieval audit (round 5, batch 95): how much top-1
retrieval quality survives truncating embeddings to their first 8 of 64
dims — the read that decides whether an MRL-style prefix index can serve
as the cheap first stage of a two-stage ANN (the coarse-then-exact shape
stages/simsearch.py ships). Everything in the floor(x·2^20) integer domain
(the repo's quantized-cosine idiom), so the DuckDB twin is EXACT: dots of
quantized values stay < 2^53 and are computed exactly even through
double-typed list_inner_product.

Sample = vec_id % 37 == 0 (deterministic, ~n/37 — keeps the pairwise
oracle tractable at sf0.1 while the Ray side demonstrates the broadcast
shape). Per label: queries, top-1 agreement count between full-dim and
prefix-dim argmax (ties broken dot desc, vec_id asc), agreement ppm.

Scale shape: the sampled matrix is a bounded broadcast (the knn_bruteforce
pattern); per-block numpy matmul partials at larger samples. The full-
corpus variant is the IVF/LSH path in stages/simsearch.py — this op is
its parameter-planning audit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _read

_STRIDE = 37
_Q = 1 << 20
_PREFIX = 8


def mrl_prefix_top1_audit(sf_dir: str):
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def keep(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["vec_id"].to_numpy(), np.int64)
        return b.filter(pa.array(ids % _STRIDE == 0))

    t = ds.map_batches(keep, batch_format="pyarrow").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    ids = t["vec_id"].to_numpy(np.int64)
    labels = t["label"].to_numpy(np.int64)
    mat = np.floor(
        np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
        * _Q
    ).astype(np.int64)

    def top1(m: np.ndarray) -> np.ndarray:
        dots = m @ m.T  # int64 exact (|q| < 2^19.5, 64 dims -> < 2^46)
        np.fill_diagonal(dots, np.iinfo(np.int64).min)
        # argmax with (dot desc, vec_id asc) ties: argmax returns the FIRST
        # max, and columns are in vec_id order
        return ids[np.argmax(dots, axis=1)]

    full = top1(mat)
    pre = top1(mat[:, :_PREFIX].copy())
    match = (full == pre).astype(np.int64)
    out = (
        pd.DataFrame({"label": labels, "m": match})
        .groupby("label", as_index=False)
        .agg(n_queries=("m", "size"), n_top1_match=("m", "sum"))
        .sort_values("label").reset_index(drop=True)
    )
    out["match_ppm"] = (out["n_top1_match"] * 1_000_000) // out["n_queries"]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MRL_PREFIX_TOP1_AUDIT = f"""
WITH s AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> floor(CAST(x AS DOUBLE) * {_Q})) AS q
  FROM embeddings WHERE vec_id % {_STRIDE} = 0
), pairs AS (
  SELECT a.vec_id AS qa, a.label AS la, b.vec_id AS qb,
         CAST(list_inner_product(a.q, b.q) AS BIGINT) AS dot_full,
         CAST(list_inner_product(list_slice(a.q, 1, {_PREFIX}),
                                 list_slice(b.q, 1, {_PREFIX})) AS BIGINT)
           AS dot_pre
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
), tf AS (
  SELECT qa, la, qb,
         row_number() OVER (PARTITION BY qa ORDER BY dot_full DESC, qb) AS r
  FROM pairs
), tp AS (
  SELECT qa, qb,
         row_number() OVER (PARTITION BY qa ORDER BY dot_pre DESC, qb) AS r
  FROM pairs
), agree AS (
  SELECT f.la, CASE WHEN f.qb = p.qb THEN 1 ELSE 0 END AS m
  FROM tf f JOIN tp p ON f.qa = p.qa AND p.r = 1
  WHERE f.r = 1
)
SELECT CAST(la AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(m) AS BIGINT) AS n_top1_match,
       CAST((sum(m) * 1000000) // count(*) AS BIGINT) AS match_ppm
FROM agree
GROUP BY 1
ORDER BY 1
"""


MRLOPS_REGISTRY = {
    "mrl_prefix_top1_audit": (mrl_prefix_top1_audit,
                              SQL_MRL_PREFIX_TOP1_AUDIT),
}
