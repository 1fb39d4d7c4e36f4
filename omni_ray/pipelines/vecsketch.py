"""Embedding-space + sketch-audit QA operators, round 3 batch 14: product
quantization, count-min-sketch frequency audit, simplified silhouette,
Matryoshka prefix-dim agreement, and per-dimension moment profile.

These close the remaining vector-infrastructure surface around the ANN /
kmeans / SQ8 family (simsearch.py, corpusops.py): PQ is the codebook
compression every disk-resident 100-TB vector index uses (Jégou et al.
2011), the count-min sketch is the streaming frequency estimator whose
*audit* (estimate vs exact, overestimate accounting) mirrors what
bloom_fp_audit does for membership (Cormode & Muthukrishnan 2005), the
simplified (centroid-based) silhouette is the cluster-separation QA read
that scales where pairwise silhouette cannot, Matryoshka prefix-dim
agreement measures how much of the top-1 neighbor structure survives
embedding truncation (Kusupati et al. 2022 — the read behind "can we
store 16 of 64 dims?"), and the per-dimension moment profile is the
dimension-collapse / scale-drift detector run before any of the above.

Integer rules (CLAUDE.md): components quantized half-up at 1e6 to int64
on BOTH engines; all distances are exact integer squared-L2 with
argmin tie-break on lowest code/vector id; the silhouette ratio is
computed in arbitrary-precision integers (Python int / HUGEINT) because
(b-a)*1e6 can exceed int64 at 64 dims.

Scale shape summary (details per docstring):
- pq_recon_error: bounded codebook collect → broadcast → ONE
  zero-shuffle map emitting ≤M*K combiner rows per block → bounded fold.
- cms_freq_audit: block-combiner (r,col) partials → BOUNDED 4096-key
  fold; exact audit counts via _bucketed_agg with per-bucket top-k
  prune; probe on the driver against the bounded sketch.
- silhouette_simplified: broadcast centroids → ONE zero-shuffle map
  emitting per-cluster partials → bounded K-key fold.
- matryoshka_agreement: broadcast queries → ONE zero-shuffle map
  emitting per-(query,prefix) block finalists → tiny driver min-fold.
- vec_dim_stats: block combiner (64 rows/block) → bounded 64-key fold.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Max, Min, Sum

from .mlqueries import _emb
from .queries import _bucketed_agg, _read

_WORD = re.compile(r"[a-z]+")
_Q = 1_000_000


def _quant(v: np.ndarray) -> np.ndarray:
    """Half-up 1e6 quantization — the repo-wide embedding integer bridge
    (identical to corpusops.kmeans_* and DuckDB's floor(v*1e6 + 0.5))."""
    return np.floor(v.astype(np.float64) * _Q + 0.5).astype(np.int64)


def _emb_matrix(t: pa.Table):
    """(vec_ids int64[n], quantized int64[n,d]) for one embeddings batch."""
    col = t["embedding"].combine_chunks()
    n = len(col)
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if n == 0:
        return ids, np.zeros((0, 0), np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return ids, _quant(flat.reshape(n, len(flat) // n))


def _seed_rows(sf_dir: str, k: int):
    """The K lowest-vec_id vectors, quantized — the deterministic seed
    shared with kmeans_assign (corpusops.py:338)."""
    rows = _emb(sf_dir).sort("vec_id").limit(k).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([
        _quant(np.asarray(r["embedding"], dtype=np.float64)) for r in rows
    ])
    return ids, mat


# -- pq_recon_error -----------------------------------------------------------

_PQ_M = 4       # subspaces
_PQ_SUB = 16    # dims per subspace
_PQ_K = 8       # codes per subspace


def pq_recon_error(sf_dir: str):
    """Product-quantization census (Jégou et al. 2011): the 64-dim space
    splits into M=4 contiguous 16-dim subspaces, each with its own K=8
    codebook (the quantized subvectors of the 8 lowest-vec_id rows — the
    kmeans_assign seed rule, so this is the E-step of a PQ trainer);
    every vector's subvector maps to its nearest code (exact integer
    squared-L2, ties to the lowest code id) and the output is the
    per-(subspace, code) cell census with the summed reconstruction
    error — the code-utilization + distortion read that decides whether
    a codebook needs re-training before an index build.

    Shape: the codebook is a bounded K-row collect broadcast once via
    ray.put; assignment is ONE zero-shuffle vectorized pass whose blocks
    emit at most M*K=32 combiner rows each; the final fold is a bounded
    32-key groupby. At 100 TB nothing but 32-row partials moves.

    Output: (subspace, code, n_assigned, recon_err_q) ordered by
    subspace, code."""
    cent_ids, cent_q = _seed_rows(sf_dir, _PQ_K)
    # (M, K, SUB) codebook, code order = vec_id order (lowest first)
    books = cent_q.reshape(_PQ_K, _PQ_M, _PQ_SUB).transpose(1, 0, 2).copy()
    ref = ray.put((cent_ids, books))

    def assign(t: pa.Table) -> pa.Table:
        ids, bk = ray.get(ref)
        _vecs, q = _emb_matrix(t)
        rows = {"subspace": [], "code": [], "n_assigned": [], "recon_err_q": []}
        if len(q):
            sub = q.reshape(len(q), _PQ_M, _PQ_SUB)
            for m in range(_PQ_M):
                diff = sub[:, m, None, :] - bk[m][None, :, :]
                dist = np.einsum("nkd,nkd->nk", diff, diff)
                best = dist.argmin(axis=1)  # first win = lowest code id
                for k in np.unique(best):
                    mask = best == k
                    rows["subspace"].append(m)
                    rows["code"].append(int(ids[k]))
                    rows["n_assigned"].append(int(mask.sum()))
                    rows["recon_err_q"].append(int(dist[mask, k].sum()))
        return pa.table({
            "subspace": pa.array(rows["subspace"], pa.int64()),
            "code": pa.array(rows["code"], pa.int64()),
            "n_assigned": pa.array(rows["n_assigned"], pa.int64()),
            "recon_err_q": pa.array(rows["recon_err_q"], pa.int64()),
        })

    out = (
        _emb(sf_dir).map_batches(assign, batch_format="pyarrow")
        .groupby(["subspace", "code"])
        .aggregate(Sum("n_assigned", alias_name="n_assigned"),
                   Sum("recon_err_q", alias_name="recon_err_q"))
        .to_pandas()
        .sort_values(["subspace", "code"], kind="mergesort")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_PQ_RECON_ERROR = r"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS e
  FROM embeddings
), ms AS (
  SELECT unnest(range(0, 4)) AS m
), sub AS (
  SELECT q.vec_id, ms.m,
         list_transform(range(1, 17), i -> q.e[ms.m * 16 + i]) AS se
  FROM q CROSS JOIN ms
), cent AS (
  SELECT vec_id AS code, m, se FROM sub
  WHERE vec_id IN (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8)
), assigned AS (
  SELECT s.vec_id, s.m, c.code,
         CAST(list_sum(list_transform(range(1, 17),
              i -> (s.se[i] - c.se[i]) * (s.se[i] - c.se[i]))) AS BIGINT)
           AS dist_q
  FROM sub s JOIN cent c USING (m)
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.m
                             ORDER BY dist_q, c.code) = 1
)
SELECT m AS subspace, code,
       CAST(count(*) AS BIGINT) AS n_assigned,
       CAST(sum(dist_q) AS BIGINT) AS recon_err_q
FROM assigned GROUP BY m, code ORDER BY subspace, code
"""


# -- cms_freq_audit -----------------------------------------------------------

_CMS_D = 4      # hash rows
_CMS_W = 1024   # columns per row
_CMS_TOPK = 20  # audited heavy terms


def _cms_col(term: str, r: int) -> int:
    """Row-r column for a term: md5("term#r") first 8 bytes big-endian mod
    W — the md5→UBIGINT bridge the HLL/KMV/DSIR oracles pin."""
    return int.from_bytes(
        hashlib.md5(f"{term}#{r}".encode()).digest()[:8], "big") % _CMS_W


def cms_freq_audit(sf_dir: str):
    """Count-min-sketch frequency audit (Cormode & Muthukrishnan 2005) —
    the membership-sketch audit bloom_fp_audit runs, applied to the
    FREQUENCY sketch: build a d=4 × w=1024 CMS over every term occurrence
    in the corpus, then for the 20 exactly-heaviest terms report the
    sketch estimate next to the exact count and the overestimate the
    hash collisions caused. est >= exact always (CMS never
    underestimates); the overestimate column is the deployable error of
    the sketch at this corpus/width — the number a 100-TB run consults
    before trusting CMS counts for mixture weighting.

    Shape: pass 1 folds (row, col) cell counts with a per-block combiner
    into a BOUNDED 4096-key aggregate; exact term counts use the
    _bucketed_agg combiner (term domain is row-sized) with a per-bucket
    top-k prune so only n_buckets*k finalist rows reach the driver; the
    probe of 20 terms against the 4096-cell sketch is driver-side
    arithmetic on bounded state.

    Output: (term, exact_cnt, est_cnt, overest_cnt) ordered by
    exact_cnt desc, term."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def term_counts(t: pa.Table) -> pa.Table:
        cnt: dict = {}
        for x in t.column("text").to_pylist():
            for w in _WORD.findall((x or "").lower()):
                cnt[w] = cnt.get(w, 0) + 1
        return pa.table({
            "term": pa.array(list(cnt.keys()), pa.string()),
            "n": pa.array(list(cnt.values()), pa.int64()),
        })

    tc = ds.map_batches(term_counts, batch_format="pyarrow").materialize()

    # sketch cells: per-block combiner rows -> bounded 4096-key fold
    def cells(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_pylist()
        ns = t.column("n").to_numpy(zero_copy_only=False)
        acc: dict = {}
        for term, n in zip(terms, ns):
            for r in range(_CMS_D):
                key = (r, _cms_col(term, r))
                acc[key] = acc.get(key, 0) + int(n)
        return pa.table({
            "r": pa.array([k[0] for k in acc], pa.int64()),
            "col": pa.array([k[1] for k in acc], pa.int64()),
            "n": pa.array(list(acc.values()), pa.int64()),
        })

    sk = (
        tc.map_batches(cells, batch_format="pyarrow")
        .groupby(["r", "col"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    sketch = np.zeros((_CMS_D, _CMS_W), np.int64)
    sketch[sk["r"].to_numpy(), sk["col"].to_numpy()] = sk["n"].to_numpy()

    # exact audit set: bucketed combiner agg + per-bucket top-k prune
    exact = _bucketed_agg(tc, ["term"], {"cnt": ("n", "sum")})

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["cnt", "term"], ascending=[False, True],
                            kind="mergesort").head(_CMS_TOPK)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    finalists = exact.map_batches(prune, batch_format="pyarrow").to_pandas()
    top = finalists.sort_values(
        ["cnt", "term"], ascending=[False, True],
        kind="mergesort").head(_CMS_TOPK)

    terms = top["term"].tolist()
    exact_n = top["cnt"].to_numpy().astype(np.int64)
    est = np.array([
        min(int(sketch[r, _cms_col(term, r)]) for r in range(_CMS_D))
        for term in terms
    ], dtype=np.int64)
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "exact_cnt": pa.array(exact_n, pa.int64()),
        "est_cnt": pa.array(est, pa.int64()),
        "overest_cnt": pa.array(est - exact_n, pa.int64()),
    })


SQL_CMS_FREQ_AUDIT = r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
           AS term
  FROM documents
), tc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1
), rows_ AS (
  SELECT unnest(range(0, 4)) AS r
), cells AS (
  SELECT r,
         ('0x' || substr(md5(term || '#' || CAST(r AS VARCHAR)), 1, 16))
           ::UBIGINT % 1024 AS col,
         SUM(cnt) AS n
  FROM tc CROSS JOIN rows_ GROUP BY 1, 2
), top AS (
  SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 20
)
SELECT t.term, t.cnt AS exact_cnt,
       CAST(min(c.n) AS BIGINT) AS est_cnt,
       CAST(min(c.n) - t.cnt AS BIGINT) AS overest_cnt
FROM top t CROSS JOIN rows_ r
JOIN cells c
  ON c.r = r.r
 AND c.col = ('0x' || substr(md5(t.term || '#' || CAST(r.r AS VARCHAR)),
                             1, 16))::UBIGINT % 1024
GROUP BY t.term, t.cnt
ORDER BY exact_cnt DESC, term
"""


# -- silhouette_simplified ----------------------------------------------------

_SIL_K = 8


def silhouette_simplified(sf_dir: str):
    """Simplified (centroid-based) silhouette per cluster: for each vector,
    a = squared distance to its nearest centroid (its cluster), b = to the
    second-nearest; the per-vector score is floor((b-a)*1e6 / max(a,b)) in
    [0, 1e6] — the separation QA a kmeans/IVF build checks before
    trusting its partitions. Classic silhouette is O(n^2); the
    centroid form is the one that streams (Hruschka et al.), and the
    squared-distance variant keeps every step integer-exact. The ratio
    multiplies through 1e6 BEFORE dividing, which exceeds int64 at 64
    dims — the Ray side uses Python ints, the oracle HUGEINT, so both are
    exact. Centroids are the kmeans_assign seed (8 lowest vec_ids).

    Shape: bounded centroid collect → broadcast; ONE zero-shuffle pass
    emitting per-cluster partial rows (≤K per block); bounded K-key fold.

    Output: (cluster, n, sil_sum_ppm) ordered by cluster — sil_sum_ppm
    is the exact integer sum of per-vector scores (mean = sum/n, left
    un-divided to stay integer-exact)."""
    cent_ids, cent_q = _seed_rows(sf_dir, _SIL_K)
    ref = ray.put((cent_ids, cent_q))

    def score(t: pa.Table) -> pa.Table:
        ids, cq = ray.get(ref)
        _vecs, q = _emb_matrix(t)
        rows = {"cluster": [], "n": [], "sil_sum_ppm": []}
        if len(q):
            diff = q[:, None, :] - cq[None, :, :]
            dist = np.einsum("nkd,nkd->nk", diff, diff)
            order = np.argsort(dist, axis=1, kind="stable")
            best = order[:, 0]
            a = dist[np.arange(len(q)), best]
            b = dist[np.arange(len(q)), order[:, 1]]
            # (b-a)*1e6 exceeds int64 at 64 dims: Python-int exact ratio
            s = np.fromiter(
                ((int(bi) - int(ai)) * _Q // int(bi) if bi else 0
                 for ai, bi in zip(a, b)),
                dtype=np.int64, count=len(q))
            for k in np.unique(best):
                mask = best == k
                rows["cluster"].append(int(ids[k]))
                rows["n"].append(int(mask.sum()))
                rows["sil_sum_ppm"].append(int(s[mask].sum()))
        return pa.table({
            "cluster": pa.array(rows["cluster"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "sil_sum_ppm": pa.array(rows["sil_sum_ppm"], pa.int64()),
        })

    out = (
        _emb(sf_dir).map_batches(score, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sil_sum_ppm", alias_name="sil_sum_ppm"))
        .to_pandas()
        .sort_values("cluster", kind="mergesort").reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_SILHOUETTE_SIMPLIFIED = r"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS e
  FROM embeddings
), cent AS (
  SELECT vec_id AS cid, e AS ce FROM q ORDER BY vec_id LIMIT 8
), dists AS (
  SELECT q.vec_id, cent.cid,
         CAST(list_sum(list_transform(range(1, len(q.e) + 1),
              i -> (q.e[i] - cent.ce[i]) * (q.e[i] - cent.ce[i])))
              AS BIGINT) AS dist_q,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY CAST(list_sum(list_transform(
                                range(1, len(q.e) + 1),
                                i -> (q.e[i] - cent.ce[i])
                                     * (q.e[i] - cent.ce[i]))) AS BIGINT),
                            cent.cid) AS rn
  FROM q CROSS JOIN cent
), ab AS (
  SELECT vec_id,
         max(CASE WHEN rn = 1 THEN cid END) AS cluster,
         max(CASE WHEN rn = 1 THEN dist_q END) AS a,
         max(CASE WHEN rn = 2 THEN dist_q END) AS b
  FROM dists WHERE rn <= 2 GROUP BY vec_id
), s AS (
  SELECT cluster,
         CASE WHEN b = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((CAST(b AS HUGEINT) - a) * 1000000 // b AS BIGINT)
         END AS s_ppm
  FROM ab
)
SELECT cluster, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(s_ppm) AS BIGINT) AS sil_sum_ppm
FROM s GROUP BY cluster ORDER BY cluster
"""


# -- matryoshka_agreement -----------------------------------------------------

_MAT_NQ = 8
_MAT_PREFIXES = (8, 16, 32, 64)


def matryoshka_agreement(sf_dir: str):
    """Matryoshka truncation agreement (Kusupati et al. 2022): for each of
    the 8 lowest-vec_id query vectors, find the top-1 nearest OTHER
    vector using only the first p dims, p in {8, 16, 32, 64}; report per
    prefix how many queries' truncated winner equals the full-64-dim
    winner — the measurement behind "can this index store a 16-dim
    prefix and rerank?". Distances are exact integer squared-L2 on
    quantized prefixes, ties to the lowest vec_id, so the winner chain
    is deterministic on both engines.

    Shape: queries broadcast once (8x64 ints); ONE zero-shuffle pass
    emits each block's finalist per (query, prefix) — ≤32 rows/block;
    the driver folds finalists by (dist, vec_id) min and compares the 4
    winner columns. The corpus is never shuffled and never leaves its
    blocks; at 100 TB this is a pure scan.

    Output: (prefix_dim, n_queries, n_agree) ordered by prefix_dim."""
    q_ids, q_mat = _seed_rows(sf_dir, _MAT_NQ)
    ref = ray.put((q_ids, q_mat))

    def finalists(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(ref)
        ids, m = _emb_matrix(t)
        rows = {"qid": [], "prefix": [], "dist_q": [], "vec": []}
        if len(m):
            for p in _MAT_PREFIXES:
                diff = m[:, None, :p] - qm[None, :, :p]
                dist = np.einsum("nkd,nkd->nk", diff, diff)
                # exclude self-matches
                self_mask = ids[:, None] == qids[None, :]
                dist[self_mask] = np.iinfo(np.int64).max
                # per query: min by (dist, vec_id) — lexsort for the tie
                for j in range(len(qids)):
                    col = dist[:, j]
                    k = np.lexsort((ids, col))[0]
                    rows["qid"].append(int(qids[j]))
                    rows["prefix"].append(p)
                    rows["dist_q"].append(int(col[k]))
                    rows["vec"].append(int(ids[k]))
        return pa.table({
            "qid": pa.array(rows["qid"], pa.int64()),
            "prefix": pa.array(rows["prefix"], pa.int64()),
            "dist_q": pa.array(rows["dist_q"], pa.int64()),
            "vec": pa.array(rows["vec"], pa.int64()),
        })

    fin = _emb(sf_dir).map_batches(
        finalists, batch_format="pyarrow").to_pandas()
    fin = fin.sort_values(["qid", "prefix", "dist_q", "vec"],
                          kind="mergesort")
    win = fin.groupby(["qid", "prefix"], sort=True).first().reset_index()
    full = win[win["prefix"] == 64].set_index("qid")["vec"]
    rows = []
    for p in _MAT_PREFIXES:
        sub = win[win["prefix"] == p]
        agree = int((sub.set_index("qid")["vec"] == full).sum())
        rows.append((p, len(sub), agree))
    return pa.table({
        "prefix_dim": pa.array([r[0] for r in rows], pa.int64()),
        "n_queries": pa.array([r[1] for r in rows], pa.int64()),
        "n_agree": pa.array([r[2] for r in rows], pa.int64()),
    })


SQL_MATRYOSHKA_AGREEMENT = r"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS e
  FROM embeddings
), queries AS (
  SELECT vec_id AS qid, e AS qe FROM q ORDER BY vec_id LIMIT 8
), prefixes AS (
  SELECT unnest([8, 16, 32, 64]) AS p
), w AS (
  SELECT qu.qid, pr.p, q.vec_id,
         CAST(list_sum(list_transform(range(1, pr.p + 1),
              i -> (q.e[i] - qu.qe[i]) * (q.e[i] - qu.qe[i])))
              AS BIGINT) AS dist_q
  FROM q CROSS JOIN queries qu CROSS JOIN prefixes pr
  WHERE q.vec_id <> qu.qid
  QUALIFY row_number() OVER (PARTITION BY qu.qid, pr.p
                             ORDER BY dist_q, q.vec_id) = 1
), full64 AS (
  SELECT qid, vec_id AS fvec FROM w WHERE p = 64
)
SELECT w.p AS prefix_dim,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(CASE WHEN w.vec_id = f.fvec THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree
FROM w JOIN full64 f USING (qid)
GROUP BY w.p ORDER BY prefix_dim
"""


# -- vec_dim_stats ------------------------------------------------------------


def vec_dim_stats(sf_dir: str):
    """Per-dimension moment profile of the embedding space: exact integer
    (sum, sum-of-squares, min, max) of the quantized component per
    dimension — the dimension-collapse / scale-drift detector run before
    building quantizers or truncating dims (a dead dim shows sumsq ~ 0;
    a drifted encoder shows asymmetric min/max). Emitted as raw exact
    moments rather than variance so the output stays integer-exact
    (variance = (n*sumsq - sum^2)/n^2 is derivable and would overflow
    int64 at sf >= 0.1).

    Shape: per-block combiner emits exactly 64 partial rows; the fold is
    a bounded 64-key groupby. A pure streaming scan at any scale.

    Output: (dim 1-based, sum_q, sumsq_q, min_q, max_q) ordered by dim."""
    def moments(t: pa.Table) -> pa.Table:
        _ids, m = _emb_matrix(t)
        if not len(m):
            return pa.table({
                "dim": pa.array([], pa.int64()),
                "sum_q": pa.array([], pa.int64()),
                "sumsq_q": pa.array([], pa.int64()),
                "min_q": pa.array([], pa.int64()),
                "max_q": pa.array([], pa.int64()),
            })
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1), pa.int64()),
            "sum_q": pa.array(m.sum(axis=0), pa.int64()),
            "sumsq_q": pa.array((m * m).sum(axis=0), pa.int64()),
            "min_q": pa.array(m.min(axis=0), pa.int64()),
            "max_q": pa.array(m.max(axis=0), pa.int64()),
        })

    out = (
        _emb(sf_dir).map_batches(moments, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Sum("sum_q", alias_name="sum_q"),
                   Sum("sumsq_q", alias_name="sumsq_q"),
                   Min("min_q", alias_name="min_q"),
                   Max("max_q", alias_name="max_q"))
        .to_pandas()
        .sort_values("dim", kind="mergesort").reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_VEC_DIM_STATS = r"""
WITH q AS (
  SELECT list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS e
  FROM embeddings
), dims AS (
  SELECT unnest(range(1, (SELECT len(e) FROM q LIMIT 1) + 1)) AS dim
)
SELECT d.dim,
       CAST(sum(q.e[d.dim]) AS BIGINT) AS sum_q,
       CAST(sum(q.e[d.dim] * q.e[d.dim]) AS BIGINT) AS sumsq_q,
       CAST(min(q.e[d.dim]) AS BIGINT) AS min_q,
       CAST(max(q.e[d.dim]) AS BIGINT) AS max_q
FROM q CROSS JOIN dims d
GROUP BY d.dim ORDER BY d.dim
"""


VECSKETCH_REGISTRY = {
    "pq_recon_error": (pq_recon_error, SQL_PQ_RECON_ERROR),
    "cms_freq_audit": (cms_freq_audit, SQL_CMS_FREQ_AUDIT),
    "silhouette_simplified": (silhouette_simplified, SQL_SILHOUETTE_SIMPLIFIED),
    "matryoshka_agreement": (matryoshka_agreement, SQL_MATRYOSHKA_AGREEMENT),
    "vec_dim_stats": (vec_dim_stats, SQL_VEC_DIM_STATS),
}
