"""Approximate-nearest-neighbor search over an embedding column
(``embeddings(vec_id, embedding: list<float>, label)``).

  * knn_bruteforce — exact cosine top-k baseline: the query matrix is
    ray.put-broadcast once; every batch does one float64 matmul against it
    (vectorized; zero shuffle). The scale path for moderate query counts.
  * knn_lsh — random-hyperplane LSH bucketing: each vector hashed to a
    signed-projection bucket (map_batches), queries probe their own bucket ±
    multiprobe neighbors; exact rerank inside the probed buckets. The scale
    path when the corpus is huge and queries many: bucket assignment is a
    narrow shuffle key, candidate rerank touches only matching buckets.

Ranking is deterministic: ties broken by neighbor id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def knn_bruteforce(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """→ (query_id, neighbor_id, rnk) top-k by cosine, exact."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids), qn))

    class Score:
        def __init__(self):
            self.qids, self.qn = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_col).to_pylist())
            mat = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
            sims = self.qn @ _normalize(mat).T  # (n_q, n_batch)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                for j in range(len(ids)):
                    if exclude_self and int(ids[j]) == int(qid):
                        continue
                    out_q.append(int(qid))
                    out_n.append(int(ids[j]))
                    out_s.append(float(sims[qi, j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    scored = emb.map_batches(Score, batch_format="pyarrow", concurrency=2)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = range(1, len(g) + 1)
        return g[["query_id", "neighbor_id", "rnk"]]

    out = scored.groupby("query_id").map_groups(topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    return pa.Table.from_pandas(out.astype("int64"), preserve_index=False)


def _hyperplanes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def lsh_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Signed-projection bucket id per vector (uint bucket of n_planes bits)."""
    bits = (vecs @ planes.T) >= 0
    out = np.zeros(len(vecs), dtype=np.int64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.int64) << i
    return out


def knn_lsh(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 2,
) -> pa.Table:
    """ANN: bucket corpus by hyperplane signs; probe the query's bucket plus
    all buckets within ``multiprobe`` bit flips; exact rerank among candidates.
    Returns (query_id, neighbor_id, rnk) — approximate (recall < 1).

    Sizing: candidates/query ≈ n × (probed buckets)/2^n_planes, so n_planes
    should grow ~log2(n) to hold the scanned fraction constant (6 planes is
    tuned to the test corpora; at 10^8 rows use ~14-16 and multiprobe 1).
    For large corpora prefer :func:`knn_ivf` — its trained coarse quantizer
    gives the same candidate bound with far better recall per probe."""
    sample = emb.take(1)[0]
    dim = len(sample[vec_col])
    planes = _hyperplanes(dim, n_planes)
    planes_ref = ray.put(planes)

    # stateless tasks (not an actor pool): two pools in one pipeline can
    # reserve every CPU and starve the read/sort stages; ray.get of the
    # broadcast ref is a zero-copy local-plasma hit per task
    def bucketize(batch: pa.Table) -> pa.Table:
        planes_l = ray.get(planes_ref)
        mat = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        b = lsh_bucket(mat, planes_l)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    bucketed = emb.map_batches(bucketize, batch_format="pyarrow")

    # query probe set
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qb = lsh_bucket(qn, planes)
    probe: dict[int, list[int]] = {}
    for qid, b in zip(query_ids, qb):
        bs = {int(b)}
        if multiprobe >= 1:
            for bit in range(n_planes):
                bs.add(int(b) ^ (1 << bit))
        if multiprobe >= 2:
            for b1 in range(n_planes):
                for b2 in range(b1 + 1, n_planes):
                    bs.add(int(b) ^ (1 << b1) ^ (1 << b2))
        for bb in bs:
            probe.setdefault(bb, []).append(int(qid))
    probe_ref = ray.put((probe, {int(q): qn[i] for i, q in enumerate(query_ids)}))

    def score_buckets(batch: pa.Table) -> pa.Table:
        probe_l, qvecs = ray.get(probe_ref)
        out_q, out_n, out_s = [], [], []
        ids = batch.column(id_col).to_pylist()
        buckets = batch.column("bucket").to_pylist()
        mat = _normalize(np.stack(batch.column(vec_col).to_pylist()).astype(np.float64))
        for j, (vid, b) in enumerate(zip(ids, buckets)):
            for qid in probe_l.get(int(b), ()):
                if int(vid) == qid:
                    continue
                out_q.append(qid)
                out_n.append(int(vid))
                out_s.append(float(qvecs[qid] @ mat[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    scored = bucketed.map_batches(score_buckets, batch_format="pyarrow")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("neighbor_id")
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = range(1, len(g) + 1)
        return g[["query_id", "neighbor_id", "rnk"]]

    out = scored.groupby("query_id").map_groups(topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    return pa.Table.from_pandas(out.astype("int64"), preserve_index=False)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 8, seed: int = 17) -> np.ndarray:
    """Deterministic mini k-means on normalized vectors (cosine ≙ dot):
    seeded init from the sample, fixed iteration count, empty clusters
    re-seeded deterministically. All numpy; runs once on the driver over a
    bounded sample — the trained "index" is then broadcast."""
    rng = np.random.RandomState(seed)
    sample = _normalize(sample.astype(np.float64))
    idx = rng.choice(len(sample), size=min(k, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        empties: list[int] = []
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
            else:
                empties.append(c)
        if empties:
            # deterministic re-seed, each empty cluster from a DISTINCT point
            # (farthest-first order): seeding several empties from the same
            # point would duplicate centroids and unbalance the lists
            order = np.argsort(sims.max(axis=1))
            for i, c in enumerate(empties):
                cents[c] = sample[int(order[i % len(order)])]
    return cents


def knn_ivf(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF ANN: train a coarse quantizer on a bounded sample (driver, once),
    assign each vector to its nearest centroid list (map_batches, broadcast
    centroids), probe the ``n_probe`` nearest lists per query, exact rerank
    among candidates. → (query_id, neighbor_id, rnk). At cluster scale the
    list id is the shuffle/partition key and only probed lists are read."""
    sample_rows = emb.limit(train_sample).to_pandas()
    sample = np.stack(sample_rows[vec_col].to_list())
    cents = _kmeans_lite(sample, n_lists)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _normalize(np.stack(batch.column(vec_col).to_pylist()).astype(np.float64))
        lists = (mat @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists, pa.int32()))

    assigned = emb.map_batches(assign, batch_format="pyarrow")

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qsims = qn @ cents.T
    probe: dict[int, list[int]] = {}
    for qi, qid in enumerate(query_ids):
        for lst in np.argsort(-qsims[qi])[:n_probe]:
            probe.setdefault(int(lst), []).append(int(qid))
    probe_ref = ray.put((probe, {int(q): qn[i] for i, q in enumerate(query_ids)}))

    def score(batch: pa.Table) -> pa.Table:
        probe_l, qvecs = ray.get(probe_ref)
        out_q, out_n, out_s = [], [], []
        ids = batch.column(id_col).to_pylist()
        lists = batch.column("ivf_list").to_pylist()
        mat = _normalize(np.stack(batch.column(vec_col).to_pylist()).astype(np.float64))
        for j, (vid, lst) in enumerate(zip(ids, lists)):
            for qid in probe_l.get(int(lst), ()):
                if int(vid) == qid:
                    continue
                out_q.append(qid)
                out_n.append(int(vid))
                out_s.append(float(qvecs[qid] @ mat[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    scored = assigned.map_batches(score, batch_format="pyarrow")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("neighbor_id")
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = range(1, len(g) + 1)
        return g[["query_id", "neighbor_id", "rnk"]]

    out = scored.groupby("query_id").map_groups(topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    return pa.Table.from_pandas(out.astype("int64"), preserve_index=False)
