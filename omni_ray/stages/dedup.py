"""Near-duplicate detection suite for training-data pipelines (SURVEY.md D7
future-work, built out as first-class operators):

  * exact           — content-hash groupby (already in pipelines/queries.py)
  * ngram Jaccard   — exact pairwise Jaccard over word-3-gram shingle sets via
                      a distributed inverted index (shingle → docs), the
                      verification ground truth
  * MinHash + LSH   — k permutations, banded; shingle→minhash per batch
                      (numpy-vectorized), explode to (band_id, band_hash,
                      doc_id), groupby band bucket → candidate pairs →
                      verified with exact Jaccard
  * SimHash         — 64-bit weighted-unigram simhash; banded by 4×16-bit
                      chunks; verified by Hamming distance
  * embedding cosine— near-dup pairs above a cosine threshold via blocked
                      numpy matmul against a broadcast matrix

Scale notes: every stage is shuffle-by-key (shingle / band bucket / simhash
band), never all-pairs; all-pairs work only happens INSIDE a bucket, and a
``max_bucket`` guard drops degenerate buckets (stop-shingle equivalent) with
a counter instead of exploding — the documented skew guard. The exact-Jaccard
verify joins candidates back to shingle sets by doc_id (broadcast at test
scale; hash-join by doc_id at cluster scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

MERSENNE = (1 << 61) - 1


def word_shingles(text: str, k: int = 3) -> set[str]:
    words = text.split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") % MERSENNE


def _perm_params(n_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: set[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """k-"permutation" minhash via (a*h+b) mod p on uint64 with wraparound
    (the standard numpy-vectorized scheme: wraparound makes it a hash family
    rather than a true permutation, which LSH only needs). Fully vectorized:
    one (n_perm × n_shingles) matrix op per document."""
    if not shingles:
        return np.full(len(a), MERSENNE, dtype=np.uint64)
    h = np.fromiter((_hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles))
    with np.errstate(over="ignore"):
        vals = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(MERSENNE)
    return vals.min(axis=1)


class MinHashLSH:
    """map_batches stage: text → minhash signature → (band_id, band_hash,
    doc_id) exploded rows. State (permutation params) built once per actor."""

    def __init__(self, n_perm: int = 64, n_bands: int = 16, text_col: str = "text",
                 id_col: str = "doc_id"):
        assert n_perm % n_bands == 0
        self.a, self.b = _perm_params(n_perm)
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        out_band, out_hash, out_id = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(word_shingles(text), self.a, self.b)
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_band.append(band)
                out_hash.append(bh)
                out_id.append(doc_id)
        bucket = [int(h[:4], 16) % 128 for h in out_hash]
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )


def _bucket_pairs(group: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """Candidate pairs within one hash bucket (a COARSE bucket holding many
    (band_id, band_hash) groups): vectorized dup-key detection first, Python
    pair expansion only for the (rare) colliding keys. Degenerate keys with
    more than ``max_bucket`` docs are dropped (skew guard). One call per
    coarse bucket — per-key map_groups calls would cost ~1.5 ms x #keys."""
    key_cols = [c for c in ("band_id", "band_hash") if c in group.columns]
    dup_mask = group.duplicated(key_cols, keep=False)
    dups = group[dup_mask]
    out_a: list[int] = []
    out_b: list[int] = []
    if len(dups):
        for _, g in dups.groupby(key_cols, sort=False):
            ids = sorted(set(g["doc_id"].tolist()))
            if len(ids) < 2 or len(ids) > max_bucket:
                continue
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    out_a.append(a)
                    out_b.append(b)
    return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                         "doc_b": pd.Series(out_b, dtype="int64")})


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> tuple[int, int]:
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter, union


def minhash_dedup_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    n_perm: int = 64,
    n_bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Full MinHash-LSH dedup: → verified (doc_a, doc_b, n_common, n_union)
    pairs with Jaccard ≥ threshold. Ties exact counts, so downstream can
    recompute the ratio exactly."""
    bands = docs.map_batches(
        MinHashLSH(n_perm, n_bands, text_col, id_col), batch_format="pyarrow"
    )
    cand = (
        bands.groupby("bucket")
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.drop_duplicates(["doc_a", "doc_b"]) if len(cand) else cand
    if not len(cand):
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "n_common": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64())}
        )
    # verify: join candidate ids back to texts (broadcast at this scale)
    texts = dict(
        zip(
            *[
                pd.concat([b.to_pandas() for b in docs.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow")])[c]
                for c in (id_col, text_col)
            ]
        )
    )
    rows = []
    for a_id, b_id in zip(cand["doc_a"], cand["doc_b"]):
        inter, union = exact_jaccard(texts.get(a_id, "") or "", texts.get(b_id, "") or "")
        if union and inter / union >= threshold:
            rows.append((int(a_id), int(b_id), inter, union))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "n_common": pa.array([r[2] for r in rows], pa.int64()),
            "n_union": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via inverted index (the ground truth / oracle twin)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    min_jaccard: float = 0.2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_posting: int = 500,
) -> pa.Table:
    """Exact pairwise Jaccard over word-k-gram shingle sets, computed as a
    distributed inverted index: explode (shingle, doc) → groupby(shingle) →
    per-posting pairs → groupby(pair).count = |A∩B| → join sizes (broadcast)
    → filter. Postings longer than ``max_posting`` are stop-shingles (skew
    guard). Returns (doc_a, doc_b, n_common, n_union), Jaccard ≥ min_jaccard.
    """

    def explode(t: pa.Table) -> pa.Table:
        ids, shs, buckets = [], [], []
        for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
            for s in word_shingles(txt or "", k):
                ids.append(i)
                shs.append(s)
                buckets.append(_hash64(s) % 256)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shingle": pa.array(shs, pa.string()),
            "bucket": pa.array(buckets, pa.int32()),
        })

    inv = docs.map_batches(explode, batch_format="pyarrow")

    def posting_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one call per COARSE shingle-hash bucket: vectorized dup filter,
        # Python pair expansion only on shared shingles (skew guard on
        # stop-shingles via max_posting)
        dup = g[g.duplicated("shingle", keep=False)]
        out_a: list[int] = []
        out_b: list[int] = []
        for _, gg in dup.groupby("shingle", sort=False):
            ids = sorted(set(gg["doc_id"].tolist()))
            if len(ids) < 2 or len(ids) > max_posting:
                continue
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64")})

    from ray.data.aggregate import Count

    common = (
        inv.groupby("bucket")
        .map_groups(posting_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_common"))
        .to_pandas()
    )
    # shingle-set sizes (small aggregate → broadcastable)
    sizes = (
        inv.groupby("doc_id").aggregate(Count(alias_name="n_shingles")).to_pandas()
    )
    size_map = dict(zip(sizes["doc_id"], sizes["n_shingles"]))
    if not len(common):
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "n_common": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64())}
        )
    common["n_union"] = [
        size_map[a] + size_map[b] - c
        for a, b, c in zip(common["doc_a"], common["doc_b"], common["n_common"])
    ]
    keep = common[common["n_common"] / common["n_union"] >= min_jaccard]
    keep = keep.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        keep[["doc_a", "doc_b", "n_common", "n_union"]].astype("int64"),
        preserve_index=False,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit simhash over word unigrams weighted by count."""
    from collections import Counter

    acc = np.zeros(64, dtype=np.int64)
    for word, cnt in Counter(text.split()).items():
        h = int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "big")
        for bit in range(64):
            acc[bit] += cnt if (h >> bit) & 1 else -cnt
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


class SimHashStage:
    """map_batches: text → simhash + 4×16-bit band values (for bucketing)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        hs = [simhash64(t) for t in texts]
        out = {
            "doc_id": pa.array(ids, pa.int64()),
            # int64-safe: shift into signed range
            "simhash": pa.array([h - (1 << 63) for h in hs], pa.int64()),
        }
        for band in range(4):
            out[f"band{band}"] = pa.array(
                [(h >> (band * 16)) & 0xFFFF for h in hs], pa.int32()
            )
        return pa.table(out)


def simhash_dedup_pairs(
    docs: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 500,
) -> pa.Table:
    """Near-dup pairs with Hamming distance ≤ max_hamming. By pigeonhole, any
    pair within distance 3 shares at least one of the 4 16-bit bands → bucket
    by each band value, pair within buckets, verify Hamming exactly."""
    sigs = docs.map_batches(SimHashStage(text_col, id_col), batch_format="pyarrow")
    sig_pdf = sigs.to_pandas()  # (doc_id, simhash) — narrow; needed for verify
    sim_map = {i: h + (1 << 63) for i, h in zip(sig_pdf["doc_id"], sig_pdf["simhash"])}

    frames = []
    for band in range(4):
        col = f"band{band}"

        def add_bucket(t: pa.Table, col=col) -> pa.Table:
            import pyarrow.compute as pc

            return t.append_column(
                "bucket", pc.cast(pc.bit_wise_and(t.column(col), 127), pa.int32())
            )

        def pairs_in_bucket(g: pd.DataFrame, col=col) -> pd.DataFrame:
            g = g.rename(columns={col: "band_hash"})
            return _bucket_pairs(g, max_bucket)

        b = (
            sigs.select_columns([col, "doc_id"])
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pandas")
        )
        pdf = b.to_pandas()
        if len(pdf):
            frames.append(pdf)
    if not frames:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
    cand = pd.concat(frames, ignore_index=True).drop_duplicates(["doc_a", "doc_b"])
    rows = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        d = bin(sim_map[a] ^ sim_map[b]).count("1")
        if d <= max_hamming:
            rows.append((int(a), int(b), d))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    emb: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Pairs (a<b) with cosine ≥ threshold: the full normalized matrix is
    ray.put-broadcast; each batch matmuls its rows against it (blocked
    all-pairs — at cluster scale swap in the LSH-bucketed variant from
    simsearch.py; this is the exact baseline)."""
    pdf = emb.select_columns([id_col, vec_col]).to_pandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_list()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms
    mat_ref = ray.put((ids, matn))

    class Block:
        def __init__(self):
            self.ids, self.matn = ray.get(mat_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch.column(id_col).to_pylist())
            bmat = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
            bn = np.linalg.norm(bmat, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            sims = (bmat / bn) @ self.matn.T
            ai, bj = np.nonzero(sims >= threshold)
            doc_a, doc_b = [], []
            for i, j in zip(ai, bj):
                a, b = int(bids[i]), int(self.ids[j])
                if a < b:
                    doc_a.append(a)
                    doc_b.append(b)
            return pa.table(
                {"doc_a": pa.array(doc_a, pa.int64()), "doc_b": pa.array(doc_b, pa.int64())}
            )

    out = emb.map_batches(Block, batch_format="pyarrow", concurrency=2).to_pandas()
    if len(out) == 0 or "doc_a" not in out.columns:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    out = out.drop_duplicates().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# duplicate_of assignment (D2: enhanced_article.duplicate_of semantics)
# ---------------------------------------------------------------------------


def duplicate_groups(pairs: pa.Table) -> pa.Table:
    """Fold verified near-dup pairs into connected components and assign
    ``duplicate_of`` = the component's minimum doc_id (the keeper), matching
    the reference's mark-first-keep-rest semantics (D2, content_hash dedup +
    enhanced_article.py:51). Union-find on the driver — the pair set is the
    (small) OUTPUT of LSH verification, not the corpus; at cluster scale with
    huge pair sets, iterate min-label propagation via groupby instead
    (ray_guide near-dup pattern)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra

    for a, b in zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()):
        union(int(a), int(b))
    rows = sorted((x, find(x)) for x in parent)
    dup_rows = [(x, r) for x, r in rows if x != r]
    return pa.table(
        {
            "doc_id": pa.array([x for x, _ in dup_rows], pa.int64()),
            "duplicate_of": pa.array([r for _, r in dup_rows], pa.int64()),
        }
    )
