"""Near-duplicate detection suite for training-data pipelines (SURVEY.md D7
future-work, built out as first-class operators):

  * exact           — content-hash groupby (already in pipelines/queries.py)
  * ngram Jaccard   — exact pairwise Jaccard over word-3-gram shingle sets via
                      a distributed inverted index (shingle → docs), the
                      verification ground truth
  * MinHash + LSH   — k permutations, banded; shingle→minhash per batch
                      (numpy-vectorized), explode to (band_id, band_hash,
                      doc_id), groupby band bucket → candidate pairs →
                      verified with exact Jaccard INSIDE the cluster
                      (broadcast pair map + one bucketed shuffle of the
                      candidate texts), never materialized on the driver
  * SimHash         — 64-bit weighted-unigram simhash (vectorized: cached
                      word-bit matrix, one matmul per doc); banded by 4×16-bit
                      chunks exploded into ONE bucketed shuffle that carries
                      the signature, so Hamming verification happens inside
                      the bucket's map_groups — no driver signature map
  * embedding cosine— near-dup pairs above a cosine threshold: hyperplane-LSH
                      candidate generation (T tables × B bits, id-only rows
                      through the shuffle), exact cosine rerank via the same
                      broadcast-pair bucketed verify; a blocked all-pairs
                      ``mode="exact"`` baseline exists for equivalence tests

Scale notes: every stage is shuffle-by-key (shingle / band bucket / simhash
band / hyperplane signature), never all-pairs; all-pairs work only happens
INSIDE a bucket, and a ``max_bucket`` guard drops degenerate buckets
(stop-shingle equivalent) — truncation is logged per dropped key
(logger ``omni_ray.dedup``) so skew-guard coverage loss is observable.
Verification never round-trips corpus data through the driver: the (small)
candidate pair list is broadcast via the object store, candidate payloads
flow through ONE bucketed shuffle and are verified inside ``map_groups``
(``_verify_pairs_broadcast``; ``_join_pairs_to_payload`` is the
``Dataset.join`` fallback for pair sets too large to broadcast).
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..arrowcols import col_np, vec_mat
from ..pipelines.queries import _pd_arrow
import ray.data

logger = logging.getLogger("omni_ray.dedup")

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
    more than ``max_bucket`` docs are dropped, LOGGED, and reported as a
    SENTINEL row (doc_a = -1, doc_b = dropped-key size) so the driver can see
    the coverage loss — oracle-exact callers (``strict=True``) turn sentinels
    into a loud failure instead of silently diverging from the exhaustive
    oracle. One call per coarse bucket — per-key map_groups calls would cost
    ~1.5 ms x #keys."""
    key_cols = [c for c in ("band_id", "band_hash") if c in group.columns]
    dup_mask = group.duplicated(key_cols, keep=False)
    dups = group[dup_mask]
    out_a: list[int] = []
    out_b: list[int] = []
    if len(dups):
        for key, g in dups.groupby(key_cols, sort=False):
            ids = sorted(set(g["doc_id"].tolist()))
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                logger.warning(
                    "dedup skew guard: dropping degenerate bucket key=%s with %d docs "
                    "(max_bucket=%d)", key, len(ids), max_bucket,
                )
                out_a.append(-1)
                out_b.append(len(ids))
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


# ---------------------------------------------------------------------------
# distributed pair→payload verification (shared by minhash / embedding)
# ---------------------------------------------------------------------------

# deserialized-broadcast cache, per WORKER process: ray.get of a plain Python
# object pickles on every call, so a per-batch get would re-deserialize the
# whole pair map O(batches) times. Keyed by ObjectRef hex; cleared-on-growth
# so long-lived workers can't accumulate stale maps unboundedly.
_BROADCAST_CACHE: dict[str, object] = {}
_BROADCAST_CACHE_MAX = 8


def _fetch_broadcast(ref):
    key = ref.hex()
    v = _BROADCAST_CACHE.get(key)
    if v is None:
        v = ray.get(ref)
        if len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.clear()
        _BROADCAST_CACHE[key] = v
    return v


# beyond this many candidate pairs, the broadcast-dict verify gives way to the
# Dataset.join path: the pair list would no longer be "output-sized" and the
# per-worker deserialized map would rival the corpus partition size
PAIR_BROADCAST_MAX = 2_000_000


def _collect_distinct_pairs(
    cand: ray.data.Dataset,
) -> tuple[list[tuple[int, int]], list[int]]:
    """Collect the candidate (doc_a, doc_b) rows (the SMALL output of LSH
    banding — the same size-class as the function's return value) and dedup
    on the driver. Corpus payloads never come with them. Returns
    (pairs, guard_hits) where guard_hits lists the sizes of degenerate
    buckets the skew guard dropped (sentinel rows with doc_a = -1)."""
    seen: set[tuple[int, int]] = set()
    guard_hits: list[int] = []
    for b in cand.iter_batches(batch_format="pyarrow"):
        for a, bb in zip(b.column("doc_a").to_pylist(), b.column("doc_b").to_pylist()):
            if a == -1:
                guard_hits.append(int(bb))
            else:
                seen.add((a, bb))
    return sorted(seen), guard_hits


def _verify_pairs_broadcast(
    pairs: list[tuple[int, int]],
    source: ray.data.Dataset,
    id_col: str,
    payload_col: str,
    verify_bucket_fn,
    n_buckets: int = 64,
) -> list[dict]:
    """Distributed pair verification in ONE narrow shuffle: broadcast the
    (small) pair list as a doc_id→[(pair_id, side)] map, explode ONLY the
    candidate docs' payloads to (pair_id, side, payload) rows inside
    map_batches, then verify per pair inside a coarse-bucketed map_groups
    (bucket = pair_id % n_buckets — a pair's two sides always co-locate).
    Corpus payloads for non-candidate docs are filtered out at the map stage
    and never shuffle; nothing round-trips through the driver.

    This replaces a 2×Dataset.join verify: same semantics, one exchange of
    candidate payloads instead of two full hash-join exchanges (whose
    per-query aggregator-actor spawn cost dominates at interactive scale).
    The pair list is broadcast state via the object store — a plain dict is
    PICKLED (not zero-copy), so each worker process caches the deserialized
    map once (``_fetch_broadcast``) instead of re-deserializing per batch;
    for pair sets too big to broadcast, fall back to
    _join_pairs_to_payload."""
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for pid, (a, b) in enumerate(pairs):
        by_doc.setdefault(int(a), []).append((pid, 0))
        by_doc.setdefault(int(b), []).append((pid, 1))
    ref = ray.put(by_doc)

    def explode_sides(t: pa.Table) -> pa.Table:
        m = _fetch_broadcast(ref)
        pids, sides, payloads = [], [], []
        ids = t.column(id_col).to_pylist()
        pls = t.column(payload_col).to_pylist()
        for i, pl in zip(ids, pls):
            for pid, side in m.get(int(i), ()):
                pids.append(pid)
                sides.append(side)
                payloads.append(pl)
        return pa.table({
            "pair_id": pa.array(pids, pa.int64()),
            "side": pa.array(sides, pa.int32()),
            "payload": pa.array(payloads, type=t.column(payload_col).type),
            "bucket": pa.array([p % n_buckets for p in pids], pa.int32()),
        })

    exploded = source.select_columns([id_col, payload_col]).map_batches(
        explode_sides, batch_format="pyarrow"
    )
    out = (
        exploded.groupby("bucket")
        .map_groups(_pd_arrow(verify_bucket_fn), batch_format="pandas")
        .take_all()
    )
    return out


def _join_pairs_to_payload(
    pairs: ray.data.Dataset,
    source: ray.data.Dataset,
    id_col: str,
    payload_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Hash-join candidate pairs back to their payloads on BOTH sides:
    pairs(doc_a, doc_b) ⋈ source → (doc_a, doc_b, payload_a, payload_b).
    Two ``Dataset.join`` exchanges; the pair side is the (small) LSH output,
    the source side is hash-partitioned — nothing lands on the driver.
    BOTH joins' aggregator actors coexist under streaming execution, so their
    combined CPU reservation must leave room for the map stages: fractional
    CPUs per aggregator, partition count sized to the cluster (≈CPUs/4 per
    join; at 4 test CPUs that is 2+2 aggregators at 0.25 CPU each)."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(32, cpus // 4))
    agg_args = {"num_cpus": 0.25}

    def _renamed(suffix: str):
        def r(t: pa.Table) -> pa.Table:
            return pa.table({
                f"doc_{suffix}": t.column(id_col).cast(pa.int64()),
                f"payload_{suffix}": t.column(payload_col),
            })

        return source.select_columns([id_col, payload_col]).map_batches(
            r, batch_format="pyarrow"
        )

    j1 = pairs.join(
        _renamed("a"), join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), aggregator_ray_remote_args=agg_args,
    )
    return j1.join(
        _renamed("b"), join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), aggregator_ray_remote_args=agg_args,
    )


def _sorted_pair_table(rows: list[tuple], cols: list[str]) -> pa.Table:
    rows.sort()
    return pa.table(
        {c: pa.array([r[i] for r in rows], pa.int64()) for i, c in enumerate(cols)}
    )


def _lsh_certify_threshold(n_bands: int, rows_per_band: int,
                           target_miss: float = 1e-3) -> float:
    """Similarity above which banded-LSH recall is ≥ 1 - target_miss:
    recall(s) = 1 - (1 - s^r)^b  ⇒  s* = (1 - target_miss^(1/b))^(1/r)."""
    return float((1.0 - target_miss ** (1.0 / n_bands)) ** (1.0 / rows_per_band))


def minhash_dedup_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    n_perm: int = 64,
    n_bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    strict: bool = False,
    pair_broadcast_max: int = PAIR_BROADCAST_MAX,
    max_bucket: int = 200,
) -> pa.Table:
    """Full MinHash-LSH dedup: → verified (doc_a, doc_b, n_common, n_union)
    pairs with Jaccard ≥ threshold. Ties exact counts, so downstream can
    recompute the ratio exactly. Verification is DISTRIBUTED: below
    ``pair_broadcast_max`` candidates, ``_verify_pairs_broadcast`` (broadcast
    pair map, one bucketed shuffle of candidate texts, exact Jaccard inside
    map_groups — no driver-side text dict); above it, the candidate set never
    lands on the driver at all — ``_join_pairs_to_payload`` hash-joins pairs
    to both payloads and a map_batches computes the exact Jaccard.

    ``strict=True`` certifies the output is EXHAUSTIVE (equal to an exact
    exhaustive pair scan), raising loudly when that cannot be guaranteed:
    (a) a skew-guard bucket drop occurred, or (b) a verified pair's Jaccard
    sits below the similarity where banded recall ≥ 0.999 — near-threshold
    pairs mean sibling pairs may have been missed probabilistically. Used by
    the oracle-backed query entries, which promise exact SQL parity."""
    bands = docs.map_batches(
        MinHashLSH(n_perm, n_bands, text_col, id_col), batch_format="pyarrow"
    )
    cand = bands.groupby("bucket").map_groups(
        _pd_arrow(lambda g: _bucket_pairs(g, max_bucket)), batch_format="pandas"
    ).materialize()
    n_cand = cand.count()
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "n_common": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64())}
    )

    if n_cand > pair_broadcast_max:
        verified_tbl = _minhash_verify_join(cand, docs, id_col, text_col, threshold)
    else:
        pairs, guard_hits = _collect_distinct_pairs(cand)
        if strict and guard_hits:
            raise RuntimeError(
                f"minhash strict mode: skew guard dropped {len(guard_hits)} "
                f"degenerate bucket(s) of sizes {sorted(guard_hits)[-5:]} — "
                "output is not exhaustive; raise max_bucket or drop strict"
            )
        if not pairs:
            return empty

        def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # per-side dedup BEFORE pairing: a corpus with a duplicated doc_id
            # would otherwise explode a pair to [side0, side0, side1] and
            # compare a payload against itself (same guard as embedding verify)
            g = g.drop_duplicates(["pair_id", "side"])
            out_p, out_c, out_u = [], [], []
            for pid, gg in g.groupby("pair_id", sort=False):
                if len(gg) < 2:
                    continue
                s = gg.sort_values("side")
                inter, union = exact_jaccard(s["payload"].iloc[0] or "",
                                             s["payload"].iloc[1] or "")
                if union and inter / union >= threshold:
                    out_p.append(int(pid))
                    out_c.append(inter)
                    out_u.append(union)
            return pd.DataFrame({"pair_id": pd.Series(out_p, dtype="int64"),
                                 "n_common": pd.Series(out_c, dtype="int64"),
                                 "n_union": pd.Series(out_u, dtype="int64")})

        verified = _verify_pairs_broadcast(pairs, docs, id_col, text_col, verify_bucket)
        rows = [
            (pairs[r["pair_id"]][0], pairs[r["pair_id"]][1], r["n_common"], r["n_union"])
            for r in verified
        ]
        verified_tbl = _sorted_pair_table(
            rows, ["doc_a", "doc_b", "n_common", "n_union"])

    if strict and verified_tbl.num_rows:
        s_star = _lsh_certify_threshold(n_bands, n_perm // n_bands)
        jac = (col_np(verified_tbl.column("n_common"), np.float64)
               / col_np(verified_tbl.column("n_union"), np.float64))
        n_band_pairs = int((jac < s_star).sum())
        if n_band_pairs:
            raise RuntimeError(
                f"minhash strict mode: {n_band_pairs} verified pair(s) have "
                f"Jaccard in [{threshold}, {s_star:.3f}) where banded recall "
                "< 0.999 — sibling near-threshold pairs may have been missed; "
                "the exhaustive-output contract cannot be certified"
            )
    return verified_tbl


def _minhash_verify_join(
    cand: ray.data.Dataset, docs: ray.data.Dataset,
    id_col: str, text_col: str, threshold: float,
) -> pa.Table:
    """Join-path verification for pair sets too large to broadcast: dedup
    candidate pairs with a coarse-bucket groupby (per-key Ray aggregation at
    millions of distinct pairs is the known trap — vectorized
    drop_duplicates inside the bucket instead), hash-join both payload
    sides, exact Jaccard in a map_batches. Guard sentinels (doc_a = -1)
    filtered at the first map."""
    import pyarrow.compute as pc

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_a"), -1))
        a = col_np(t.column("doc_a"), np.int64)
        b = col_np(t.column("doc_b"), np.int64)
        bkt = ((a * np.int64(2654435761) + b) % 256).astype(np.int32)
        return t.append_column("pbkt", pa.array(bkt, pa.int32()))

    distinct = (
        cand.map_batches(bucketize, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(
            _pd_arrow(lambda g: g.drop_duplicates(
                ["doc_a", "doc_b"])[["doc_a", "doc_b"]]),
            batch_format="pandas",
        )
    )
    joined = _join_pairs_to_payload(distinct, docs, id_col, text_col)

    def verify(t: pa.Table) -> pa.Table:
        pa_list = t.column("payload_a").to_pylist()
        pb_list = t.column("payload_b").to_pylist()
        out_a, out_b, out_c, out_u = [], [], [], []
        for a, b, ta, tb in zip(t.column("doc_a").to_pylist(),
                                t.column("doc_b").to_pylist(), pa_list, pb_list):
            inter, union = exact_jaccard(ta or "", tb or "")
            if union and inter / union >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_c.append(inter)
                out_u.append(union)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "n_common": pa.array(out_c, pa.int64()),
                         "n_union": pa.array(out_u, pa.int64())})

    rows = [
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_union"])
        for r in joined.map_batches(verify, batch_format="pyarrow").take_all()
    ]
    return _sorted_pair_table(rows, ["doc_a", "doc_b", "n_common", "n_union"])


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
        # one call per COARSE shingle-hash bucket. Pair expansion is numpy
        # (triu indices per posting), and counts are PARTIALLY AGGREGATED
        # inside the bucket (a pair sharing many shingles of this bucket
        # emits ONE row with n) — the global many-key groupby then sums few
        # rows per pair instead of counting millions of raw expansion rows.
        dup = g[g.duplicated("shingle", keep=False)]
        parts_a: list[np.ndarray] = []
        parts_b: list[np.ndarray] = []
        for sh, gg in dup.groupby("shingle", sort=False):
            ids = np.unique(gg["doc_id"].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > max_posting:
                logger.warning(
                    "ngram skew guard: dropping stop-shingle with %d docs "
                    "(max_posting=%d)", len(ids), max_posting,
                )
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            parts_a.append(ids[iu])
            parts_b.append(ids[ju])
        if not parts_a:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        raw = pd.DataFrame({"doc_a": np.concatenate(parts_a),
                            "doc_b": np.concatenate(parts_b)})
        out = raw.groupby(["doc_a", "doc_b"], sort=False).size().reset_index(name="n")
        out = out.astype({"doc_a": "int64", "doc_b": "int64", "n": "int64"})
        # re-bucket by the PAIR key for the global sum (a Ray aggregate over
        # millions of distinct (doc_a, doc_b) keys runs per-key reduce code
        # and dominates everything; a bucketed vectorized sum does not)
        out["pair_bucket"] = (
            (out["doc_a"] * 2654435761 + out["doc_b"]) % 256
        ).astype("int32")
        return out

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["doc_a", "doc_b"], sort=False)["n"].sum().reset_index(name="n_common")
        )
        return out.astype({"doc_a": "int64", "doc_b": "int64", "n_common": "int64"})

    from ray.data.aggregate import Count

    common = (
        inv.groupby("bucket")
        .map_groups(_pd_arrow(posting_pairs), batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(_pd_arrow(sum_pairs), batch_format="pandas")
        .to_pandas()
    )
    if not len(common):
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "n_common": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64())}
        )
    # shingle-set sizes for CANDIDATE docs only — the full per-doc count
    # table is corpus-sized, but Jaccard needs |A|,|B| just for docs that
    # appear in a pair, so filter by the (small, broadcast) candidate set
    # before anything reaches the driver
    cand_arr = pa.array(
        sorted(set(common["doc_a"]) | set(common["doc_b"])), pa.int64()
    )
    cand_ref = ray.put(cand_arr)

    def only_candidates(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.is_in(t.column("doc_id"), value_set=ray.get(cand_ref))
        )

    sizes = (
        inv.map_batches(only_candidates, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_shingles"))
        .to_pandas()
    )
    size_map = dict(zip(sizes["doc_id"], sizes["n_shingles"]))
    common["n_union"] = [
        size_map[a] + size_map[b] - c
        for a, b, c in zip(common["doc_a"], common["doc_b"], common["n_common"])
    ]
    keep = common[common["n_common"] / common["n_union"] >= min_jaccard]
    keep = keep.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        keep[["doc_a", "doc_b", "n_common", "n_union"]].astype("int64"),
        preserve_index=False,
    ).replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# word → ±1 bit-sign row (64,), cached per worker process; bounded so a huge
# vocabulary can't grow the heap unboundedly
_SIGN_CACHE: dict[str, np.ndarray] = {}
_SIGN_CACHE_MAX = 1 << 20


def _word_sign_bits(word: str) -> np.ndarray:
    v = _SIGN_CACHE.get(word)
    if v is None:
        digest = hashlib.md5(word.encode()).digest()[:8]
        # bit i of the big-endian uint64 == unpackbits(little) of reversed bytes
        bits = np.unpackbits(
            np.frombuffer(digest[::-1], dtype=np.uint8), bitorder="little"
        )
        v = (bits.astype(np.int64) * 2 - 1)
        if len(_SIGN_CACHE) >= _SIGN_CACHE_MAX:
            _SIGN_CACHE.clear()
        _SIGN_CACHE[word] = v
    return v


def simhash64(text: str) -> int:
    """64-bit simhash over word unigrams weighted by count. Vectorized: one
    (n_words × 64) sign matrix (rows cached across calls) and one matvec."""
    from collections import Counter

    counts = Counter(text.split())
    if not counts:
        return 0
    words = list(counts)
    m = np.stack([_word_sign_bits(w) for w in words])
    wts = np.fromiter((counts[w] for w in words), dtype=np.int64, count=len(words))
    acc = wts @ m
    bits = (acc > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(bits, bitorder="little").tobytes(), "little")


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


class SimHashExplode:
    """map_batches: text → FOUR rows per doc (band_id, band_val, doc_id,
    simhash, bucket) so all 4 pigeonhole bands travel through ONE bucketed
    shuffle, carrying the signature for in-bucket Hamming verification."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 256):
        self.text_col = text_col
        self.id_col = id_col
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = col_np(batch.column(self.id_col), np.int64)
        texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        hs = np.array([simhash64(t) for t in texts], dtype=np.uint64)
        n = len(ids)
        band_ids = np.repeat(np.arange(4, dtype=np.int32), n)
        doc_ids = np.tile(ids, 4)
        sims = np.tile(hs.view(np.int64) + np.int64(-(1 << 63)), 4)
        band_vals = np.concatenate(
            [((hs >> np.uint64(b * 16)) & np.uint64(0xFFFF)).astype(np.int32)
             for b in range(4)]
        )
        # mix band_id into the coarse bucket so band collisions spread
        buckets = ((band_vals.astype(np.int64) * 2654435761 + band_ids * 40503)
                   % self.n_buckets).astype(np.int32)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_val": pa.array(band_vals, pa.int32()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(sims, pa.int64()),
            "bucket": pa.array(buckets, pa.int32()),
        })


def _hamming_int64(xa: np.ndarray, xb: np.ndarray) -> np.ndarray:
    """Popcount of xor over int64 bit patterns (shift-invariant)."""
    x = np.bitwise_xor(xa, xb).view(np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def simhash_dedup_pairs(
    docs: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 500,
    strict: bool = False,
) -> pa.Table:
    """Near-dup pairs with Hamming distance ≤ max_hamming. By pigeonhole, any
    pair within distance 3 shares at least one of the 4 16-bit bands → all 4
    bands explode into ONE bucketed shuffle carrying the signature; pairing
    AND exact-Hamming verification happen inside the bucket's map_groups; a
    final (doc_a, doc_b) groupby dedups across bands. No driver-side
    signature map, single Dataset execution.

    Pigeonhole banding has recall 1 (no probabilistic miss band), so the ONLY
    way the output can diverge from an exhaustive scan is a skew-guard bucket
    drop — ``strict=True`` (the oracle-backed query path) raises loudly when
    one occurred, via sentinel rows (doc_a = -1) from the verify stage."""
    exploded = docs.map_batches(SimHashExplode(text_col, id_col), batch_format="pyarrow")

    def verify_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated(["band_id", "band_val"], keep=False)]
        out_a: list[int] = []
        out_b: list[int] = []
        out_sa: list[int] = []
        out_sb: list[int] = []
        for key, gg in dup.groupby(["band_id", "band_val"], sort=False):
            sub = gg.drop_duplicates("doc_id").sort_values("doc_id")
            ids = sub["doc_id"].to_numpy()
            sigs = sub["simhash"].to_numpy()
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                logger.warning(
                    "simhash skew guard: dropping degenerate band key=%s with %d "
                    "docs (max_bucket=%d)", key, len(ids), max_bucket,
                )
                # sentinel row → strict callers fail loudly on coverage loss
                out_a.append(-1)
                out_b.append(len(ids))
                out_sa.append(0)
                out_sb.append(0)
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.extend(ids[iu].tolist())
            out_b.extend(ids[ju].tolist())
            out_sa.extend(sigs[iu].tolist())
            out_sb.extend(sigs[ju].tolist())
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        ham = _hamming_int64(np.asarray(out_sa, dtype=np.int64),
                             np.asarray(out_sb, dtype=np.int64))
        out = pd.DataFrame({"doc_a": np.asarray(out_a, dtype=np.int64),
                            "doc_b": np.asarray(out_b, dtype=np.int64),
                            "hamming": ham.astype(np.int64)})
        return out[out["hamming"] <= max_hamming]

    # cross-band duplicates of a pair carry identical hamming values — dedup
    # the (small) verified output on the driver instead of a second shuffle
    verified = (
        exploded.groupby("bucket")
        .map_groups(_pd_arrow(verify_in_bucket), batch_format="pandas")
        .take_all()
    )
    guard_hits = sorted(r["doc_b"] for r in verified if r["doc_a"] == -1)
    if strict and guard_hits:
        raise RuntimeError(
            f"simhash strict mode: skew guard dropped {len(guard_hits)} "
            f"degenerate band bucket(s) of sizes {guard_hits[-5:]} — output "
            "is not exhaustive; raise max_bucket or drop strict"
        )
    rows = sorted({(r["doc_a"], r["doc_b"], r["hamming"]) for r in verified
                   if r["doc_a"] != -1})
    return _sorted_pair_table(list(rows), ["doc_a", "doc_b", "hamming"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


class _HyperplaneExplode:
    """map_batches: embedding → T rows (table_id, sig, vec_id) — id-only LSH
    candidate rows (the vector itself does NOT travel through the shuffle;
    exact rerank joins pairs back to vectors afterwards)."""

    def __init__(self, n_tables: int, n_bits: int, dim: int,
                 id_col: str, vec_col: str, n_buckets: int = 256, seed: int = 29):
        rng = np.random.RandomState(seed)
        # (T, B, dim) stack of hyperplane tables, built once per actor/task
        self.planes = rng.normal(size=(n_tables, n_bits, dim))
        self.n_tables = n_tables
        self.n_bits = n_bits
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = col_np(batch.column(self.id_col), np.int64)
        mat = vec_mat(batch.column(self.vec_col))
        n = len(ids)
        powers = (1 << np.arange(self.n_bits, dtype=np.int64))
        t_ids, sigs, d_ids = [], [], []
        for t in range(self.n_tables):
            bits = (mat @ self.planes[t].T) >= 0  # (n, B)
            sig = bits.astype(np.int64) @ powers
            t_ids.append(np.full(n, t, dtype=np.int32))
            sigs.append(sig)
            d_ids.append(ids)
        t_ids = np.concatenate(t_ids)
        sigs = np.concatenate(sigs)
        d_ids = np.concatenate(d_ids)
        buckets = ((sigs * 2654435761 + t_ids.astype(np.int64) * 97) %
                   self.n_buckets).astype(np.int32)
        return pa.table({
            "band_id": pa.array(t_ids, pa.int32()),
            "band_hash": pa.array(sigs.astype(np.int64), pa.int64()),
            "doc_id": pa.array(d_ids, pa.int64()),
            "bucket": pa.array(buckets, pa.int32()),
        })


def embedding_neardup_pairs(
    emb: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "lsh",
    n_tables: int = 16,
    n_bits: int | None = None,
    max_bucket: int = 2000,
    n_docs: int | None = None,
    strict: bool = False,
    pair_broadcast_max: int = PAIR_BROADCAST_MAX,
) -> pa.Table:
    """Pairs (a<b) with cosine ≥ threshold.

    ``mode="lsh"`` (default, the 100-TB path): hyperplane-LSH candidate
    generation — T tables × B bits, id-only rows through one bucketed
    shuffle — then exact cosine verification of the candidates inside a
    bucketed map_groups (``_verify_pairs_broadcast``); nothing is
    materialized on the driver.

    ``n_bits`` defaults to ~log2(n)+3: signature space ≈ 8× the corpus, so
    a random pair collides in ≈ n_tables/8n of the tables — the candidate
    set stays O(true dups), independent of corpus size. (A FIXED bit width
    is a scale trap: at 8 bits a million random vectors all-pair inside 256
    buckets, and the skew guard would then drop them wholesale.) Recall for
    a pair at cos = 0.95 (bit-agreement p ≈ 0.899): 1-(1-p^B)^T ≈ 0.96 at
    B=14/T=16 — and → 1 as cos → 1, which is where true near-dups live;
    raise n_tables for tighter recall at the threshold boundary.

    ``mode="exact"``: blocked all-pairs matmul against a ray.put-broadcast
    matrix — the exact baseline used by the equivalence pytest; test-scale
    only (pulls the matrix to the driver once).
    """
    if mode == "exact":
        return _embedding_neardup_exact(emb, threshold, id_col, vec_col)

    sample = emb.take(1)
    if not sample:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    dim = len(sample[0][vec_col])
    if n_bits is None:
        # n_docs hint (e.g. parquet metadata row count) skips a whole
        # Dataset execution; an order-of-magnitude estimate is plenty
        if n_docs is None:
            n_docs = emb.count()
        n_bits = max(10, int(np.ceil(np.log2(max(n_docs, 2)))) + 3)

    exploded = emb.map_batches(
        _HyperplaneExplode(n_tables, n_bits, dim, id_col, vec_col),
        batch_format="pyarrow",
    )
    cand = exploded.groupby("bucket").map_groups(
        _pd_arrow(lambda g: _bucket_pairs(g, max_bucket)), batch_format="pandas"
    ).materialize()
    n_cand = cand.count()
    if n_cand > pair_broadcast_max:
        # pair set too large to broadcast: never lands on the driver —
        # hash-join both vector sides, exact cosine in a map_batches
        return _embedding_verify_join(cand, emb, id_col, vec_col, threshold)
    pairs, guard_hits = _collect_distinct_pairs(cand)
    if strict and guard_hits:
        raise RuntimeError(
            f"embedding strict mode: skew guard dropped {len(guard_hits)} "
            f"degenerate LSH bucket(s) of sizes {sorted(guard_hits)[-5:]} — "
            "output is not exhaustive; raise max_bucket or drop strict"
        )
    if not pairs:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the bucket: pivot the two sides into aligned
        # matrices, one batched dot product (pairs missing a side drop out
        # of the inner merge)
        a_side = g[g["side"] == 0].drop_duplicates("pair_id")
        b_side = g[g["side"] == 1].drop_duplicates("pair_id")
        merged = a_side.merge(b_side, on="pair_id", suffixes=("_a", "_b"))
        if not len(merged):
            return pd.DataFrame({"pair_id": pd.Series(dtype="int64")})
        va = _normalize_rows(np.stack(merged["payload_a"].to_list()).astype(np.float64))
        vb = _normalize_rows(np.stack(merged["payload_b"].to_list()).astype(np.float64))
        cos = (va * vb).sum(axis=1)
        return pd.DataFrame(
            {"pair_id": merged["pair_id"].to_numpy()[cos >= threshold].astype("int64")}
        )

    verified = _verify_pairs_broadcast(pairs, emb, id_col, vec_col, verify_bucket)
    rows = sorted(
        {(min(pairs[r["pair_id"]]), max(pairs[r["pair_id"]])) for r in verified}
    )
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], pa.int64()),
    })


def _embedding_verify_join(
    cand: ray.data.Dataset, emb: ray.data.Dataset,
    id_col: str, vec_col: str, threshold: float,
) -> pa.Table:
    """Join-path exact-cosine verification for candidate sets too large to
    broadcast. Vectors are PACKED to float64 binary before the hash join
    (acero join aggregators reject list<float> payload columns) and unpacked
    inside the verifying map_batches. Pair dedup happens in a coarse-bucket
    groupby (vectorized drop_duplicates — never per-key Ray aggregation)."""
    import pyarrow.compute as pc

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_a"), -1))
        a = col_np(t.column("doc_a"), np.int64)
        b = col_np(t.column("doc_b"), np.int64)
        bkt = ((a * np.int64(2654435761) + b) % 256).astype(np.int32)
        return t.append_column("pbkt", pa.array(bkt, pa.int32()))

    distinct = (
        cand.map_batches(bucketize, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(
            _pd_arrow(lambda g: g.drop_duplicates(
                ["doc_a", "doc_b"])[["doc_a", "doc_b"]]),
            batch_format="pandas",
        )
    )

    def pack(t: pa.Table) -> pa.Table:
        mat = vec_mat(t.column(vec_col))
        return pa.table({
            id_col: t.column(id_col),
            vec_col: pa.array([row.tobytes() for row in mat], pa.binary()),
        })

    packed = emb.map_batches(pack, batch_format="pyarrow")
    joined = _join_pairs_to_payload(distinct, packed, id_col, vec_col)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        va = _normalize_rows(np.stack(
            [np.frombuffer(b, dtype=np.float64) for b in t.column("payload_a").to_pylist()]
        ))
        vb = _normalize_rows(np.stack(
            [np.frombuffer(b, dtype=np.float64) for b in t.column("payload_b").to_pylist()]
        ))
        cos = (va * vb).sum(axis=1)
        keep = cos >= threshold
        a = col_np(t.column("doc_a"), np.int64)[keep]
        b = col_np(t.column("doc_b"), np.int64)[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"doc_a": pa.array(lo, pa.int64()),
                         "doc_b": pa.array(hi, pa.int64())})

    rows = sorted(
        {(r["doc_a"], r["doc_b"])
         for r in joined.map_batches(verify, batch_format="pyarrow").take_all()}
    )
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], pa.int64()),
    })


def _embedding_neardup_exact(
    emb: ray.data.Dataset, threshold: float, id_col: str, vec_col: str
) -> pa.Table:
    """Exact all-pairs baseline: full normalized matrix ray.put-broadcast,
    each batch matmuls its rows against it. Test-scale equivalence oracle for
    the LSH path — NOT the cluster path (driver pulls the matrix once)."""
    pdf = emb.select_columns([id_col, vec_col]).to_pandas()
    ids = pdf[id_col].to_numpy()
    matn = _normalize_rows(np.stack(pdf[vec_col].to_list()).astype(np.float64))
    mat_ref = ray.put((ids, matn))

    class Block:
        def __init__(self):
            self.ids, self.matn = ray.get(mat_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = col_np(batch.column(id_col))
            bmat = _normalize_rows(vec_mat(batch.column(vec_col)))
            sims = bmat @ self.matn.T
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
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# duplicate_of assignment (D2: enhanced_article.duplicate_of semantics)
# ---------------------------------------------------------------------------


def duplicate_groups(pairs: pa.Table) -> pa.Table:
    """Fold verified near-dup pairs into connected components and assign
    ``duplicate_of`` = the component's minimum doc_id (the keeper), matching
    the reference's mark-first-keep-rest semantics (D2, content_hash dedup +
    enhanced_article.py:51). Union-find on the driver — appropriate when the
    pair set is the (small) OUTPUT of LSH verification; for huge pair sets
    use :func:`duplicate_groups_distributed` (hash-to-min label propagation,
    all Dataset ops)."""
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


def duplicate_groups_distributed(
    pairs: ray.data.Dataset, max_iters: int = 50
) -> ray.data.Dataset:
    """Connected components over a HUGE verified-pair set with pure Dataset
    ops: "hash-to-min" label propagation (Rastogi et al., Finding Connected
    Components in MapReduce) — each node's cluster view shrinks to the
    component minimum in O(log n) groupby rounds; no driver union-find.

    State per round: rows (node, member). Init from the edge list with self
    rows. Round: per node, mn = min(members ∪ {node}); emit (mn, m) for
    every member and (m, mn) for every member; distinct. Converges when the
    row multiset stops changing (checked with a tiny count+sum aggregate).
    Returns (doc_id, duplicate_of) for non-keeper nodes, duplicate_of =
    component min.

    The per-node step runs VECTORIZED over coarse buckets (node % 256 — node
    groups never span buckets): a pandas groupby-min + two column maps per
    bucket, never a per-node map_groups call (per-group overhead ≈1.5 ms ×
    #nodes would be fatal at 10^6 pairs)."""

    N_CC_BUCKETS = 256

    def seed(t: pa.Table) -> pa.Table:
        a = col_np(t.column("doc_a"), np.int64)
        b = col_np(t.column("doc_b"), np.int64)
        node = np.concatenate([a, b])
        member = np.concatenate([b, a])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "member": pa.array(member, pa.int64())})

    state = pairs.map_batches(seed, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        node = col_np(t.column("node"), np.int64)
        return t.append_column(
            "bucket", pa.array((node % N_CC_BUCKETS).astype(np.int32), pa.int32())
        )

    def bucket_step(g: pd.DataFrame) -> pd.DataFrame:
        # one call per coarse bucket; everything inside is columnar pandas.
        # Input rows are deduped HERE (all duplicates of a (node, member) row
        # share the node → same bucket), so no global many-key distinct
        # groupby is needed — a groupby over millions of distinct keys runs
        # per-key reduce code and would dominate the whole computation.
        g = g.drop_duplicates(["node", "member"])
        nodes = g["node"].to_numpy()
        members = g["member"].to_numpy()
        uniq = np.unique(nodes)
        all_nodes = np.concatenate([nodes, uniq])      # + self rows
        all_members = np.concatenate([members, uniq])
        df = pd.DataFrame({"node": all_nodes, "member": all_members})
        gmin = df.groupby("node")["member"].min()
        mn = df["node"].map(gmin).to_numpy()
        out = pd.DataFrame({
            "node": np.concatenate([mn, df["member"].to_numpy()]),
            "member": np.concatenate([df["member"].to_numpy(), mn]),
        })
        return out.drop_duplicates()


    def signature(ds: ray.data.Dataset) -> tuple[int, int]:
        # collision-resistant multiset signature: count + wraparound-uint64
        # sum of a mixed per-row hash. Plain keyed sums (sum(node),
        # sum(member)) are NOT sound — two distinct states that swap members
        # between rows collide, and Ray's Sum goes through float64 (lossy
        # past 2^53). Per-block partials are exact python ints via take_all
        # of one tiny row per block.
        def block_sig(t: pa.Table) -> pa.Table:
            node = col_np(t.column("node"), np.uint64)
            member = col_np(t.column("member"), np.uint64)
            with np.errstate(over="ignore"):
                mixed = node * np.uint64(0x9E3779B97F4A7C15) ^ (
                    member * np.uint64(0xC2B2AE3D27D4EB4F)
                )
                # wraparound sum (mod 2^64) — a commutative MULTISET hash,
                # so even an unexpected duplicate row cannot cancel out
                part = int(np.add.reduce(mixed + np.uint64(1), dtype=np.uint64)) if len(mixed) else 0
            return pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "sig": pa.array([part], pa.uint64()),
            })

        rows = ds.map_batches(block_sig, batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in rows)
        sig = 0
        for r in rows:
            sig = (sig + int(r["sig"])) % (1 << 64)
        return (n, sig)

    prev_sig = None
    converged = False
    for _ in range(max_iters):
        state = (
            state.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_pd_arrow(bucket_step), batch_format="pandas")
            .materialize()
        )
        sig = signature(state)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        logger.warning(
            "duplicate_groups_distributed: max_iters=%d exhausted without a "
            "fixpoint — labels may not be component minima", max_iters,
        )

    def bucket_labels(g: pd.DataFrame) -> pd.DataFrame:
        # per-node min, vectorized per bucket (a groupby("node").Min() here
        # would run per-key reduce code over millions of keys)
        gmin = g.groupby("node")["member"].min().reset_index()
        gmin.columns = ["doc_id", "duplicate_of"]
        return gmin[gmin["duplicate_of"] < gmin["doc_id"]]

    return (
        state.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pd_arrow(bucket_labels), batch_format="pandas")
        .select_columns(["doc_id", "duplicate_of"])
    )
