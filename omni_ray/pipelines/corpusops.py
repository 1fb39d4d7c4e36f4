"""Corpus-statistics and relational operators, round 3 batch 2: document
fingerprinting (mod-p k-gram sampling, Broder/winnowing family), unigram
LM scoring, bounded-vocabulary OOV coverage, one-step k-means assignment
(integer-exact), text normalization, plus three relational shapes the suite
lacked (semi join, ROLLUP, per-group mode). Every operator is oracle-backed:
column names and integer-quantized values match the DuckDB SQL exactly.

Scale notes are per-docstring; the common rules: reads are column-pruned,
token/term intermediates are combined map-side before any groupby, bounded
small sides (vocab, centroids) are broadcast via ray.put, unbounded small
sides (term frequencies) travel through a hash join, and every float that
reaches the output is quantized to int64 on BOTH engines.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .queries import _pd_arrow
import ray.data
from ray.data.aggregate import Count, Max, Sum

from .mlqueries import _docs, _n_blocks
from ..stages.dedup import _fetch_broadcast

_WORD = re.compile(r"[a-z]+")


# -- document fingerprinting (mod-p sampled k-gram hashes) -------------------


def fingerprint_pairs(sf_dir: str):
    """Cross-document shared-fingerprint pairs — the Broder document-
    fingerprinting scheme (the sampled-shingle family winnowing belongs to):
    hash every 5-word-gram, keep the deterministic 1/16 sample whose md5
    starts with '0' (mod-p selection needs no corpus pass and is stable
    under sharding), then count fingerprints shared by each document pair.

    Shape at scale: gram rows are deduped per doc INSIDE the batch (set),
    the only shuffle is the groupby on fingerprint, and pair expansion runs
    per-fingerprint-group with a loud skew assertion (a fingerprint shared
    by >1000 docs means a boilerplate gram that belongs in a stoplist, not
    a silent O(n^2) blowup)."""
    ds = _docs(sf_dir)

    def grams(t: pa.Table) -> pa.Table:
        doc_ids, fps = [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            w = _WORD.findall((x or "").lower())
            sel = {
                h
                for i in range(len(w) - 4)
                for h in (hashlib.md5(" ".join(w[i : i + 5]).encode()).hexdigest(),)
                if h.startswith("0")
            }
            doc_ids.extend([d] * len(sel))
            fps.extend(sorted(sel))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "fp": pa.array(fps, pa.string()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        assert len(ids) <= 1000, (
            f"fingerprint {g['fp'].iloc[0]!r} shared by {len(ids)} docs: "
            "boilerplate gram — add a stoplist pass instead of pairing"
        )
        if len(ids) < 2:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
            })
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a].astype("int64"),
                             "doc_b": ids[b].astype("int64")})

    out = (
        ds.map_batches(grams, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(_pd_arrow(pairs), batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_shared"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_FINGERPRINT_PAIRS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS w
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                               i -> md5(array_to_string(w[i:i+4], ' ')))) AS fp
  FROM toks
), sel AS (
  SELECT DISTINCT doc_id, fp FROM grams WHERE fp LIKE '0%'
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# -- text normalization (canonical form + hash) ------------------------------


def text_normalize(sf_dir: str):
    """Canonical text form for normalization-aware dedup: lowercase, strip
    every char outside [a-z0-9 whitespace], collapse whitespace runs, trim;
    emit the canonical length and md5. Pure RE2 kernels over the zero-copy
    Arrow batch (pyarrow.compute and DuckDB regexp_* are both RE2, so the
    SAME pattern strings are bit-identical on both engines), no shuffle."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(t["text"], ""))
        norm = pc.replace_substring_regex(txt, r"[^a-z0-9\s]", "")
        norm = pc.replace_substring_regex(norm, r"\s+", " ")
        norm = pc.utf8_trim_whitespace(norm)
        hashes = [hashlib.md5(x.encode()).hexdigest() for x in norm.to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_len": pc.cast(pc.utf8_length(norm), pa.int64()),
            "norm_hash": pa.array(hashes, pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


SQL_TEXT_NORMALIZE = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
              '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, length(norm) AS norm_len, md5(norm) AS norm_hash FROM n
"""


# -- unigram LM scoring (corpus log-probability per document) ----------------


def unigram_logprob(sf_dir: str, small_side_max: int = 200_000):
    """Per-document unigram log-probability — the KenLM-style perplexity
    filter's SQL-expressible core. Two passes over term rows materialized
    once: (1) corpus term frequencies (the LM) via one groupby over
    map-side-combined (doc, term, tf) rows; (2) each doc's score. The
    scoring side auto-switches like pmi_top_pairs: an output-sized LM
    (≤ small_side_max distinct terms) is broadcast and looked up map-side
    (the suite's 5.7 s was mostly the join pools); a row-sized LM flows
    through the term hash join + per-doc Sum. log p quantized half-up at
    1e6 (same ln-on-double rule the green tfidf oracle uses); scores are
    exact int64 from there. A pytest pins both paths identical."""
    from collections import Counter

    ds = _docs(sf_dir)

    def tf_rows(t: pa.Table) -> pa.Table:
        doc_ids, terms, tfs = [], [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            c = Counter(_WORD.findall((x or "").lower()))
            doc_ids.extend([d] * len(c))
            terms.extend(c.keys())
            tfs.extend(c.values())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    from .queries import _bucketed_agg

    tf = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    # term domain is row-sized -> bucketed combiner, not groupby().aggregate
    freq = _bucketed_agg(tf, ["term"], {"cnt": ("tf", "sum")})
    total = int(tf.aggregate(Sum("tf", alias_name="t"))["t"])

    def logp(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy().astype(np.float64)
        q = np.floor(np.log(c / float(total)) * 1_000_000 + 0.5).astype(np.int64)
        return pa.table({"term": t["term"], "logp_q": pa.array(q, pa.int64())})

    lp = freq.map_batches(logp, batch_format="pyarrow")
    # same adaptive rule as pmi_top_pairs: an output-sized vocabulary (the
    # LM itself, term->logp) is broadcast and looked up map-side; a
    # row-sized vocabulary must flow through the hash join
    if freq.count() <= small_side_max:
        lm: dict = {}
        # iter_batches, not to_arrow_refs: the bucketed combiner can emit
        # EMPTY pandas-backed blocks, which to_arrow_refs hands back
        # unconverted (no columns -> KeyError); iter_batches coerces
        for tbl in lp.iter_batches(batch_format="pyarrow"):
            lm.update(zip(tbl["term"].to_pylist(),
                          tbl["logp_q"].to_pylist()))
        lm_ref = ray.put(lm)

        def score_local(t: pa.Table) -> pa.Table:
            m = _fetch_broadcast(lm_ref)
            lpv = np.fromiter(
                (m[x] for x in t["term"].to_pylist()), dtype=np.int64,
                count=t.num_rows)
            return pa.table({
                "doc_id": t["doc_id"],
                "tf": t["tf"],
                "part": pa.array(t["tf"].to_numpy() * lpv, pa.int64()),
            })

        parts = tf.map_batches(score_local, batch_format="pyarrow")
    else:
        scored = tf.join(lp, join_type="inner", on=("term",),
                         num_partitions=8)

        def mul(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "doc_id": t["doc_id"],
                "tf": t["tf"],
                "part": pc.multiply(t["tf"], t["logp_q"]),
            })

        parts = scored.map_batches(mul, batch_format="pyarrow")

    out = _bucketed_agg(
        parts,
        ["doc_id"],
        {"n_tokens": ("tf", "sum"), "logprob_q": ("part", "sum")},
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), freq AS (
  SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1
), total AS (SELECT sum(tf) AS t FROM tf)
SELECT tf.doc_id,
       CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
       CAST(sum(tf.tf * CAST(floor(ln(CAST(freq.cnt AS DOUBLE) / total.t) * 1000000 + 0.5)
                        AS BIGINT)) AS BIGINT) AS logprob_q
FROM tf JOIN freq USING (term) CROSS JOIN total
GROUP BY 1
"""


# -- bounded-vocabulary coverage (OOV rate) ----------------------------------

_VOCAB_V = 20


def vocab_coverage(sf_dir: str):
    """Per-document coverage against the top-V corpus vocabulary — the
    tokenizer-fit / OOV-rate operator. The vocabulary is bounded by
    construction (top V=20 by frequency, term-asc tie-break), so it is
    collected once (V rows, not the corpus), broadcast via ray.put, and the
    scoring pass streams with zero shuffle. Zero-token docs stay in the
    output with (0, 0) — the oracle left-joins for the same reason."""
    ds = _docs(sf_dir)

    def term_counts(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for x in t["text"].to_pylist():
            c.update(_WORD.findall((x or "").lower()))
        return pa.table({
            "term": pa.array(list(c.keys()), pa.string()),
            "cnt": pa.array(list(c.values()), pa.int64()),
        })

    from .queries import _bucketed_agg

    freq = _bucketed_agg(
        ds.map_batches(term_counts, batch_format="pyarrow"),
        ["term"], {"cnt": ("cnt", "sum")},
    )
    top = freq.sort(["cnt", "term"], descending=[True, False]).limit(_VOCAB_V)
    vocab = frozenset(r["term"] for r in top.take_all())
    vocab_ref = ray.put(vocab)

    def cover(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        n_tok, n_in = [], []
        for x in t["text"].to_pylist():
            w = _WORD.findall((x or "").lower())
            n_tok.append(len(w))
            n_in.append(sum(1 for y in w if y in v))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_in_vocab": pa.array(n_in, pa.int64()),
        })

    return ds.map_batches(cover, batch_format="pyarrow")


SQL_VOCAB_COVERAGE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS term
  FROM documents
), freq AS (
  SELECT term, count(*) AS cnt FROM toks GROUP BY 1
), vocab AS (
  SELECT term FROM freq ORDER BY cnt DESC, term LIMIT 20
), per_doc AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS n_in_vocab
  FROM toks t LEFT JOIN vocab v ON t.term = v.term
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_tokens, 0)   AS n_tokens,
       CAST(coalesce(p.n_in_vocab, 0) AS BIGINT) AS n_in_vocab
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


# -- one-step k-means assignment (integer-exact) -----------------------------

_KMEANS_K = 8


def kmeans_assign(sf_dir: str):
    """Nearest-centroid assignment over the embeddings table — one exact
    k-means E-step, the operator the IVF coarse quantizer iterates.
    Centroids are the K=8 lowest-vec_id vectors (deterministic seed; a real
    run would loop this with re-centroiding). Every component is quantized
    half-up at 1e6 to int64 on BOTH engines, so squared-L2 distances are
    exact integers and argmin (tie-break lowest centroid id) cannot drift
    with float summation order. Centroids: bounded collect (K rows),
    broadcast once via ray.put; assignment is one zero-shuffle vectorized
    pass (numpy (n,k,d) reduction per batch)."""
    from .mlqueries import _emb

    ds = _emb(sf_dir)
    cent_rows = ds.sort("vec_id").limit(_KMEANS_K).take_all()
    cent_q = np.stack([
        np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6 + 0.5)
        for r in cent_rows
    ]).astype(np.int64)
    cent_ids = np.array([r["vec_id"] for r in cent_rows], dtype=np.int64)
    cent_ref = ray.put((cent_ids, cent_q))

    def assign(t: pa.Table) -> pa.Table:
        ids, cq = ray.get(cent_ref)
        col = t["embedding"].combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "dist_q": pa.array([], pa.int64()),
            })
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // max(n, 1)
        q = np.floor(flat.reshape(n, d).astype(np.float64) * 1e6 + 0.5).astype(
            np.int64
        )
        diff = q[:, None, :] - cq[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        best = dist.argmin(axis=1)  # first (lowest index = lowest vec_id) wins ties
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster": pa.array(ids[best], pa.int64()),
            "dist_q": pa.array(dist[np.arange(n), best], pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def _quantize_batch(t: pa.Table):
    """(vec_ids, quantized int64 matrix) for one embeddings batch."""
    col = t["embedding"].combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    d = len(flat) // max(n, 1)
    q = np.floor(flat.reshape(n, d).astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    return t["vec_id"].to_numpy(zero_copy_only=False), q


def kmeans_lloyd(sf_dir: str):
    """FULL Lloyd's k-means over the embeddings table — the iterative
    training loop kmeans_assign is one step of: 3 assignment passes with 2
    re-centerings between them, every arithmetic step integer-exact so the
    DuckDB oracle replays the identical trajectory.

    Exactness rules (BOTH engines): components quantized half-up at 1e6 to
    int64; distances are exact integer squared-L2 with argmin tie-break on
    lowest centroid id; a new centroid component is floor(sum/n + 0.5) of
    its members' quantized values (IEEE double division of exact-integer
    operands — identical in numpy and DuckDB); an emptied cluster keeps its
    previous centroid. Output is the per-cluster summary of the final
    assignment (cluster, n_members, inertia_q).

    Scale shape: each iteration is ONE zero-shuffle map_batches pass whose
    batches emit the per-cluster M-step COMBINER rows (cluster, count,
    64 component sums packed as a list) — ≤K rows per batch; the driver
    folds K×n_batches tiny rows and re-broadcasts K centroids via ray.put.
    The embeddings Dataset is materialized once and reused across passes.
    Per-cluster inertia folds in Python ints (no int64 overflow at any sf)."""
    from .mlqueries import _emb

    ds = _emb(sf_dir).materialize()
    cent_rows = ds.sort("vec_id").limit(_KMEANS_K).take_all()
    cent_q = np.stack([
        np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6 + 0.5)
        for r in cent_rows
    ]).astype(np.int64)
    cent_ids = np.array([r["vec_id"] for r in cent_rows], dtype=np.int64)

    def estep_partials(t: pa.Table, ref) -> pa.Table:
        """Assign each row to its nearest centroid; emit per-cluster
        combiner rows: count, component sums, inertia contribution."""
        ids, cq = _fetch_centroids(ref)
        _vecs, q = _quantize_batch(t)
        if len(q) == 0:
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "inertia_q": pa.array([], pa.int64()),
                "sums": pa.array([], pa.list_(pa.int64())),
            })
        diff = q[:, None, :] - cq[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        best = dist.argmin(axis=1)
        rows = {"cluster": [], "n": [], "inertia_q": [], "sums": []}
        for k in np.unique(best):
            mask = best == k
            rows["cluster"].append(int(ids[k]))
            rows["n"].append(int(mask.sum()))
            rows["inertia_q"].append(int(dist[mask, k].sum()))
            rows["sums"].append(q[mask].sum(axis=0).tolist())
        return pa.table({
            "cluster": pa.array(rows["cluster"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "inertia_q": pa.array(rows["inertia_q"], pa.int64()),
            "sums": pa.array(rows["sums"], pa.list_(pa.int64())),
        })

    def run_pass(cq: np.ndarray) -> pd.DataFrame:
        ref = ray.put((cent_ids, cq))
        return ds.map_batches(
            lambda t, r=ref: estep_partials(t, r), batch_format="pyarrow"
        ).to_pandas()

    for _ in range(2):  # two re-centerings
        parts = run_pass(cent_q)
        new_q = cent_q.copy()
        for pos, cid in enumerate(cent_ids):
            sub = parts[parts["cluster"] == cid]
            if not len(sub):
                continue  # emptied cluster keeps its previous centroid
            n = int(sub["n"].sum())
            sums = np.sum(np.stack(sub["sums"].to_numpy()), axis=0)
            new_q[pos] = np.floor(sums / n + 0.5).astype(np.int64)
        cent_q = new_q

    final = run_pass(cent_q)  # third (final) assignment
    acc: dict[int, list[int]] = {}
    for _i, row in final.iterrows():
        a = acc.setdefault(int(row["cluster"]), [0, 0])
        a[0] += int(row["n"])
        a[1] += int(row["inertia_q"])  # Python ints: no int64 overflow
    clusters = sorted(acc)
    return pa.table({
        "cluster": pa.array(clusters, pa.int64()),
        "n_members": pa.array([acc[c][0] for c in clusters], pa.int64()),
        "inertia_q": pa.array([acc[c][1] for c in clusters], pa.int64()),
    })


def _fetch_centroids(ref):
    """Per-worker cached ray.get (the broadcast is tiny, but the cache keeps
    the pattern uniform with the repo's other broadcast lookups)."""
    return ray.get(ref)


SQL_KMEANS_ASSIGN = r"""
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
              i -> (q.e[i] - cent.ce[i]) * (q.e[i] - cent.ce[i]))) AS BIGINT) AS dist_q
  FROM q CROSS JOIN cent
)
SELECT vec_id, cid AS cluster, dist_q FROM dists
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist_q, cid) = 1
"""

SQL_KMEANS_LLOYD = r"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS e
  FROM embeddings
), dims AS (
  SELECT unnest(range(1, (SELECT len(e) FROM q LIMIT 1) + 1)) AS i
), c0 AS (
  SELECT vec_id AS cid, e AS ce FROM q ORDER BY vec_id LIMIT 8
), a1 AS (
  SELECT q.vec_id, q.e, c.cid,
         CAST(list_sum(list_transform(range(1, len(q.e) + 1),
              i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS BIGINT) AS dist_q
  FROM q CROSS JOIN c0 c
  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY dist_q, c.cid) = 1
), s1 AS (
  SELECT a.cid, d.i, SUM(a.e[d.i]) AS s, COUNT(*) AS n
  FROM a1 a CROSS JOIN dims d
  GROUP BY a.cid, d.i
), c1 AS (
  SELECT c0.cid, COALESCE(nc.ce, c0.ce) AS ce
  FROM c0 LEFT JOIN (
    SELECT cid, list(CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) ORDER BY i) AS ce
    FROM s1 GROUP BY cid
  ) nc USING (cid)
), a2 AS (
  SELECT q.vec_id, q.e, c.cid,
         CAST(list_sum(list_transform(range(1, len(q.e) + 1),
              i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS BIGINT) AS dist_q
  FROM q CROSS JOIN c1 c
  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY dist_q, c.cid) = 1
), s2 AS (
  SELECT a.cid, d.i, SUM(a.e[d.i]) AS s, COUNT(*) AS n
  FROM a2 a CROSS JOIN dims d
  GROUP BY a.cid, d.i
), c2 AS (
  SELECT c1.cid, COALESCE(nc.ce, c1.ce) AS ce
  FROM c1 LEFT JOIN (
    SELECT cid, list(CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) ORDER BY i) AS ce
    FROM s2 GROUP BY cid
  ) nc USING (cid)
), a3 AS (
  SELECT q.vec_id, c.cid,
         CAST(list_sum(list_transform(range(1, len(q.e) + 1),
              i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS BIGINT) AS dist_q
  FROM q CROSS JOIN c2 c
  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY dist_q, c.cid) = 1
)
SELECT cid AS cluster, COUNT(*) AS n_members,
       CAST(SUM(dist_q) AS BIGINT) AS inertia_q
FROM a3 GROUP BY cid
"""



# -- relational: semi join (EXISTS) ------------------------------------------


def semi_join_urgent(sf_dir: str):
    """Customers with at least one URGENT order — the EXISTS / semi-join
    shape (the anti-join's dual, which the suite already has). The order
    side reduces to DISTINCT custkeys via a pruned filtered read + groupby
    Count (combiner-friendly), then one hash join against customer. No
    broadcast: the distinct-key side scales with the customer count."""
    from .queries import _read

    import pyarrow.compute as pc

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])
    urgent = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderpriority"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    ).select_columns(["o_custkey"]).groupby("o_custkey").aggregate(
        Count(alias_name="n_urgent")
    )
    out = cust.join(
        urgent, join_type="inner",
        on=("c_custkey",), right_on=("o_custkey",), num_partitions=8,
    ).select_columns(["c_custkey", "c_name", "c_mktsegment", "n_urgent"])
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_SEMI_JOIN_URGENT = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment, u.n_urgent
FROM customer c
JOIN (SELECT o_custkey, count(*) AS n_urgent FROM orders
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1) u
  ON c.c_custkey = u.o_custkey
"""


# -- relational: ROLLUP (multi-level aggregate) ------------------------------


def rollup_revenue(sf_dir: str):
    """Revenue by (year, priority) with ROLLUP subtotals — the OLAP cube
    shape. One distributed groupby at the finest grain; the year-level and
    grand-total rows RE-aggregate that already-small result (years ×
    priorities rows), so the rollup costs one shuffle total at any scale.
    Sentinels (-1 / 'ALL') instead of NULL group keys keep the hash compare
    well-defined. Revenue is per-row integer cents summed as int64 — exact
    on both engines."""
    from .queries import _read

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority",
                                          "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64()
        )
        return pa.table({
            "year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            "priority": t["o_orderpriority"],
            "cents": cents,
        })

    fine = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["year", "priority"])
        .aggregate(Sum("cents", alias_name="revenue_cents"))
        .materialize()
    )
    years = fine.groupby("year").aggregate(Sum("revenue_cents",
                                               alias_name="revenue_cents"))

    def add_all(t: pa.Table) -> pa.Table:
        return t.append_column(
            "priority", pa.array(["ALL"] * len(t), pa.string())
        ).select(["year", "priority", "revenue_cents"])

    total = fine.aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    total_tbl = pa.table({
        "year": pa.array([-1], pa.int64()),
        "priority": pa.array(["ALL"], pa.string()),
        "revenue_cents": pa.array([int(total["revenue_cents"])], pa.int64()),
    })
    out = fine.union(
        years.map_batches(add_all, batch_format="pyarrow"),
        ray.data.from_arrow(total_tbl),
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_ROLLUP_REVENUE = """
SELECT CASE WHEN GROUPING(year(o_orderdate)) = 1 THEN -1
            ELSE year(o_orderdate) END                       AS year,
       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
            ELSE o_orderpriority END                         AS priority,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
"""


# -- relational: per-group mode ----------------------------------------------


def mode_per_user(sf_dir: str):
    """Each user's most frequent event type (mode; ties → lexicographically
    first type). The count table is one combiner-friendly groupby; the
    argmax then runs per-user on that already-aggregated table (rows =
    users × event types, far smaller than events), hash-partitioned by
    user — no second wide shuffle of raw events."""
    from .queries import _read

    counts = (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n_events"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["n_events", "event_type"],
                             ascending=[False, True], kind="mergesort").head(1)

    out = counts.groupby("user_id").map_groups(_pd_arrow(pick), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_MODE_PER_USER = """
SELECT user_id, event_type, count(*) AS n_events
FROM events GROUP BY 1, 2
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY count(*) DESC, event_type) = 1
"""


# -- statistical outlier filter (grouped p99 threshold) ----------------------


def outlier_events(sf_dir: str):
    """Events above their type's p99 value — the two-pass statistical filter
    (compute grouped thresholds, broadcast, stream-filter). Thresholds come
    from one small groupby (event types are low-cardinality) with the same
    linear-interpolation percentile as SQL quantile_cont; the keep rule is
    then INTEGER (cents > cents), so no float-boundary drift. The threshold
    table is a bounded driver collect + ray.put broadcast; the filter pass
    is zero-shuffle."""
    from .queries import _read

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def thr(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        p99 = np.percentile(v, 99)
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p99c": np.array([np.floor(p99 * 100 + 0.5)], dtype=np.int64),
        })

    thr_rows = (
        ds.groupby("event_type").map_groups(_pd_arrow(thr), batch_format="pandas").take_all()
    )
    thr_ref = ray.put({r["event_type"]: int(r["p99c"]) for r in thr_rows})

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cut = ray.get(thr_ref)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)), pa.int64()
        ).to_numpy()
        cuts = np.array([cut[x] for x in t["event_type"].to_pylist()], dtype=np.int64)
        m = cents > cuts
        return pa.table({
            "event_id": t["event_id"].filter(pa.array(m)),
            "event_type": t["event_type"].filter(pa.array(m)),
            "value_c": pa.array(cents[m], pa.int64()),
        })

    return ds.map_batches(keep, batch_format="pyarrow")


SQL_OUTLIER_EVENTS = """
WITH thr AS (
  SELECT event_type,
         CAST(floor(quantile_cont(value, 0.99) * 100 + 0.5) AS BIGINT) AS p99c
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS value_c
FROM events e JOIN thr USING (event_type)
WHERE CAST(floor(e.value * 100 + 0.5) AS BIGINT) > thr.p99c
"""


# -- per-document n-gram repetition stats ------------------------------------


def dup_ngram_stats(sf_dir: str):
    """Per-document 3-gram repetition (total vs distinct word trigrams) —
    the Gopher/Rae repetition signal as raw integer counts. One zero-shuffle
    vectorized-batch pass; the ratio is left to the consumer so the output
    stays integer-exact."""
    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        tot, dis = [], []
        for x in t["text"].to_pylist():
            w = _WORD.findall((x or "").lower())
            grams = list(zip(w, w[1:], w[2:]))
            tot.append(len(grams))
            dis.append(len(set(grams)))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": pa.array(tot, pa.int64()),
            "n_distinct_grams": pa.array(dis, pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


SQL_DUP_NGRAM_STATS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS w
  FROM documents
), grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(w) - 1, 1)),
                        i -> array_to_string(w[i:i+2], ' ')) AS g
  FROM toks
)
SELECT doc_id, len(g) AS n_grams, len(list_distinct(g)) AS n_distinct_grams
FROM grams
"""


# -- funnel conversion (first A → later B per user) --------------------------


def funnel_conversion(sf_dir: str):
    """Click→purchase funnel: for each user with a click, whether a purchase
    happened at-or-after their FIRST click, and the conversion lag (µs,
    -1 = never). Sequential-pattern semantics need event order per user, so
    this is one hash partition by user_id with the scan inside map_groups —
    the sessionize partitioning assumption (per-user history fits a worker).
    All outputs are exact int64 (epoch-µs arithmetic)."""
    from .queries import _read

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g.loc[g["event_type"] == "click", "ts"]
        if clicks.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "converted": pd.Series([], dtype="int64"),
                "lag_us": pd.Series([], dtype="int64"),
            })
        first_click = clicks.min()
        purch = g.loc[
            (g["event_type"] == "purchase") & (g["ts"] >= first_click), "ts"
        ]
        conv = 0 if purch.empty else 1
        lag = -1
        if conv:
            lag = int(purch.min().value // 1000) - int(first_click.value // 1000)
        return pd.DataFrame({
            "user_id": np.array([g["user_id"].iloc[0]], dtype=np.int64),
            "converted": np.array([conv], dtype=np.int64),
            "lag_us": np.array([lag], dtype=np.int64),
        })

    out = ds.groupby("user_id").map_groups(_pd_arrow(funnel), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_FUNNEL_CONVERSION = """
WITH c AS (
  SELECT user_id, min(ts) AS first_click FROM events
  WHERE event_type = 'click' GROUP BY 1
), p AS (
  SELECT c.user_id, min(e.ts) AS conv_ts
  FROM c JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND e.ts >= c.first_click
  GROUP BY 1
)
SELECT c.user_id,
       CASE WHEN p.conv_ts IS NULL THEN 0 ELSE 1 END AS converted,
       coalesce(epoch_us(p.conv_ts) - epoch_us(c.first_click), -1) AS lag_us
FROM c LEFT JOIN p USING (user_id)
"""


# -- per-user inter-event gaps (lag window) ----------------------------------


def event_gaps(sf_dir: str):
    """Per-user inter-event gap stats (count, max gap, total span in µs) —
    the LAG window primitive. Hash partition by user, sort inside the group
    by (ts, event_id) so timestamp ties are deterministic; gaps are exact
    int64 µs (sum-of-gaps telescopes to last-first, kept anyway as the
    window-shape demonstration). Users with one event report zeros, same as
    the SQL's coalesce."""
    from .queries import _read

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        d = np.diff(us)
        return pd.DataFrame({
            "user_id": np.array([g["user_id"].iloc[0]], dtype=np.int64),
            "n_events": np.array([len(g)], dtype=np.int64),
            "max_gap_us": np.array([d.max() if len(d) else 0], dtype=np.int64),
            "span_us": np.array([int(d.sum()) if len(d) else 0], dtype=np.int64),
        })

    out = ds.groupby("user_id").map_groups(_pd_arrow(gaps), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_EVENT_GAPS = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, count(*) AS n_events,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_us,
       CAST(coalesce(sum(gap), 0) AS BIGINT) AS span_us
FROM g GROUP BY 1
"""


# -- per-day distinct users (two-stage exact count-distinct) -----------------


def daily_active_users(sf_dir: str):
    """Per-day distinct active users — the exact count-distinct pattern that
    scales: stage 1 reduces to distinct (day, user) pairs (combiner-friendly
    groupby), stage 2 counts per day. No set is ever held whole; both
    shuffles move only already-reduced keys."""
    from .queries import _read

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def day(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "day": pc.cast(pc.floor(pc.divide(
                pc.cast(t["ts"], pa.int64()), 86_400_000_000.0)), pa.int64()),
            "user_id": t["user_id"],
        })

    pairs = (
        ds.map_batches(day, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["day", "user_id"])
    )
    out = pairs.groupby("day").aggregate(Count(alias_name="n_users"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_DAILY_ACTIVE_USERS = """
SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


from ..sources.orcfiles import SQL_ORC_ROUNDTRIP, orc_roundtrip_stats



def source_overlap_matrix(sf_dir: str):
    """Cross-source contamination matrix: for every SOURCE pair, the Jaccard
    similarity (integer ppm) of their sampled 5-gram fingerprint sets — the
    "how much does subcorpus A leak into subcorpus B" statistic that decides
    whether two sources can sit on opposite sides of a train/eval split.

    Reuses fingerprint_pairs' mod-16 md5 sampling (fingerprints starting
    with '0'), but aggregates at the (source, fp) grain: block-local dedup
    is the combiner, one groupby(fp) emits the source pairs sharing each
    fingerprint (bounded: ≤ C(20,2) pair keys), per-source totals are a
    bounded-domain aggregate, and jaccard_ppm = inter*10^6 // (a+b-inter)
    is truncating integer division on BOTH engines."""

    def grams(t: pa.Table) -> pa.Table:
        srcs, fps = [], []
        for src, x in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            w = _WORD.findall((x or "").lower())
            sel = {
                h
                for i in range(len(w) - 4)
                for h in (hashlib.md5(" ".join(w[i : i + 5]).encode()).hexdigest(),)
                if h.startswith("0")
            }
            srcs.extend([src] * len(sel))
            fps.extend(sorted(sel))
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "fp": pa.array(fps, pa.string()),
        })

    def dedup_block(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "fp": t["fp"].to_pylist()}).drop_duplicates()
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    def pairs_and_marks(g: pd.DataFrame) -> pd.DataFrame:
        # ONE pass over the fp group does all three jobs the old three
        # executions did: the in-group distinct, the source-pair emission,
        # and a ("", source) marker row per distinct source so per-source
        # fingerprint totals fall out of the SAME bounded groupby downstream
        srcs = np.sort(g["source"].drop_duplicates().to_numpy())
        if len(srcs) < 2:
            pa_, pb_ = np.array([], dtype=object), np.array([], dtype=object)
        else:
            a, b = np.triu_indices(len(srcs), k=1)
            pa_, pb_ = srcs[a], srcs[b]
        return pd.DataFrame({
            "s_a": np.concatenate([pa_, np.full(len(srcs), "", dtype=object)]),
            "s_b": np.concatenate([pb_, srcs]),
        })

    counted = (
        _docs_with_source(sf_dir).map_batches(grams, batch_format="pyarrow")
        .map_batches(dedup_block, batch_format="pyarrow")
        # one fp shuffle total (row-sized domain -> map_groups)
        .groupby("fp").map_groups(_pd_arrow(pairs_and_marks),
                                  batch_format="pandas")
        .groupby(["s_a", "s_b"]).aggregate(Count(alias_name="inter"))
        .to_pandas()
    )
    marks = counted[counted["s_a"] == ""]
    totals = dict(zip(marks["s_b"], marks["inter"]))
    inter = (counted[counted["s_a"] != ""]
             .sort_values(["s_a", "s_b"]).reset_index(drop=True))
    out = inter.assign(
        jaccard_ppm=[
            int(r.inter) * 1_000_000
            // (int(totals[r.s_a]) + int(totals[r.s_b]) - int(r.inter))
            for r in inter.itertuples()
        ]
    )[["s_a", "s_b", "inter", "jaccard_ppm"]]
    return pa.Table.from_pandas(
        out, preserve_index=False
    ).replace_schema_metadata(None)


def _docs_with_source(sf_dir: str):
    from .queries import _read

    return _read(sf_dir, "documents", columns=["source", "text"])


SQL_SOURCE_OVERLAP_MATRIX = r"""
WITH toks AS (
  SELECT source, regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS w
  FROM documents
), grams AS (
  SELECT source,
         unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                               i -> md5(array_to_string(w[i:i+4], ' ')))) AS fp
  FROM toks
), sel AS (
  SELECT DISTINCT source, fp FROM grams WHERE fp LIKE '0%'
), tot AS (
  SELECT source, count(*) AS n FROM sel GROUP BY source
), inter AS (
  SELECT a.source AS s_a, b.source AS s_b, count(*) AS inter
  FROM sel a JOIN sel b ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.s_a, i.s_b, i.inter,
       i.inter * 1000000 // (ta.n + tb.n - i.inter) AS jaccard_ppm
FROM inter i JOIN tot ta ON ta.source = i.s_a JOIN tot tb ON tb.source = i.s_b
"""


# -- sq8_quant_stats ----------------------------------------------------------


def _emb_matrix(t: pa.Table) -> np.ndarray:
    """(n, d) int64 matrix of floor(x * 2^20) quantized components. The
    2^20 multiplier is a power of two, so float32→double→multiply→floor is
    EXACT (zero rounding anywhere) and DuckDB reproduces it bit-for-bit."""
    col = t["embedding"].combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    d = len(flat) // n
    return np.floor(flat.reshape(n, d).astype(np.float64) * 1048576.0).astype(np.int64)


def sq8_quant_stats(sf_dir: str):
    """int8 scalar quantization (SQ8) audit of the embedding table — the
    vector-store compression step: per dimension, the corpus min/max, the
    derived uint8 step, and the exact reconstruction-error profile a
    midpoint dequantizer would incur. Everything happens in the floor(x *
    2^20) integer domain (exact for float32 inputs), so codes, dequantized
    values and errors are pure integer arithmetic on both engines — no IEEE
    summation-order risk.

    Two passes, zero row shuffles: (1) per-block per-dim min/max partials
    into a bounded (d-row) groupby, scales derived on the driver and
    broadcast via ray.put; (2) per-block error partials against the
    broadcast scales into a second bounded groupby-sum. The classic
    two-pass broadcast shape — at 100 TB each pass streams once and only
    64-row partials ever move."""
    from .mlqueries import _emb

    ds = _emb(sf_dir)

    def minmax_partials(t: pa.Table) -> pa.Table:
        q = _emb_matrix(t)
        if q.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "dim": pa.array(np.arange(1, q.shape[1] + 1), pa.int64()),
            "mn": pa.array(q.min(axis=0), pa.int64()),
            "mx": pa.array(q.max(axis=0), pa.int64()),
        })

    mm = (
        ds.map_batches(minmax_partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(ray.data.aggregate.Min("mn", alias_name="mn"),
                   Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("dim")
    )
    dims = mm["dim"].to_numpy()
    mn = mm["mn"].to_numpy()
    mx = mm["mx"].to_numpy()
    scale = np.maximum(1, (mx - mn + 254) // 255)  # ceil((mx-mn)/255), >= 1
    sc_ref = ray.put((mn, scale))

    def err_partials(t: pa.Table) -> pa.Table:
        mn_b, sc_b = ray.get(sc_ref)
        q = _emb_matrix(t)
        if q.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "max_err_q": pa.array([], pa.int64()),
                             "sum_err_q": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        code = (q - mn_b) // sc_b                  # uint8 codes, 0..255
        deq = mn_b + code * sc_b + sc_b // 2       # midpoint dequantizer
        err = np.abs(q - deq)
        return pa.table({
            "dim": pa.array(np.arange(1, q.shape[1] + 1), pa.int64()),
            "max_err_q": pa.array(err.max(axis=0), pa.int64()),
            "sum_err_q": pa.array(err.sum(axis=0), pa.int64()),
            "n": pa.array(np.full(q.shape[1], q.shape[0]), pa.int64()),
        })

    errs = (
        ds.map_batches(err_partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Max("max_err_q", alias_name="max_err_q"),
                   Sum("sum_err_q", alias_name="sum_err_q"),
                   Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("dim")
    )
    out = pd.DataFrame({
        "dim": dims, "min_q": mn, "max_q": mx, "scale_q": scale,
        "max_err_q": errs["max_err_q"].to_numpy(),
        "sum_err_q": errs["sum_err_q"].to_numpy(),
        "n": errs["n"].to_numpy(),
    })
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


SQL_SQ8_QUANT_STATS = r"""
WITH u AS (
  SELECT CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576) AS BIGINT)
           AS xq,
         unnest(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
), sc AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx,
         greatest(1, (max(xq) - min(xq) + 254) // 255) AS scale_q
  FROM u GROUP BY dim
), e AS (
  SELECT u.dim,
         abs(xq - (mn + ((xq - mn) // scale_q) * scale_q + scale_q // 2))
           AS err
  FROM u JOIN sc USING (dim)
)
SELECT CAST(sc.dim AS BIGINT) AS dim,
       CAST(mn AS BIGINT) AS min_q, CAST(mx AS BIGINT) AS max_q,
       CAST(scale_q AS BIGINT) AS scale_q,
       CAST(max(err) AS BIGINT) AS max_err_q,
       CAST(sum(err) AS BIGINT) AS sum_err_q,
       CAST(count(*) AS BIGINT) AS n
FROM e JOIN sc USING (dim)
GROUP BY sc.dim, mn, mx, scale_q
ORDER BY dim
"""


# -- dedup_savings ------------------------------------------------------------


def dedup_savings(sf_dir: str):
    """What prefix-canopy dedup buys, per source: document and byte
    counts, how many of each are redundant copies, and the byte-savings
    rate in integer ppm — the report every dedup run ends with. The key is
    md5 of the first 8 whitespace tokens (the prefix-canopy hash used on
    boilerplate-heavy crawls, where full-content md5 misses trailing-chrome
    variants); global keeper = lowest doc_id per hash, so cross-source
    duplicates charge the non-keeper source.

    One shuffle: rows reduce to (hash, doc_id, source, n_chars), bucket on
    a hash prefix (row-sized key domain -> bucketed map_groups per the
    repo rule, not groupby(hash).aggregate), the keeper and per-source
    partial sums are computed vectorized inside each bucket, and a final
    bounded groupby folds the per-(bucket, source) partials."""
    from .queries import _read

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source", "n_chars"])

    def keyed(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        hs = [hashlib.md5(" ".join((x or "").split()[:8]).encode()).hexdigest()
              for x in texts]
        return pa.table({
            "ch": pa.array(hs, pa.string()),
            "hb": pa.array([int(h[:2], 16) for h in hs], pa.int64()),
            "doc_id": t["doc_id"],
            "source": t["source"],
            "n_chars": t["n_chars"],
        })

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        keeper = g.groupby("ch")["doc_id"].transform("min")
        red = (g["doc_id"].to_numpy() != keeper.to_numpy())
        df = pd.DataFrame({
            "source": g["source"].to_numpy(),
            "n_docs": np.ones(len(g), dtype=np.int64),
            "n_redundant": red.astype(np.int64),
            "bytes_total": g["n_chars"].to_numpy(),
            "bytes_redundant": np.where(red, g["n_chars"].to_numpy(), 0),
        })
        return df.groupby("source", as_index=False).sum()

    agg = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("hb").map_groups(_pd_arrow(bucket_partials), batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_redundant", alias_name="n_redundant"),
                   Sum("bytes_total", alias_name="bytes_total"),
                   Sum("bytes_redundant", alias_name="bytes_redundant"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    agg["savings_ppm"] = (agg["bytes_redundant"] * 1_000_000
                          // agg["bytes_total"]).astype("int64")
    for c in agg.columns:
        if c != "source":
            agg[c] = agg[c].astype("int64")
    return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)


SQL_DEDUP_SAVINGS = """
WITH h AS (
  SELECT doc_id, source, n_chars,
         md5(array_to_string(
           list_slice(string_split_regex(trim(text), '\s+'), 1, 8), ' '))
           AS ch
  FROM documents
), k AS (
  SELECT ch, min(doc_id) AS keeper FROM h GROUP BY ch
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redundant,
       CAST(sum(n_chars) AS BIGINT) AS bytes_total,
       CAST(sum(CASE WHEN doc_id <> keeper THEN n_chars ELSE 0 END) AS BIGINT)
         AS bytes_redundant,
       CAST(sum(CASE WHEN doc_id <> keeper THEN n_chars ELSE 0 END) * 1000000
            // sum(n_chars) AS BIGINT) AS savings_ppm
FROM h JOIN k USING (ch)
GROUP BY source ORDER BY source
"""


CORPUS_REGISTRY = {
    "sq8_quant_stats": (sq8_quant_stats, SQL_SQ8_QUANT_STATS),
    "dedup_savings": (dedup_savings, SQL_DEDUP_SAVINGS),
    "orc_roundtrip_stats": (orc_roundtrip_stats, SQL_ORC_ROUNDTRIP),
    "fingerprint_pairs": (fingerprint_pairs, SQL_FINGERPRINT_PAIRS),
    "text_normalize": (text_normalize, SQL_TEXT_NORMALIZE),
    "unigram_logprob": (unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "vocab_coverage": (vocab_coverage, SQL_VOCAB_COVERAGE),
    "kmeans_assign": (kmeans_assign, SQL_KMEANS_ASSIGN),
    "kmeans_lloyd": (kmeans_lloyd, SQL_KMEANS_LLOYD),
    "semi_join_urgent": (semi_join_urgent, SQL_SEMI_JOIN_URGENT),
    "rollup_revenue": (rollup_revenue, SQL_ROLLUP_REVENUE),
    "mode_per_user": (mode_per_user, SQL_MODE_PER_USER),
    "source_overlap_matrix": (source_overlap_matrix, SQL_SOURCE_OVERLAP_MATRIX),
    "outlier_events": (outlier_events, SQL_OUTLIER_EVENTS),
    "dup_ngram_stats": (dup_ngram_stats, SQL_DUP_NGRAM_STATS),
    "funnel_conversion": (funnel_conversion, SQL_FUNNEL_CONVERSION),
    "event_gaps": (event_gaps, SQL_EVENT_GAPS),
    "daily_active_users": (daily_active_users, SQL_DAILY_ACTIVE_USERS),
}
