"""Training-data operator queries (dedup / similarity / text analysis) over
the ``documents`` and ``embeddings`` tables, with DuckDB oracles where the
semantics are SQL-expressible and rows-only entries for the sketch-based ops.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..arrowcols import col_np
from .queries import _read, _pd_arrow


def _n_blocks() -> int:
    """Block count for the single-file sandbox tables: ≈ CPU count. Ray's
    default split targets large multi-file corpora and shreds a small file
    into hundreds of tiny blocks, which makes every downstream sort/groupby
    pay per-block overhead (measured 3.5× wall-time on the dedup queries).
    On a real multi-file corpus, drop the override and let the default rule."""
    import ray as _ray

    return max(8, int(_ray.cluster_resources().get("CPU", 8)))


def _docs(sf_dir: str):
    return _read(
        sf_dir, "documents", columns=["doc_id", "text"],
        override_num_blocks=_n_blocks(),
    )


def _emb(sf_dir: str):
    return _read(
        sf_dir, "embeddings", columns=["vec_id", "embedding"],
        override_num_blocks=_n_blocks(),
    )


# -- token counting (whitespace) — oracle-checked ---------------------------


def token_counts(sf_dir: str):
    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array([len(x.split()) for x in texts], pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens
FROM documents
"""


# -- language-ID (reference common-word rule) — oracle-checked ---------------


def lang_id(sf_dir: str):
    from ..functions.textstats import detect_language_common_words

    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "language": pa.array(
                    [detect_language_common_words(x) for x in texts], pa.string()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


SQL_LANG_ID = r"""
SELECT doc_id,
       CASE WHEN length(list_distinct(list_intersect(
                list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            w -> length(w) >= 2),
                ['the','and','of','to','a','in','is','you','that','it']))) > 5
            THEN 'en' ELSE 'unknown' END AS language
FROM documents
"""


# -- quality-signal counts — oracle-checked ----------------------------------
# The SQL-expressible core of functions/textstats.py quality_signals: raw
# integer counts (no ratios, so no float-rounding divergence). The full
# text_stats (trigram profile, rolling fingerprint, banded quality) stays a
# rows-only entry — those are not SQL-expressible.

_PUNCT_SET = ".,;:!?'\"()-"


def text_quality_stats(sf_dir: str):
    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = t.column("text")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64()),
            "n_alpha": pc.cast(pc.count_substring_regex(txt, "[a-zA-Z]"), pa.int64()),
            "n_upper": pc.cast(pc.count_substring_regex(txt, "[A-Z]"), pa.int64()),
            "n_punct": pc.cast(
                pc.count_substring_regex(txt, r"""[.,;:!?'"()\-]"""), pa.int64()
            ),
            "n_wordchars": pc.cast(pc.count_substring_regex(txt, r"\S"), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


SQL_TEXT_QUALITY_STATS = r"""
SELECT doc_id,
       length(text)                                            AS n_chars,
       length(regexp_extract_all(text, '\S+'))                 AS n_tokens,
       length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))      AS n_alpha,
       length(regexp_replace(text, '[^A-Z]', '', 'g'))         AS n_upper,
       length(text) - length(translate(text, '.,;:!?''"()-', '')) AS n_punct,
       length(regexp_replace(text, '\s', '', 'g'))             AS n_wordchars
FROM documents
"""


# -- exact n-gram Jaccard pairs — oracle-checked ----------------------------


def ngram_jaccard(sf_dir: str):
    from ..stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), min_jaccard=0.2, k=3)


SQL_NGRAM_JACCARD = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                     ELSE list_transform(generate_series(1, len(ws) - 2),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                END) AS shingle
  FROM w WHERE trim(array_to_string(ws, ' ')) <> ''
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common, (sa.n + sb.n - n_common) AS n_union
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.2
"""


# -- brute-force cosine top-k — oracle-checked ------------------------------

N_QUERIES = 5
KNN_K = 10


def knn_bruteforce_q(sf_dir: str):
    import pyarrow.parquet as pq

    from ..stages.simsearch import knn_bruteforce

    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, N_QUERIES)
    ids = head.column("vec_id").to_pylist()
    vecs = np.asarray(head.column("embedding").to_pylist(), dtype=np.float64)
    return knn_bruteforce(_emb(sf_dir), vecs, ids, k=KNN_K)


SQL_KNN_BRUTEFORCE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
         ) AS rnk
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rnk FROM scored WHERE rnk <= {KNN_K}
"""


# -- MinHash-LSH near-dup — oracle-checked ----------------------------------
# The sketch pipeline's OUTPUT contract is exact: candidates are verified
# with exact word-3-gram Jaccard, so the result is the subset of true
# Jaccard≥0.5 pairs that LSH recalled. The SQL oracle is the full exact pair
# set. ``strict=True`` makes that equality a RUNTIME GUARANTEE rather than an
# empirical observation: it raises loudly if a skew-guard bucket drop
# occurred or any verified pair's Jaccard sits below the recall≥0.999
# similarity (~0.77 at 16 bands × 4 rows) — i.e. if the corpus ever grows
# near-threshold pairs or >max_bucket template clusters, the query FAILS
# instead of silently hash-mismatching the oracle. (Current corpora: min
# true-pair Jaccard is 0.8 at every sf, no guard hits.)


def minhash_dedup_q(sf_dir: str):
    from ..stages.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(sf_dir), threshold=0.5, strict=True)


SQL_MINHASH_DEDUP = SQL_NGRAM_JACCARD.replace(">= 0.2", ">= 0.5")


# -- SimHash near-dup — oracle-checked (bit-exact SQL signature) ------------
# Bit i of the signature is sign(sum_w count(w) * (2*bit_i(md5_64(w)) - 1))
# where md5_64 = big-endian uint64 of md5(word)[:8] — reproduced in SQL via
# ('0x' || substr(md5(w),1,16))::UBIGINT. The 4×16-bit pigeonhole banding
# has guaranteed recall 1 for hamming ≤ 3, so Ray output == exhaustive SQL
# pair scan, deterministically.


def simhash_dedup_q(sf_dir: str):
    from ..stages.dedup import simhash_dedup_pairs

    # strict: pigeonhole recall is 1, so the only divergence risk is a
    # skew-guard drop — raise loudly instead of hash-mismatching the oracle
    return simhash_dedup_pairs(_docs(sf_dir), max_hamming=3, strict=True)


SQL_SIMHASH_DEDUP = r"""
WITH words AS (
  SELECT doc_id, w, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> '')
  GROUP BY doc_id, w
), tot AS (
  SELECT doc_id, sum(cnt) AS total FROM words GROUP BY doc_id
), hashed AS (
  SELECT doc_id, cnt, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM words
), bits AS (
  SELECT doc_id, i, sum(cnt * ((h >> i) & 1)) AS bitsum
  FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
  GROUP BY doc_id, i
), sigs AS (
  SELECT b.doc_id,
         sum(CASE WHEN 2 * b.bitsum > t.total THEN (1::UBIGINT << b.i)
                  ELSE 0::UBIGINT END)::UBIGINT AS sig
  FROM bits b JOIN tot t USING (doc_id) GROUP BY b.doc_id
), allsigs AS (
  -- docs whose text is empty/whitespace hash to signature 0
  SELECT d.doc_id, coalesce(s.sig, 0::UBIGINT) AS sig
  FROM documents d LEFT JOIN sigs s USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sig, b.sig)) AS hamming
FROM allsigs a JOIN allsigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


# -- embedding-cosine near-dup — oracle-checked -----------------------------
# The raw embeddings table is random vectors (max pairwise cosine ≈ 0.51 at
# sf0.01), so a threshold query over it is vacuous. Both engines therefore
# derive the same augmented table — every 10th vector duplicated under
# vec_id + OFFSET — and find pairs at cosine ≥ 0.95: the planted copies
# (cos = 1.0, margin ≈ 0.49 to the background, so no float-boundary risk).
# OFFSET is the smallest power of 10 strictly greater than max(vec_id),
# derived IDENTICALLY in both engines from the table itself (10^len(str(max))
# == '1' || repeat('0', length(max::VARCHAR)) — pure integer/string ops, no
# float log10), so synthetic ids can never collide with real rows at any sf.
# The Ray side runs the real LSH candidate-generation + bucketed-verify
# scale path, for which identical vectors have recall 1 by construction.


def _max_vec_id(path: str) -> int:
    """Max vec_id from parquet row-group statistics (no data read); falls
    back to a single-column scan if stats are absent."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index("vec_id")
    maxes = []
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            t = pq.read_table(path, columns=["vec_id"])
            import pyarrow.compute as pc

            return int(pc.max(t.column("vec_id")).as_py())
        maxes.append(st.max)
    return int(max(maxes))


def embedding_neardup_q(sf_dir: str):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.dedup import embedding_neardup_pairs

    emb = _emb(sf_dir)
    offset = 10 ** len(str(_max_vec_id(f"{sf_dir}/embeddings.parquet")))

    def copies(t: pa.Table) -> pa.Table:
        ids = col_np(t.column("vec_id"), np.int64)
        sub = t.filter(pa.array(ids % 10 == 0))
        return pa.table({
            "vec_id": pc.add(sub.column("vec_id"), offset),
            "embedding": sub.column("embedding"),
        })

    aug = emb.union(emb.map_batches(copies, batch_format="pyarrow"))
    n_base = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    return embedding_neardup_pairs(
        aug, threshold=0.95, id_col="vec_id", vec_col="embedding",
        n_docs=n_base + n_base // 10, strict=True,
    )


SQL_EMBEDDING_NEARDUP = """
WITH off AS (
  SELECT CAST('1' || repeat('0', length(CAST(max(vec_id) AS VARCHAR))) AS BIGINT)
         AS v FROM embeddings
), aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + (SELECT v FROM off), embedding FROM embeddings
  WHERE vec_id % 10 = 0
)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
"""


# -- duplicate_of components — oracle-checked -------------------------------
# Connected components over the verified MinHash pair set, keeper = the
# component minimum. The Ray side is the scale path (hash-to-min label
# propagation, pure Dataset ops); the oracle folds the exact Jaccard≥0.5
# pairs with a recursive transitive closure + min-reachable per node.


def duplicate_of_q(sf_dir: str):
    from ..stages.dedup import duplicate_groups_distributed, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(_docs(sf_dir), threshold=0.5)
    return duplicate_groups_distributed(ray.data.from_arrow(pairs))


SQL_DUPLICATE_OF = (
    "WITH RECURSIVE pairs AS (" + SQL_MINHASH_DEDUP + r"""),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v, rc.r FROM reach rc JOIN edges e ON e.u = rc.node
)
SELECT node AS doc_id, min(r) AS duplicate_of
FROM reach GROUP BY node HAVING min(r) <> node
"""
)


# -- Gopher-style document quality filter — oracle-checked ------------------
# The classic training-data keep/drop rules (length bounds, mean word
# length, symbol ratio, stop-word presence, repetition) over the documents
# table. Every rule is evaluated in INTEGER arithmetic (e.g. mean word
# length ≥ 3  ⇔  n_wordchars ≥ 3·n_tokens), so both engines agree exactly —
# no float-threshold boundary risk.

_QF_STOPWORDS = frozenset(
    ["the", "and", "of", "to", "a", "in", "is", "you", "that", "it"]
)


def _qf_signals(txt: pa.ChunkedArray) -> dict:
    """Gopher-style quality signals + keep bit for a text column — shared
    by quality_filter and the composed training_corpus_pipeline so the
    keep rule can never drift between them."""
    import pyarrow.compute as pc

    texts = [x or "" for x in txt.to_pylist()]
    n_tokens = [len(x.split()) for x in texts]
    n_stop = [
        sum(1 for w in x.lower().split() if w in _QF_STOPWORDS) for x in texts
    ]
    sent_counts = []
    dup_sents = []
    for x in texts:
        parts = x.split(". ")
        sent_counts.append(len(parts))
        dup_sents.append(len(parts) - len(set(parts)))
    n_chars = pc.cast(pc.utf8_length(txt), pa.int64()).to_pylist()
    n_wordchars = pc.cast(
        pc.count_substring_regex(txt, r"\S"), pa.int64()
    ).to_pylist()
    n_sym = pc.cast(
        pc.count_substring_regex(txt, r"[^A-Za-z0-9\s]"), pa.int64()
    ).to_pylist()
    keep = [
        int(
            50 <= nt <= 100_000
            and 3 * nt <= nw <= 10 * nt
            and 10 * ns < nc
            and 50 * nst > nt
            and 10 * nd < 3 * nsent
        )
        for nt, nw, ns, nc, nst, nd, nsent in zip(
            n_tokens, n_wordchars, n_sym, n_chars, n_stop, dup_sents, sent_counts
        )
    ]
    return {
        "n_tokens": n_tokens, "n_wordchars": n_wordchars, "n_symbols": n_sym,
        "n_stopwords": n_stop, "n_sentences": sent_counts,
        "n_dup_sentences": dup_sents, "keep": keep,
    }


def quality_filter(sf_dir: str):
    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        sig = _qf_signals(t.column("text"))
        cols = {"doc_id": t.column("doc_id")}
        cols.update({k: pa.array(v, pa.int64()) for k, v in sig.items()})
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


SQL_QUALITY_FILTER = r"""
WITH d AS (
  -- NULL text behaves as '' (the Ray side's None -> "" coercion)
  SELECT doc_id, coalesce(text, '') AS text FROM documents
), sig AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         length(regexp_replace(text, '\s', '', 'g')) AS n_wordchars,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_symbols,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   w -> list_contains(['the','and','of','to','a','in','is','you','that','it'], w)))
         END AS n_stopwords,
         length(string_split(text, '. ')) AS n_sentences,
         length(string_split(text, '. '))
           - length(list_distinct(string_split(text, '. '))) AS n_dup_sentences
  FROM d
)
SELECT doc_id, n_tokens, n_wordchars, n_symbols, n_stopwords, n_sentences,
       n_dup_sentences,
       CAST(n_tokens BETWEEN 50 AND 100000
            AND 3 * n_tokens <= n_wordchars AND n_wordchars <= 10 * n_tokens
            AND 10 * n_symbols < n_chars
            AND 50 * n_stopwords > n_tokens
            AND 10 * n_dup_sentences < 3 * n_sentences AS BIGINT) AS keep
FROM sig
"""


# -- benchmark decontamination (n-gram overlap vs eval set) — oracle-checked -
# The standard eval-set contamination check: flag corpus documents sharing
# any word-8-gram with the (small) eval set. The eval set here is derived
# deterministically (doc_id % 10 == 0) so both engines construct it
# identically; in production it is an external benchmark corpus. Ray shape:
# the eval shingle set is broadcast via ray.put (eval sets are bounded
# small) and the corpus streams through one map — no shuffle at all.

DECON_K = 8


def _shingles_k(text: str, k: int) -> set:
    ws = text.split()
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


_TCP_SEQ = 512  # tokens per packed training sequence (mirrored in SQL)
_TCP_SPAN = 1024  # doc_ids per prefix-sum bucket


def training_corpus_pipeline(sf_dir: str):
    """The composed end-to-end training-data prep pipeline, oracle-backed
    as ONE query: Gopher-style quality filter → exact dedup (keep lowest
    doc_id per content hash) → concat-and-chunk sequence packing over the
    survivors. Each surviving document reports the 512-token training
    sequence its first token lands in.

    Composition stays streaming: stage 1 computes quality signals AND the
    content hash in a single map pass (the fused shape — no second read of
    text); dedup is a hash-bucketed first-wins (same-hash rows co-locate
    by construction); packing is the doc_pack prefix-sum — per-bucket
    token partials to the driver, exclusive cumsum broadcast, local scan.
    Three bounded shuffles end to end, text bytes dropped after stage 1."""
    import hashlib as _hl

    from .queries import _bucketed_agg

    ds = _docs(sf_dir)

    def stage1(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sig = _qf_signals(t.column("text"))
        texts = [x or "" for x in t.column("text").to_pylist()]
        hs = [_hl.md5(x.encode()).hexdigest() for x in texts]
        tb = pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(sig["n_tokens"], pa.int64()),
            "keep": pa.array(sig["keep"], pa.int64()),
            "h": pa.array(hs, pa.string()),
        })
        tb = tb.filter(pc.equal(tb["keep"], 1)).drop_columns(["keep"])
        hb = pd.util.hash_array(
            tb.column("h").to_numpy(zero_copy_only=False)) % 256
        return tb.append_column("hb", pa.array(hb.astype(np.int64)))

    def dedup_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        return g.drop_duplicates("h", keep="first")[["doc_id", "n_tokens"]]

    surv = (
        ds.map_batches(stage1, batch_format="pyarrow")
        .groupby("hb").map_groups(_pd_arrow(dedup_first), batch_format="pandas")
        .materialize()  # survivors: (doc_id, n_tokens) — the reduced entity
    )

    def tag_span(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "pbkt", pc.divide(t["doc_id"], _TCP_SPAN))

    spanned = surv.map_batches(tag_span, batch_format="pyarrow").materialize()
    partials = (
        _bucketed_agg(spanned, ["pbkt"], {"tok": ("n_tokens", "sum")})
        .to_pandas().sort_values("pbkt").reset_index(drop=True)
    )
    bks = partials["pbkt"].to_numpy().astype(np.int64)
    sums = partials["tok"].to_numpy().astype(np.int64)
    bases = np.zeros(len(sums), dtype=np.int64)
    bases[1:] = np.cumsum(sums)[:-1]
    base_ref = ray.put((bks, bases))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        from ..stages.dedup import _fetch_broadcast

        b, ba = _fetch_broadcast(base_ref)
        g = g.sort_values("doc_id", kind="mergesort")
        tok = g["n_tokens"].to_numpy()
        before = np.zeros(len(tok), dtype=np.int64)
        before[1:] = np.cumsum(tok)[:-1]
        before += ba[np.searchsorted(b, int(g["pbkt"].iloc[0]))]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": tok,
            "chunk_id": before // _TCP_SEQ,
        })

    out = spanned.groupby("pbkt").map_groups(_pd_arrow(scan), batch_format="pandas")
    df = out.to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


SQL_TRAINING_CORPUS_PIPELINE = r"""
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
), sig AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         length(regexp_replace(text, '\s', '', 'g')) AS n_wordchars,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_symbols,
         CASE WHEN trim(text) = '' THEN 0
              ELSE length(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   w -> list_contains(['the','and','of','to','a','in','is','you','that','it'], w)))
         END AS n_stopwords,
         length(string_split(text, '. ')) AS n_sentences,
         length(string_split(text, '. '))
           - length(list_distinct(string_split(text, '. '))) AS n_dup_sentences
  FROM d
), keepers AS (
  SELECT doc_id, text, n_tokens FROM sig
  WHERE n_tokens BETWEEN 50 AND 100000
    AND 3 * n_tokens <= n_wordchars AND n_wordchars <= 10 * n_tokens
    AND 10 * n_symbols < n_chars
    AND 50 * n_stopwords > n_tokens
    AND 10 * n_dup_sentences < 3 * n_sentences
), surv AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM keepers
  ) WHERE rn = 1
), cum AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before
  FROM surv
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(before // 512 AS BIGINT) AS chunk_id
FROM cum
"""


def decontaminate(sf_dir: str):
    docs = _docs(sf_dir)

    def eval_shingle_rows(t: pa.Table) -> pa.Table:
        # shingle EXTRACTION runs distributed; only the per-batch-distinct
        # shingle strings stream back (bounded by the eval set's vocabulary,
        # never the corpus texts — the driver materializes shingles, not docs)
        ids = col_np(t.column("doc_id"), np.int64)
        sub = t.filter(pa.array(ids % 10 == 0))
        sh: set = set()
        for x in sub.column("text").to_pylist():
            sh |= _shingles_k(x or "", DECON_K)
        return pa.table({"g": pa.array(sorted(sh), pa.string())})

    ev_shingles: set = set()
    for b in docs.map_batches(
        eval_shingle_rows, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        ev_shingles.update(b.column("g").to_pylist())
    ref = ray.put(ev_shingles)

    def overlap(t: pa.Table) -> pa.Table:
        from ..stages.dedup import _fetch_broadcast

        ev_sh = _fetch_broadcast(ref)  # per-worker deserialize-once cache
        ids = t.column("doc_id").to_pylist()
        texts = [x or "" for x in t.column("text").to_pylist()]
        out_id, out_n = [], []
        for i, x in zip(ids, texts):
            if int(i) % 10 == 0:
                continue
            n = len(_shingles_k(x, DECON_K) & ev_sh)
            if n:
                out_id.append(int(i))
                out_n.append(n)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_overlap": pa.array(out_n, pa.int64()),
        })

    return docs.map_batches(overlap, batch_format="pyarrow")


SQL_DECONTAMINATE = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
  WHERE trim(text) <> ''
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - {DECON_K - 1}),
                               i -> array_to_string(ws[i:i+{DECON_K - 1}], ' '))) AS g
  FROM w WHERE len(ws) >= {DECON_K}
), ev AS (
  SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0
)
SELECT s.doc_id, count(DISTINCT s.g) AS n_overlap
FROM sh s JOIN ev USING (g)
WHERE s.doc_id % 10 <> 0
GROUP BY 1
"""


# -- rows-only entries (approximate / stubs) --------------------------------


def knn_lsh_q(sf_dir: str):
    import pyarrow.parquet as pq

    from ..stages.simsearch import knn_lsh

    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, N_QUERIES)
    ids = head.column("vec_id").to_pylist()
    vecs = np.asarray(head.column("embedding").to_pylist(), dtype=np.float64)
    n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    return knn_lsh(_emb(sf_dir), vecs, ids, k=KNN_K, n_docs=n)


def knn_ivf_q(sf_dir: str):
    import pyarrow.parquet as pq

    from ..stages.simsearch import knn_ivf

    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, N_QUERIES)
    ids = head.column("vec_id").to_pylist()
    vecs = np.asarray(head.column("embedding").to_pylist(), dtype=np.float64)
    return knn_ivf(_emb(sf_dir), vecs, ids, k=KNN_K)


def text_stats_q(sf_dir: str):
    from ..functions.textstats import text_stats_batch

    ds = _read(sf_dir, "documents")
    return ds.map_batches(text_stats_batch, batch_format="pyarrow").drop_columns(["text"])


def articles41_core(sf_dir: str):
    """Oracle-backed core of the 41-column article artifact (SURVEY.md M22).

    Runs the REAL clean→extract→enrich→assemble pipeline over the synthesized
    pages (sources/docpages.py) and projects the columns whose values are
    exactly derivable from the ``documents`` table by pure string/hash SQL:
    article_id (simple_crawler.py:134-143 rule), content, content_length,
    content_hash (enhanced_article.py:84-87 rule), language, read_time,
    quality_score band, publish day. The DuckDB twin re-derives the cleaner's
    single-paragraph closed form (content == periodized text iff len>=100 and
    words>=24) and enrich's exact rules, including Python banker's rounding
    in read-time."""
    import pyarrow.compute as pc

    from ..sources.docpages import documents_as_pages
    from .articles import article_pipeline

    arts = article_pipeline(documents_as_pages(sf_dir), gate_articles=False)
    prefix = len("https://docs.example.com/d/")

    def core(t: pa.Table) -> pa.Table:
        did = pc.cast(
            pc.utf8_slice_codeunits(t.column("url"), start=prefix, stop=2**30),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": did,
                "article_id": t.column("article_id"),
                "title": t.column("title"),
                "content": t.column("content"),
                "content_length": pc.cast(t.column("content_length"), pa.int64()),
                "content_hash": t.column("content_hash"),
                "language": t.column("language"),
                "read_time": pc.cast(t.column("read_time"), pa.int64()),
                "quality_score": pc.cast(t.column("quality_score"), pa.int64()),
                "publish_day": pc.cast(pc.day(t.column("publish_date")), pa.int64()),
            }
        )

    return arts.map_batches(core, batch_format="pyarrow")


# The cleaner's ladder on a one-<p> page reduces to: content = ptext iff
# len(ptext) >= 100 AND word_count >= 24 (>=2 sentences), else ''.  ptext =
# 12-word groups joined '. ' + trailing '.', short tail merged into the last
# group (docpages.periodize).  read_time = max(1, round_half_even(wc/200));
# language = 'en' iff >5 distinct ENGLISH_COMMON words (2+ letters) appear;
# quality = 30 (title>20 chars +20, authors +10) + content-length band.
SQL_ARTICLES41_CORE = r"""
WITH base AS (
  SELECT doc_id,
         'https://docs.example.com/d/' || doc_id AS url,
         'Document ' || doc_id || ' synthetic article' AS title,
         CASE WHEN trim(coalesce(text, '')) = '' THEN NULL
              ELSE str_split(trim(coalesce(text, '')), ' ') END AS ws
  FROM documents
), p AS (
  SELECT doc_id, url, title, ws,
         coalesce(len(ws), 0) AS wc,
         greatest(1, coalesce(len(ws), 0) // 12) AS n_groups
  FROM base
), pt AS (
  SELECT doc_id, url, title, wc, n_groups,
         CASE WHEN wc = 0 THEN ''
              ELSE array_to_string(
                     list_transform(range(0, n_groups), gi ->
                       array_to_string(
                         ws[gi * 12 + 1 :
                            CASE WHEN gi = n_groups - 1 THEN wc
                                 ELSE (gi + 1) * 12 END],
                         ' ')),
                     '. ') || '.'
         END AS ptext
  FROM p
), c AS (
  SELECT doc_id, url, title,
         CASE WHEN length(ptext) >= 100 AND wc >= 24 THEN ptext ELSE '' END AS content,
         CASE WHEN length(ptext) >= 100 AND wc >= 24 THEN wc ELSE 0 END AS cwc
  FROM pt
), r AS (
  SELECT *, cwc // 200 AS rq, cwc % 200 AS rr FROM c
)
SELECT doc_id,
       'article_' || substr(md5(url), 1, 8) || '_' || substr(md5(content), 1, 8)
         AS article_id,
       title,
       content,
       CAST(length(content) AS BIGINT) AS content_length,
       sha256(title || content || url) AS content_hash,
       CASE WHEN (
         CAST(regexp_matches(content, '\bthe\b') AS INT) +
         CAST(regexp_matches(content, '\band\b') AS INT) +
         CAST(regexp_matches(content, '\bof\b') AS INT) +
         CAST(regexp_matches(content, '\bto\b') AS INT) +
         CAST(regexp_matches(content, '\bin\b') AS INT) +
         CAST(regexp_matches(content, '\bis\b') AS INT) +
         CAST(regexp_matches(content, '\byou\b') AS INT) +
         CAST(regexp_matches(content, '\bthat\b') AS INT) +
         CAST(regexp_matches(content, '\bit\b') AS INT)
       ) > 5 THEN 'en' ELSE 'unknown' END AS language,
       CAST(greatest(1, rq + CASE WHEN 2 * rr > 200 THEN 1
                                  WHEN 2 * rr = 200 THEN rq % 2
                                  ELSE 0 END) AS BIGINT) AS read_time,
       CAST(30 + CASE WHEN length(content) > 2000 THEN 30
                      WHEN length(content) > 1000 THEN 25
                      WHEN length(content) > 500 THEN 20
                      WHEN length(content) > 200 THEN 10
                      ELSE 0 END AS BIGINT) AS quality_score,
       CAST((doc_id % 27) + 1 AS BIGINT) AS publish_day
FROM r
"""


def media_features_q(sf_dir: str):
    """Multimodal plumbing over a deterministic synthetic media table sized
    by sf (no image libs in-env: fake decode kernel, real Ray plumbing)."""
    from ..stages.multimodal import media_feature_pipeline, synthesize_media_table

    n = 60 if "0.001" in sf_dir else (200 if "0.01" in sf_dir else 600)
    media = ray.data.from_arrow(synthesize_media_table(n))
    return media_feature_pipeline(media)


def media_pipeline_stats(sf_dir: str):
    """Oracle-backed multimodal pipeline statistics: documents become media
    rows deterministically (payload = UTF-8 text bytes, kind = doc_id % 3
    over image/audio/video, video duration = 1000 + n_chars ms), flow
    through the REAL decode and frame-sample stages (fake kernels, real
    plumbing: wide binary dropped at decode, small batches), and reduce to
    per-kind counts, byte totals, checksum sums and sampled-frame counts.
    The DuckDB twin reproduces the decode stage's feat_crc integrity column
    bit-for-bit (uint32 LE of sha256(payload)[:4], parsed from DuckDB's hex
    sha256) — so the driver verifies the multimodal PLUMBING end-to-end
    even though the decode kernel itself is stubbed in this environment."""
    from ray.data.aggregate import Count, Max, Sum

    from ..stages.multimodal import FrameSampleStage, ImageDecodeStage

    ds = _read(
        sf_dir, "documents", columns=["doc_id", "text", "n_chars"]
    )
    kinds = ["image", "audio", "video"]

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = [(x or "") for x in t["text"].to_pylist()]
        n_chars = t["n_chars"].to_numpy()
        kind = [kinds[int(i) % 3] for i in ids]
        dur = np.where(ids % 3 == 0, 0, 1000 + n_chars).astype(np.int32)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "payload": pa.array([s.encode() for s in texts], pa.binary()),
            "duration_ms": pa.array(dur, pa.int32()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow").materialize()
    decoded = media.map_batches(
        ImageDecodeStage(mode="fake"),
        batch_size=ImageDecodeStage.BATCH_SIZE, batch_format="pyarrow",
    )
    per_kind = (
        decoded.groupby("kind")
        .aggregate(Count(alias_name="n_media"),
                   Sum("payload_bytes", alias_name="total_bytes"),
                   Max("payload_bytes", alias_name="max_bytes"),
                   Sum("feat_crc", alias_name="crc_sum"))
        .to_pandas()
    )
    frames = media.map_batches(
        FrameSampleStage(every_ms=500), batch_format="pyarrow",
        batch_size=FrameSampleStage.BATCH_SIZE,
    )
    n_frames = frames.count()
    per_kind["n_frames"] = np.where(
        per_kind["kind"].to_numpy() == "video", n_frames, 0
    ).astype("int64")
    for c in per_kind.columns:
        if c != "kind":
            per_kind[c] = per_kind[c].astype("int64")
    return pa.Table.from_pandas(per_kind, preserve_index=False).replace_schema_metadata(None)


def _hex_u32_le(col: str) -> str:
    """SQL for uint32-LE of the first 4 bytes of a hex sha256 string."""
    def byte(i: int) -> str:
        return (f"((strpos('0123456789abcdef', substr({col},{i},1))-1)*16"
                f" + (strpos('0123456789abcdef', substr({col},{i+1},1))-1))")
    return (f"({byte(1)} + 256*{byte(3)} + 65536*{byte(5)}"
            f" + 16777216*{byte(7)})")


SQL_MEDIA_PIPELINE_STATS = f"""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         coalesce(text, '') AS payload_txt,
         CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1000 + n_chars END
           AS duration_ms
  FROM documents
), f AS (
  SELECT kind, octet_length(encode(payload_txt)) AS nb,
         sha256(payload_txt) AS h, duration_ms
  FROM m
)
SELECT kind, CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(nb) AS BIGINT) AS total_bytes,
       CAST(max(nb) AS BIGINT) AS max_bytes,
       CAST(sum({_hex_u32_le('h')}) AS BIGINT) AS crc_sum,
       CAST(sum(CASE WHEN kind = 'video' THEN (duration_ms + 499) // 500
                     ELSE 0 END) AS BIGINT) AS n_frames
FROM f GROUP BY 1
"""


def crawl_schedule_core(sf_dir: str):
    """Oracle-backed core of the frontier scheduler (SURVEY.md O1/D1/ST4;
    north_rule "matching the reference's crawl ordering").

    Synthesizes a seed list deterministically from ``documents`` — one URL
    per doc spread over 7 hosts, plus a planted DUPLICATE row (lower
    priority, later discovery) for every doc_id % 3 == 0 to exercise
    frontier dedup — then runs the REAL multi-wave crawl loop
    (url_discovery_engine.py:102-123 dedup-first-wins + politeness budget
    semantics) against an empty pages universe (the schedule artifact does
    not depend on page bytes), and returns every epoch's schedule. The
    DuckDB twin re-derives dedup (row_number over url), per-host politeness
    waves (host_pos // budget) and within-wave crawl order with window
    functions. budget = max(16, n_docs // 30) in BOTH engines so the wave
    count stays bounded at every sf."""
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    from .crawl import read_schedule_artifacts, run_crawl

    docs = pq_.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = docs.column("doc_id").to_pylist()
    budget = max(16, len(ids) // 30)
    base = 1_700_000_000_000_000

    def seed_rows(i, dup):
        return (
            f"https://h{i % 7}.example.org/d/{i}",
            "sitemap" if dup else "rss",
            -1 if dup else i % 5,
            0,
            base + (i + 100_000) * 1_000_000 if dup else base + i * 1_000_000,
        )

    rows = [seed_rows(i, False) for i in ids] + [
        seed_rows(i, True) for i in ids if i % 3 == 0
    ]
    seeds = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "priority": pa.array([r[2] for r in rows], pa.int32()),
            "depth": pa.array([r[3] for r in rows], pa.int32()),
            "discovery_ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
        }
    )
    workdir = tempfile.mkdtemp(prefix="omni_ray_schedcore_")
    seeds_path = os.path.join(workdir, "seeds.parquet")
    pq_.write_table(seeds, seeds_path)
    pages_dir = os.path.join(workdir, "pages")  # empty: every fetch misses
    os.makedirs(pages_dir, exist_ok=True)
    out_dir = os.path.join(workdir, "out")
    run_crawl(
        pages_dir=pages_dir, seeds_path=seeds_path, out_dir=out_dir,
        budget_per_host=budget, n_buckets=4, n_seen_shards=2,
    )
    sched = read_schedule_artifacts(out_dir)
    return pa.table(
        {
            "wave": pc.cast(sched.column("wave"), pa.int64()),
            "crawl_order": pc.cast(sched.column("crawl_order"), pa.int64()),
            "url": sched.column("url"),
            "url_hash": sched.column("url_hash"),
            "host": sched.column("host"),
            "priority": pc.cast(sched.column("priority"), pa.int64()),
            "discovery_us": pc.cast(sched.column("discovery_ts"), pa.int64()),
        }
    )


SQL_CRAWL_SCHEDULE_CORE = r"""
WITH bdg AS (
  SELECT greatest(16, count(*) // 30) AS b FROM documents
), seeds AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.org/d/' || doc_id AS url,
         'h' || (doc_id % 7) || '.example.org' AS host,
         doc_id % 5 AS priority,
         1700000000000000 + doc_id * 1000000 AS discovery_us
  FROM documents
  UNION ALL
  SELECT 'https://h' || (doc_id % 7) || '.example.org/d/' || doc_id,
         'h' || (doc_id % 7) || '.example.org',
         -1,
         1700000000000000 + (doc_id + 100000) * 1000000
  FROM documents WHERE doc_id % 3 = 0
), dedup AS (
  SELECT *, row_number() OVER (
           PARTITION BY url ORDER BY priority DESC, discovery_us, url) AS rn
  FROM seeds
), pos AS (
  SELECT url, host, priority, discovery_us,
         row_number() OVER (
           PARTITION BY host ORDER BY priority DESC, discovery_us, url) - 1 AS hp
  FROM dedup WHERE rn = 1
), waved AS (
  SELECT url, host, priority, discovery_us,
         hp // (SELECT b FROM bdg) AS wave
  FROM pos
)
SELECT CAST(wave AS BIGINT) AS wave,
       CAST(row_number() OVER (
              PARTITION BY wave ORDER BY priority DESC, discovery_us, url
            ) - 1 AS BIGINT) AS crawl_order,
       url,
       md5(url) AS url_hash,
       host,
       CAST(priority AS BIGINT) AS priority,
       CAST(discovery_us AS BIGINT) AS discovery_us
FROM waved
ORDER BY wave, crawl_order
"""


def crawl_host_report(sf_dir: str):
    """Per-host frontier accounting over the crawl_schedule_core seed
    universe: distinct URLs after frontier dedup, the politeness budget,
    how many waves the host needs (ceil(n/budget)), and the last wave's
    fill rate in ppm — the capacity-planning readout a crawl operator
    checks before launching (skewed hosts show up as outsized n_waves).

    Distributed shape: seeds derive map-side from the documents id column
    (same deterministic universe as crawl_schedule_core, including the
    planted duplicate rows), URL dedup is a bucketed distinct on a url-hash
    prefix (row-sized key domain), then one bounded groupby over the 7-host
    domain; the wave arithmetic runs on the 7-row result. A pytest pins
    n_waves per host against the REAL crawl loop's schedule artifact
    (max(wave)+1 from crawl_schedule_core)."""
    import pyarrow.parquet as pq_
    from ray.data.aggregate import Count

    n_docs = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    budget = max(16, n_docs // 30)
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def seed_urls(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        dup = ids[ids % 3 == 0]
        both = np.concatenate([ids, dup])
        return pa.table({
            "host": pa.array([f"h{i % 7}.example.org" for i in both],
                             pa.string()),
            "doc_id": pa.array(both, pa.int64()),
            "ub": pa.array(both & 255, pa.int64()),
        })

    def distinct_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[["host", "doc_id"]].drop_duplicates("doc_id").reset_index(drop=True)

    per_host = (
        ds.map_batches(seed_urls, batch_format="pyarrow")
        .groupby("ub").map_groups(_pd_arrow(distinct_in_bucket),
                                  batch_format="pandas")
        .groupby("host").aggregate(Count(alias_name="n_urls"))
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    n = per_host["n_urls"].to_numpy().astype(np.int64)
    waves = (n + budget - 1) // budget
    last = n - (waves - 1) * budget
    out = pd.DataFrame({
        "host": per_host["host"],
        "n_urls": n,
        "budget": np.full(len(n), budget, dtype=np.int64),
        "n_waves": waves,
        "last_wave_urls": last,
        "last_wave_fill_ppm": last * 1_000_000 // budget,
    })
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


SQL_CRAWL_HOST_REPORT = """
WITH b AS (
  SELECT greatest(16, count(*) // 30) AS budget FROM documents
), u AS (
  SELECT DISTINCT 'h' || (doc_id % 7) || '.example.org' AS host, doc_id
  FROM documents
), g AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_urls FROM u GROUP BY host
)
SELECT host, n_urls,
       CAST(budget AS BIGINT) AS budget,
       CAST((n_urls + budget - 1) // budget AS BIGINT) AS n_waves,
       CAST(n_urls - ((n_urls + budget - 1) // budget - 1) * budget
         AS BIGINT) AS last_wave_urls,
       CAST((n_urls - ((n_urls + budget - 1) // budget - 1) * budget)
            * 1000000 // budget AS BIGINT) AS last_wave_fill_ppm
FROM g CROSS JOIN b
ORDER BY host
"""


# -- TF-IDF top terms (inverted-index / document-frequency shape) -----------


def tfidf_top_terms(sf_dir: str):
    """Per-document top-3 TF-IDF terms. The corpus-statistics operator shape:

    1. tokenize → per-(doc, term) tf rows, counted INSIDE the batch (the
       map-side combiner; token rows never materialize individually);
    2. document frequency = one groupby over the tf rows (they are already
       distinct per (doc, term), so Count == df);
    3. idf attached with a hash join on term — the vocabulary side is far
       smaller than the corpus but unbounded, so no broadcast;
    4. per-doc top-3 via hash partition on doc_id.

    The tf rows feed two consumers (df and the join), so they are
    materialized once; at 100 TB that intermediate would be written to
    parquet instead, same plan. idf is quantized half-up at 1e6 on both
    engines, and scores are exact int64 products from there."""
    import re
    from collections import Counter

    from ray.data.aggregate import Count

    tok = re.compile(r"[a-z]+")
    ds = _docs(sf_dir)
    n_docs = ds.count()

    def tf_rows(t: pa.Table) -> pa.Table:
        doc_ids, terms, tfs = [], [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            c = Counter(tok.findall((x or "").lower()))
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
    # vocabulary domain is row-sized -> bucketed combiner (BASELINE.md)
    df = _bucketed_agg(tf, ["term"], {"df": ("tf", "count")})

    def idf(t: pa.Table) -> pa.Table:
        d = t["df"].to_numpy()
        q = np.floor(np.log(float(n_docs) / d) * 1_000_000 + 0.5).astype(np.int64)
        return pa.table({"term": t["term"], "idf_q": pa.array(q, pa.int64())})

    scored = tf.join(
        df.map_batches(idf, batch_format="pyarrow"),
        join_type="inner", on=("term",), num_partitions=8,
    )

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t["doc_id"],
            "term": t["term"],
            "score": pc.multiply(t["tf"], t["idf_q"]),
        })

    import pandas as pd

    def add_db(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "_db", pc.bit_wise_and(t["doc_id"], 255))

    def top3_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket top-3: ONE sort + C-level groupby.head,
        # not one Python group per doc (BASELINE.md bucketed-agg note)
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], kind="mergesort")
        return g.groupby("doc_id", sort=False).head(3)[
            ["doc_id", "term", "score"]]

    out = (
        scored.map_batches(score, batch_format="pyarrow")
        .map_batches(add_db, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(_pd_arrow(top3_in_bucket), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_TFIDF_TOP_TERMS = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1
), n AS (SELECT count(*) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * CAST(floor(ln(CAST(n.n AS DOUBLE) / df.df) * 1000000 + 0.5) AS BIGINT)
           AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, score FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) <= 3
"""


# -- per-label embedding centroids (vector aggregate) ------------------------


def label_centroids(sf_dir: str):
    """Per-label centroid of the embedding column — the k-means/IVF building
    block as a first-class operator. Each batch reduces to per-label partial
    (sum, count) vectors with one np.add.at over the zero-copy Arrow values
    buffer (no Python row loop, no per-vector tolist); the groupby then
    moves only labels × dims × n_blocks tiny partial rows, never the
    vectors. Centroids quantized half-up at 1e6 on both engines."""
    from ray.data.aggregate import Sum

    ds = _emb_labeled(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n_rows = len(col)
        if n_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()), "n": pa.array([], pa.int64()),
            })
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // n_rows
        emb = flat.reshape(n_rows, d).astype(np.float64)
        labs = t["label"].to_numpy()
        uniq, inv = np.unique(labs, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, inv, emb)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "label": pa.array(np.repeat(uniq.astype(np.int64), d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts.astype(np.int64), d)),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy()
        n = t["n"].to_numpy()
        cq = np.floor(s / n * 1_000_000 + 0.5).astype(np.int64)
        return pa.table({
            "label": t["label"], "dim": t["dim"],
            "n": pa.array(n.astype(np.int64)), "c_q": pa.array(cq),
        })

    out = agg.map_batches(finish, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


def _emb_labeled(sf_dir: str):
    return _read(
        sf_dir, "embeddings", columns=["label", "embedding"],
        override_num_blocks=_n_blocks(),
    )


SQL_LABEL_CENTROIDS = r"""
WITH u AS (
  SELECT label, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       count(*) AS n,
       CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS c_q
FROM u GROUP BY 1, 2
"""


# -- PII scan / redaction (RE2-vectorized) -----------------------------------

# Both pyarrow.compute and DuckDB regexp_* run RE2, so the SAME pattern
# strings give bit-identical match semantics on both engines (parity-probed:
# counts and post-redaction lengths agree including \b and {m,n} forms).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_scan(sf_dir: str):
    """Per-document PII scan + redaction accounting — the pre-training
    privacy-filter operator. Entirely pyarrow.compute RE2 kernels over the
    zero-copy Arrow batch (count_substring_regex / replace_substring_regex):
    no Python row loop, no shuffle, streams at any scale. Emits match counts
    per PII class and the content length after replacing matches with
    fixed placeholder tags (what a redaction pass would store)."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        red = pc.replace_substring_regex(
            pc.replace_substring_regex(txt, _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE, "[PHONE]",
        )
        return pa.table({
            "doc_id": t["doc_id"],
            "n_emails": pc.cast(pc.count_substring_regex(txt, _PII_EMAIL), pa.int64()),
            "n_phones": pc.cast(pc.count_substring_regex(txt, _PII_PHONE), pa.int64()),
            "redacted_len": pc.cast(pc.utf8_length(red), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


SQL_PII_SCAN = r"""
SELECT doc_id,
       length(regexp_extract_all(coalesce(text, ''),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       length(regexp_extract_all(coalesce(text, ''),
              '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
       length(regexp_replace(regexp_replace(coalesce(text, ''),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g')) AS redacted_len
FROM documents
"""


def pii_redact(sf_dir: str):
    """Byte-exact PII redaction OUTPUT (pii_scan pins the counts; this pins
    the redacted text itself): emails then phones replaced with fixed tags,
    the masked text witnessed by its md5 so the oracle certifies every byte.
    Same zero-shuffle RE2 stream as pii_scan; the only Python loop is the
    md5 over the already-masked strings (hashing is not vectorizable in
    pyarrow; same pattern as text_normalize)."""
    import hashlib

    import pyarrow.compute as pc

    ds = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        red = pc.replace_substring_regex(
            pc.replace_substring_regex(txt, _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE, "[PHONE]",
        )
        hashes = [hashlib.md5(x.encode()).hexdigest() for x in red.to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "red_hash": pa.array(hashes, pa.string()),
            "redacted_len": pc.cast(pc.utf8_length(red), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


SQL_PII_REDACT = r"""
WITH r AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(coalesce(text, ''),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g') AS red
  FROM documents
)
SELECT doc_id, md5(red) AS red_hash, length(red) AS redacted_len FROM r
"""


# -- corpus bigram counts (map-side combine → one small groupby) -------------


def bigram_top_terms(sf_dir: str):
    """Top-25 corpus word bigrams. The n-gram-LM / phrase-mining building
    block: bigrams are counted INSIDE each batch (map-side combiner — token
    rows never materialize individually), so the groupby only moves
    distinct-bigram partial rows, then a bounded sort+limit picks the head.
    Deterministic tiebreak on the bigram string."""
    import re
    from collections import Counter

    from ray.data.aggregate import Sum

    tok = re.compile(r"[^a-z0-9]+")
    ds = _docs(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for x in t["text"].to_pylist():
            ws = [w for w in tok.split((x or "").lower()) if w]
            c.update(map(" ".join, zip(ws, ws[1:])))
        return pa.table({
            "bigram": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    from omni_ray.pipelines.queries import _block_topk

    keys, desc = ["n", "bigram"], [True, False]
    from .queries import _bucketed_agg

    out = (
        _bucketed_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["bigram"], {"n": ("n", "sum")})
        .map_batches(_block_topk(keys, desc, 25), batch_format="pyarrow")
        .sort(keys, descending=desc)
        .limit(25)
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_BIGRAM_TOP_TERMS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ws
  FROM documents
), w AS (
  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS i FROM toks
)
SELECT a.w || ' ' || c.w AS bigram, count(*) AS n
FROM w a JOIN w c ON a.doc_id = c.doc_id AND c.i = a.i + 1
GROUP BY 1 ORDER BY n DESC, bigram LIMIT 25
"""


# -- keep-best dedup (argmax inside an aggregate, no map_groups) -------------


def dedup_keep_best(sf_dir: str):
    """Exact-dup groups keeping the BEST copy (longest text, then lowest
    doc_id) — the production dedup rule (keep-first is a special case). The
    argmax travels THROUGH the groupby as one packed int64
    ``n_chars * 10^10 + (10^10 - doc_id)`` so a plain Max aggregate picks
    (max n_chars, min doc_id) with zero float math and no per-group UDF;
    valid while doc_id < 10^10 (asserted). Same packing in the SQL."""
    import hashlib

    from ray.data.aggregate import Count, Max

    ds = _read(
        sf_dir, "documents", columns=["doc_id", "text", "n_chars"],
        override_num_blocks=_n_blocks(),
    )

    def h(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        assert ids.max(initial=0) < 10_000_000_000
        hashes = [hashlib.md5((x or "").encode()).hexdigest()
                  for x in t["text"].to_pylist()]
        pack = t["n_chars"].to_numpy() * 10_000_000_000 + (10_000_000_000 - ids)
        return pa.table({
            "content_hash": pa.array(hashes, pa.string()),
            "pack": pa.array(pack, pa.int64()),
        })

    from .queries import _bucketed_agg

    agg = _bucketed_agg(
        ds.map_batches(h, batch_format="pyarrow"),
        ["content_hash"],
        {"pack": ("pack", "max"), "n_copies": ("pack", "count")},
    )

    def unpack(t: pa.Table) -> pa.Table:
        p = t["pack"].to_numpy()
        return pa.table({
            "content_hash": t["content_hash"],
            "best_id": pa.array(10_000_000_000 - p % 10_000_000_000),
            "best_len": pa.array(p // 10_000_000_000),
            "n_copies": t["n_copies"],
        })

    out = agg.map_batches(unpack, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_DEDUP_KEEP_BEST = """
WITH p AS (
  SELECT md5(coalesce(text, '')) AS content_hash,
         n_chars * 10000000000 + (10000000000 - doc_id) AS pack
  FROM documents
)
SELECT content_hash,
       10000000000 - max(pack) % 10000000000 AS best_id,
       max(pack) // 10000000000 AS best_len,
       count(*) AS n_copies
FROM p GROUP BY 1
"""


# -- deterministic hash sampling ---------------------------------------------


def hash_sample(sf_dir: str):
    """5% deterministic hash sample: keep doc_id iff the first 8 hex digits
    of md5(str(doc_id)) mod 20 == 0. THE scale-correct sampling rule — stable
    under re-partitioning, re-ordering and incremental reruns (systematic
    row-number sampling is not), and joinable across tables that share the
    key. Zero shuffle; the filter runs inside the column-pruned read."""
    import hashlib

    ds = _read(
        sf_dir, "documents", columns=["doc_id", "n_chars"],
        override_num_blocks=_n_blocks(),
    )

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        keep = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 20 == 0
             for i in ids),
            dtype=bool, count=len(ids),
        )
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


SQL_HASH_SAMPLE = """
SELECT doc_id, n_chars FROM documents
WHERE reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1
                       AS BIGINT)),
             (a, b) -> a * 16 + b) % 20 = 0
"""


# -- corpus length histogram -------------------------------------------------


def length_histogram(sf_dir: str):
    """Log2-banded document-length histogram — the corpus-profiling operator
    (what you look at before choosing batch/context sizes). Vectorized
    per-batch band + bincount partials; the groupby moves only band rows."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "documents", columns=["n_chars"],
        override_num_blocks=_n_blocks(),
    )

    def partial(t: pa.Table) -> pa.Table:
        n = t["n_chars"].to_numpy()
        band = np.floor(np.log2(n + 1.0)).astype(np.int64)
        uniq, inv = np.unique(band, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({
            "band": pa.array(uniq), "n_docs": pa.array(cnt),
            "total_chars": pa.array(tot),
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_chars", alias_name="total_chars"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_LENGTH_HISTOGRAM = """
SELECT CAST(floor(log2(n_chars + 1.0)) AS BIGINT) AS band,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


# -- deterministic corpus mixing ---------------------------------------------


def mix_sources(sf_dir: str):
    """Weighted data mixture: each source keeps a deterministic fraction of
    its documents — source ``srcK`` keeps ``(K+1)/20`` of rows (the mixture
    weight), selected by the same hash rule as ``hash_sample`` so the
    subset is stable under re-partitioning and reruns, and a rerun with a
    RAISED weight is a strict superset (incremental re-mixing: only the
    delta needs processing). Output is the per-source kept/total audit."""
    import hashlib

    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "documents", columns=["doc_id", "source"],
        override_num_blocks=_n_blocks(),
    )

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
             for i in ids),
            dtype=np.int64, count=len(ids),
        )
        permille = np.fromiter(
            ((int(s[3:]) + 1) * 1000 // 20 for s in srcs),
            dtype=np.int64, count=len(srcs),
        )
        return pa.table({
            "source": t["source"],
            "kept": pa.array((h < permille).astype(np.int64)),
        })

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("kept", alias_name="n_kept"), Count(alias_name="n_total"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_MIX_SOURCES = """
WITH d AS (
  SELECT source,
         CASE WHEN reduce(list_transform(range(1, 9),
                  i -> CAST(strpos('0123456789abcdef',
                                   substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1
                            AS BIGINT)),
                  (a, b) -> a * 16 + b) % 1000
              < (CAST(substr(source, 4) AS BIGINT) + 1) * 1000 // 20
         THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT source, CAST(sum(kept) AS BIGINT) AS n_kept, count(*) AS n_total
FROM d GROUP BY 1
"""


# -- cross-source duplicate overlap ------------------------------------------


def cross_source_overlap(sf_dir: str):
    """For every pair of sources, how many distinct content FINGERPRINTS
    appear in BOTH — the dataset-mixing diagnostic (is source B drawing from
    the same template pool as A?). The fingerprint is the 2-word leading
    template prefix (exact md5 would be vacuous on this corpus: zero full-text
    dups exist); swap ``_fingerprint`` for md5 for byte-exact mirroring.
    Distinct (fingerprint, source) rows shuffle once on the fingerprint;
    pairs are emitted per group and re-aggregated — output is #source-pairs
    rows, tiny at any corpus size."""
    import re
    from itertools import combinations

    import pandas as pd
    from ray.data.aggregate import Sum

    tok = re.compile(r"[^a-z0-9]+")

    ds = _read(
        sf_dir, "documents", columns=["text", "source"],
        override_num_blocks=_n_blocks(),
    )

    def h(t: pa.Table) -> pa.Table:
        fps = []
        for x in t["text"].to_pylist():
            ws = [w for w in tok.split((x or "").lower()) if w]
            fps.append(" ".join(ws[:2]))
        return pa.table({
            "content_hash": pa.array(fps, pa.string()),
            "source": t["source"],
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        srcs = sorted(set(g["source"]))
        combos = list(combinations(srcs, 2))
        # explicit dtypes: single-source groups emit EMPTY frames, and an
        # all-empty block must still carry int64/str columns for the Sum
        return pd.DataFrame({
            "source_a": pd.Series([a for a, _ in combos], dtype="object"),
            "source_b": pd.Series([b for _, b in combos], dtype="object"),
            "n_shared": pd.Series([1] * len(combos), dtype="int64"),
        })

    out = (
        ds.map_batches(h, batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(_pd_arrow(pairs), batch_format="pandas")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_shared", alias_name="n_shared"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_CROSS_SOURCE_OVERLAP = """
WITH d AS (
  SELECT DISTINCT
    array_to_string(list_slice(list_filter(
      string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
      x -> x <> ''), 1, 2), ' ') AS h,
    source
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
"""


ML_REGISTRY = {
    "media_pipeline_stats": (media_pipeline_stats, SQL_MEDIA_PIPELINE_STATS),
    "token_counts": (token_counts, SQL_TOKEN_COUNTS),
    "text_quality_stats": (text_quality_stats, SQL_TEXT_QUALITY_STATS),
    "lang_id": (lang_id, SQL_LANG_ID),
    "ngram_jaccard": (ngram_jaccard, SQL_NGRAM_JACCARD),
    "knn_bruteforce": (knn_bruteforce_q, SQL_KNN_BRUTEFORCE),
    "minhash_dedup": (minhash_dedup_q, SQL_MINHASH_DEDUP),
    "simhash_dedup": (simhash_dedup_q, SQL_SIMHASH_DEDUP),
    "embedding_neardup": (embedding_neardup_q, SQL_EMBEDDING_NEARDUP),
    "duplicate_of": (duplicate_of_q, SQL_DUPLICATE_OF),
    "quality_filter": (quality_filter, SQL_QUALITY_FILTER),
    "training_corpus_pipeline": (training_corpus_pipeline, SQL_TRAINING_CORPUS_PIPELINE),
    "decontaminate": (decontaminate, SQL_DECONTAMINATE),
    "articles41_core": (articles41_core, SQL_ARTICLES41_CORE),
    "crawl_schedule_core": (crawl_schedule_core, SQL_CRAWL_SCHEDULE_CORE),
    "crawl_host_report": (crawl_host_report, SQL_CRAWL_HOST_REPORT),
    "tfidf_top_terms": (tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "label_centroids": (label_centroids, SQL_LABEL_CENTROIDS),
    "pii_scan": (pii_scan, SQL_PII_SCAN),
    "pii_redact": (pii_redact, SQL_PII_REDACT),
    "bigram_top_terms": (bigram_top_terms, SQL_BIGRAM_TOP_TERMS),
    "dedup_keep_best": (dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "hash_sample": (hash_sample, SQL_HASH_SAMPLE),
    "length_histogram": (length_histogram, SQL_LENGTH_HISTOGRAM),
    "cross_source_overlap": (cross_source_overlap, SQL_CROSS_SOURCE_OVERLAP),
    "mix_sources": (mix_sources, SQL_MIX_SOURCES),
}

ML_ROWS_ONLY = {
    "knn_lsh": knn_lsh_q,
    "knn_ivf": knn_ivf_q,
    "text_stats": text_stats_q,
    "media_features": media_features_q,
}
