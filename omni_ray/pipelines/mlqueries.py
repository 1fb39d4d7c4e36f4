"""Training-data operator queries (dedup / similarity / text analysis) over
the ``documents`` and ``embeddings`` tables, with DuckDB oracles where the
semantics are SQL-expressible and rows-only entries for the sketch-based ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _n_blocks() -> int:
    """Block count for the single-file sandbox tables: ≈ CPU count. Ray's
    default split targets large multi-file corpora and shreds a small file
    into hundreds of tiny blocks, which makes every downstream sort/groupby
    pay per-block overhead (measured 3.5× wall-time on the dedup queries).
    On a real multi-file corpus, drop the override and let the default rule."""
    import ray as _ray

    return max(8, int(_ray.cluster_resources().get("CPU", 8)))


def _docs(sf_dir: str):
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=_n_blocks(),
    )


def _emb(sf_dir: str):
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
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


# -- rows-only entries (sketches / stubs) -----------------------------------


def minhash_dedup_q(sf_dir: str):
    from ..stages.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(sf_dir), threshold=0.5)


def simhash_dedup_q(sf_dir: str):
    from ..stages.dedup import simhash_dedup_pairs

    return simhash_dedup_pairs(_docs(sf_dir), max_hamming=3)


def embedding_neardup_q(sf_dir: str):
    from ..stages.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(_emb(sf_dir), threshold=0.95)


def knn_lsh_q(sf_dir: str):
    import pyarrow.parquet as pq

    from ..stages.simsearch import knn_lsh

    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, N_QUERIES)
    ids = head.column("vec_id").to_pylist()
    vecs = np.asarray(head.column("embedding").to_pylist(), dtype=np.float64)
    return knn_lsh(_emb(sf_dir), vecs, ids, k=KNN_K)


def knn_ivf_q(sf_dir: str):
    import pyarrow.parquet as pq

    from ..stages.simsearch import knn_ivf

    head = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, N_QUERIES)
    ids = head.column("vec_id").to_pylist()
    vecs = np.asarray(head.column("embedding").to_pylist(), dtype=np.float64)
    return knn_ivf(_emb(sf_dir), vecs, ids, k=KNN_K)


def duplicate_of_q(sf_dir: str):
    """D2 duplicate_of assignment: MinHash-LSH verified pairs folded into
    connected components, keeper = min doc_id."""
    from ..stages.dedup import duplicate_groups, minhash_dedup_pairs

    return duplicate_groups(minhash_dedup_pairs(_docs(sf_dir), threshold=0.5))


def text_stats_q(sf_dir: str):
    from ..functions.textstats import text_stats_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return ds.map_batches(text_stats_batch, batch_format="pyarrow").drop_columns(["text"])


def media_features_q(sf_dir: str):
    """Multimodal plumbing over a deterministic synthetic media table sized
    by sf (no image libs in-env: fake decode kernel, real Ray plumbing)."""
    from ..stages.multimodal import media_feature_pipeline, synthesize_media_table

    n = 60 if "0.001" in sf_dir else (200 if "0.01" in sf_dir else 600)
    media = ray.data.from_arrow(synthesize_media_table(n))
    return media_feature_pipeline(media)


ML_REGISTRY = {
    "token_counts": (token_counts, SQL_TOKEN_COUNTS),
    "text_quality_stats": (text_quality_stats, SQL_TEXT_QUALITY_STATS),
    "lang_id": (lang_id, SQL_LANG_ID),
    "ngram_jaccard": (ngram_jaccard, SQL_NGRAM_JACCARD),
    "knn_bruteforce": (knn_bruteforce_q, SQL_KNN_BRUTEFORCE),
}

ML_ROWS_ONLY = {
    "minhash_dedup": minhash_dedup_q,
    "duplicate_of": duplicate_of_q,
    "simhash_dedup": simhash_dedup_q,
    "embedding_neardup": embedding_neardup_q,
    "knn_lsh": knn_lsh_q,
    "knn_ivf": knn_ivf_q,
    "text_stats": text_stats_q,
    "media_features": media_features_q,
}
