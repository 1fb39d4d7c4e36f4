"""Operator batch 20 — search-engine analytics the reference's ES surface
implies but never ships.

Reference anchors: the reference fronts Elasticsearch for search
(`src/search/advanced_search.py` — multi_match, facets, highlights, already
covered by `queries.multi_field_search`); these add the NEXT ES reads a
search team runs, plus the corpus-balancing read of the training-data
mission:

- significant_terms: the ES significant-terms aggregation (terms
  over-represented in a foreground subset vs the whole corpus, JLH-style
  ratio score) — the "what is this slice about" read.
- mlt_topk: More-Like-This — top-10 documents by count of distinct terms
  shared with a query document; broadcast query-term set, zero shuffle
  before the bounded top-k.
- bib_coupling_topk: bibliographic coupling over the derived link graph —
  top-20 doc pairs by number of SHARED out-neighbors (Kessler 1963), the
  link-based related-pages primitive; pairs explode inside in-degree-
  bounded dst groups, never all-pairs.
- class_balance_downsample: per-language balanced corpus plan — every
  language downsampled to the minority-class count, keepers chosen
  deterministically (lowest doc_id); the class-rebalancing step of corpus
  assembly, reported as a bounded per-language rollup.

Tokenization matches the repo convention everywhere: `[a-z]+` over
lowercased text in Python and `regexp_extract_all(lower(text), '[a-z]+')`
in the DuckDB twins.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .graphops import _make_edges_fn, _n_docs
from .queries import _bucketed_agg, _pd_arrow, _read

_WORD = re.compile(r"[a-z]+")

_ST_FG_SOURCE = "src0"  # significant-terms foreground slice
_ST_MIN_FG = 2          # term must appear in >= 2 foreground docs
_ST_SCALE = 1_000_000

_MLT_QUERY_DOC = 0
_MLT_K = 10

_BIB_K = 20

_SQL_TERMS = (
    "SELECT DISTINCT doc_id, source,"
    " unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term"
    " FROM documents"
)


# ---------------------------------------------------------------------------
# significant_terms
# ---------------------------------------------------------------------------


def significant_terms(sf_dir: str):
    """Top-20 terms most over-represented in the `src0` slice vs the whole
    corpus: score_q = fg_df · N · 10^6 // (bg_df · F) (integer JLH-style
    lift), requiring fg_df ≥ 2; ties broken by term.

    Scale shape: per-doc DISTINCT terms stream through ONE term-keyed
    bucketed fold carrying (fg, bg) counts; the sort ranks only terms that
    pass the foreground floor (slice-sized, not corpus-sized)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_fg", pc.cast(pc.equal(t["source"], _ST_FG_SOURCE), pa.int64()))

    counts = ds.map_batches(tag, batch_format="pyarrow") \
        .aggregate(Count(alias_name="n_total"), Sum("_fg", alias_name="n_fg"))
    n_total = int(counts["n_total"])
    n_fg = int(counts["n_fg"])

    def doc_terms(t: pa.Table) -> pa.Table:
        terms, fgs = [], []
        srcs = t["source"].to_pylist()
        for text, src in zip(t["text"].to_pylist(), srcs):
            fg = 1 if src == _ST_FG_SOURCE else 0
            for w in set(_WORD.findall(text.lower())):
                terms.append(w)
                fgs.append(fg)
        n = len(terms)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "fg": pa.array(fgs, pa.int64()),
            "bg": pa.array(np.ones(n, np.int64)),
        })

    per_term = _bucketed_agg(
        ds.map_batches(doc_terms, batch_format="pyarrow"),
        ["term"], {"fg": ("fg", "sum"), "bg": ("bg", "sum")},
    )

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["fg"], _ST_MIN_FG))
        fg = t["fg"].to_numpy()
        bg = t["bg"].to_numpy()
        s = fg * n_total * _ST_SCALE // (bg * n_fg)
        return pa.table({
            "term": t["term"],
            "fg_df": pa.array(fg, pa.int64()),
            "bg_df": pa.array(bg, pa.int64()),
            "score_q": pa.array(s, pa.int64()),
        })

    return (
        per_term.map_batches(score, batch_format="pyarrow")
        .sort(["score_q", "term"], descending=[True, False])
        .limit(20)
    )


SQL_SIGNIFICANT_TERMS = f"""
WITH terms AS ({_SQL_TERMS}),
nn AS (SELECT count(*) AS n_total,
              sum(CASE WHEN source = '{_ST_FG_SOURCE}' THEN 1 ELSE 0 END)
                AS n_fg
       FROM documents),
per_term AS (
  SELECT term,
         sum(CASE WHEN source = '{_ST_FG_SOURCE}' THEN 1 ELSE 0 END) AS fg_df,
         count(*) AS bg_df
  FROM terms GROUP BY 1
)
SELECT term, CAST(fg_df AS BIGINT) AS fg_df, CAST(bg_df AS BIGINT) AS bg_df,
       CAST(fg_df * nn.n_total * {_ST_SCALE} // (bg_df * nn.n_fg) AS BIGINT)
         AS score_q
FROM per_term CROSS JOIN nn
WHERE fg_df >= {_ST_MIN_FG}
ORDER BY score_q DESC, term LIMIT 20
"""


# ---------------------------------------------------------------------------
# mlt_topk
# ---------------------------------------------------------------------------


def mlt_topk(sf_dir: str):
    """More-Like-This: top-10 documents by count of DISTINCT terms shared
    with document 0 (ties → smaller doc_id), score > 0, query doc excluded.

    Scale shape: the query document's term set is fetched once (single-row
    pushdown read) and broadcast; scoring is one zero-shuffle map; only the
    bounded top-k sorts."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    qrow = ds.filter(expr=f"doc_id == {_MLT_QUERY_DOC}").take(1)
    qterms = frozenset(_WORD.findall(qrow[0]["text"].lower()))
    qref = ray.put(qterms)

    def score(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        ids = t["doc_id"].to_numpy()
        s = np.fromiter(
            (len(qs.intersection(_WORD.findall(x.lower())))
             for x in t["text"].to_pylist()),
            dtype=np.int64, count=t.num_rows)
        keep = (ids != _MLT_QUERY_DOC) & (s > 0)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "shared_terms": pa.array(s[keep], pa.int64()),
        })

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["shared_terms", "doc_id"], descending=[True, False])
        .limit(_MLT_K)
    )


SQL_MLT_TOPK = f"""
WITH terms AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
), q AS (SELECT term FROM terms WHERE doc_id = {_MLT_QUERY_DOC})
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS shared_terms
FROM terms t JOIN q ON t.term = q.term
WHERE t.doc_id != {_MLT_QUERY_DOC}
GROUP BY 1
ORDER BY shared_terms DESC, doc_id LIMIT {_MLT_K}
"""


# ---------------------------------------------------------------------------
# bib_coupling_topk
# ---------------------------------------------------------------------------


def bib_coupling_topk(sf_dir: str):
    """Top-20 document pairs by SHARED out-neighbor count in the derived
    link graph (bibliographic coupling; ties → smaller (a, b)).

    Scale shape: edges shuffle ONCE keyed by dst; pair expansion happens
    inside each dst group (in-degree-bounded — ≤3 here, never all-pairs),
    then one pair-keyed bucketed count and a pair-sized top-k sort."""
    n = _n_docs(sf_dir)
    edges = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(_make_edges_fn(n), batch_format="pyarrow")
    )

    def to_bucket(t: pa.Table) -> pa.Table:
        d = t["dst"].to_numpy()
        return pa.table({
            "src": t["src"], "dst": t["dst"],
            "_kb": pa.array(d % 256, pa.int64()),
        })

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="dst")
        m = m[m["src_x"] < m["src_y"]]
        return pd.DataFrame({
            "a": m["src_x"].to_numpy(np.int64),
            "b": m["src_y"].to_numpy(np.int64),
            "shared": np.ones(len(m), np.int64),
        })

    pairs = (
        edges.map_batches(to_bucket, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(expand), batch_format="pandas")
    )
    return (
        _bucketed_agg(pairs, ["a", "b"], {"shared": ("shared", "sum")})
        .sort(["shared", "a", "b"], descending=[True, False, False])
        .limit(_BIB_K)
    )


SQL_BIB_COUPLING_TOPK = f"""
WITH nodes AS (SELECT doc_id FROM documents),
nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id + j.j) % nn.n AS dst
  FROM nodes CROSS JOIN nn CROSS JOIN (SELECT unnest([1,2,3]) AS j) j
  WHERE (7*doc_id + j.j) % nn.n != doc_id
)
SELECT e1.src AS a, e2.src AS b, CAST(count(*) AS BIGINT) AS shared
FROM edges e1 JOIN edges e2 ON e1.dst = e2.dst AND e1.src < e2.src
GROUP BY 1, 2
ORDER BY shared DESC, a, b LIMIT {_BIB_K}
"""


# ---------------------------------------------------------------------------
# class_balance_downsample
# ---------------------------------------------------------------------------


def class_balance_downsample(sf_dir: str):
    """Balanced-corpus plan: every language downsampled to the minority
    language's document count, keepers chosen deterministically (lowest
    doc_id first); reported as the bounded per-language rollup (kept,
    dropped, kept-id checksum).

    Scale shape: one bounded per-language count (languages are a bounded
    domain → plain groupby), quota broadcast by closure, then per-language
    rank-and-cut inside map_groups; only the rollup leaves the cluster."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    per_lang = ds.groupby("lang").aggregate(Count(alias_name="c")).to_pandas()
    quota = int(per_lang["c"].min())

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        kept = g.head(quota)
        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "kept": np.int64(len(kept)),
            "dropped": np.int64(len(g) - len(kept)),
            "kept_id_sum": np.int64(kept["doc_id"].sum()),
        })

    return (
        ds.groupby("lang")
        .map_groups(_pd_arrow(cut), batch_format="pandas")
        .sort("lang")
    )


SQL_CLASS_BALANCE_DOWNSAMPLE = """
WITH q AS (
  SELECT min(c) AS quota FROM (
    SELECT lang, count(*) AS c FROM documents GROUP BY 1)
), ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
)
SELECT lang,
       CAST(sum(CASE WHEN rn <= q.quota THEN 1 ELSE 0 END) AS BIGINT)
         AS kept,
       CAST(sum(CASE WHEN rn > q.quota THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped,
       CAST(sum(CASE WHEN rn <= q.quota THEN doc_id ELSE 0 END) AS BIGINT)
         AS kept_id_sum
FROM ranked CROSS JOIN q GROUP BY lang ORDER BY lang
"""


SEARCHX_REGISTRY = {
    "significant_terms": (significant_terms, SQL_SIGNIFICANT_TERMS),
    "mlt_topk": (mlt_topk, SQL_MLT_TOPK),
    "bib_coupling_topk": (bib_coupling_topk, SQL_BIB_COUPLING_TOPK),
    "class_balance_downsample": (class_balance_downsample,
                                 SQL_CLASS_BALANCE_DOWNSAMPLE),
}
