"""Web-corpus QA operators, round 3 batch 11: canonicalization collision
audit, day-over-day trending terms, encoding-damage (mojibake) scan,
per-source Jensen-Shannon divergence, and link reciprocity.

These close the remaining QA/eval gaps a web-corpus pipeline runs around
the crawl and the training mixture: the canonicalization audit measures
how many raw URL spellings the frontier's canonical key (functions/
canonical.py, north_rule "canonicalized+hashed URLs") collapses — and is
the first oracle that checks the REAL canonicalizer against an
independently-derived SQL twin rather than a stored fixture; trending
terms is the search-analytics "rising queries" rollup (reference
src/search analytics surface) re-expressed over corpus snapshot days;
the mojibake scan is the encoding-damage gate every HTML→text extractor
needs behind it (planted damage, exact accounting); JS divergence is the
data-mixture eval (how far each source's unigram distribution sits from
the corpus mix — Lee et al. 2022 use exactly this to diagnose source
skew); reciprocity is the classic directed-web-graph statistic over the
same derived edge set pagerank/HITS/triangle already share.

Integer rules (CLAUDE.md): every float crossing engines is quantized
half-up to int64 with ln-on-double composed IDENTICALLY on both sides
(the green tfidf/unigram rule); all ratios are positive-floor divisions.

Scale shape summary (details per docstring):
- url_canonical_collisions: one variant map + ONE bucketed shuffle keyed
  by canonical url (row-sized domain) + a bounded per-host groupby.
- trending_terms: distinct-(day,term) block combiner → ONE bucketed
  term shuffle; day d and d-1 rows co-locate by term so the
  day-over-day join happens inside the bucket; per-day top-3 pruned
  per bucket before the output-sized driver merge.
- mojibake_scan: stateless scan map + one bounded groupby(source).
- js_divergence_sources: (source, term) block combiner → ONE bucketed
  term shuffle; the corpus LM column is recovered INSIDE the bucket
  (sum over sources), so no term-level join or broadcast ever forms;
  bounded per-source fold + absent-mass correction on the driver.
- edge_reciprocity: derived edges → block pair combiner → ONE bucketed
  (u, v) shuffle → three global counters.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..functions.canonical import _canon_and_host
from .mlqueries import _docs
from .queries import _bucketed_agg, _pd_arrow, _read

_WORD = re.compile(r"[a-z]+")
_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


# -- url_canonical_collisions -------------------------------------------------


def url_canonical_collisions(sf_dir: str):
    """Canonicalization collision audit over deterministic URL variants.

    Synthesizes 3-4 raw spellings per document (uppercase host + www +
    default port + trailing slash; fragment; http default port; and a
    www-only variant for doc_id % 5 == 0), canonicalizes each with the
    REAL canonicalizer the frontier dedup keys on (canonical.py
    _canon_and_host — scheme/host lowercase, www/default-port strip,
    fragment drop, trailing-slash strip), and reports per host how many
    raw URLs collapse into how many canonical keys. The DuckDB twin
    derives the canonical form INDEPENDENTLY via a regexp_replace chain,
    so a green hash is a real parity proof of M4's semantics, not a
    fixture replay.

    Shape: variant map → one bucketed shuffle keyed by canonical url
    (row-sized domain → _bucketed_agg, never groupby().aggregate) →
    per-block host partials → bounded groupby(host)."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def variants(t: pa.Table) -> pa.Table:
        urls = []
        for i in t.column("doc_id").to_pylist():
            h = i % 7
            urls.append(f"https://WWW.H{h}.Example.org:443/d/{i}/")
            urls.append(f"https://h{h}.example.org/d/{i}#sec")
            urls.append(f"http://h{h}.example.org:80/d/{i}")
            if i % 5 == 0:
                urls.append(f"https://www.h{h}.example.org/d/{i}")
        canon, host = [], []
        for u in urls:
            c, hh = _canon_and_host(u)
            canon.append(c)
            host.append(hh)
        return pa.table({
            "canon": pa.array(canon, pa.string()),
            "host": pa.array(host, pa.string()),
        })

    groups = _bucketed_agg(
        ds.map_batches(variants, batch_format="pyarrow"),
        ["canon", "host"], {"n_raw": ("canon", "count")},
    )

    def host_partial(t: pa.Table) -> pa.Table:
        df = t.select(["host", "n_raw"]).to_pandas()
        g = df.groupby("host", sort=False)["n_raw"]
        p = pd.DataFrame({
            "n_raw": g.sum(),
            "n_canonical": g.size(),
            "n_collision_groups": df.assign(c=(df["n_raw"] > 1).astype(np.int64))
                                    .groupby("host", sort=False)["c"].sum(),
            "max_group": g.max(),
        }).reset_index()
        return pa.Table.from_pandas(
            p, preserve_index=False).replace_schema_metadata(None)

    out = (
        groups.map_batches(host_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_raw", alias_name="n_raw"),
            Sum("n_canonical", alias_name="n_canonical"),
            Sum("n_collision_groups", alias_name="n_collision_groups"),
            Max("max_group", alias_name="max_group"),
        )
        .to_pandas()
    )
    out = out.sort_values("host", kind="mergesort").reset_index(drop=True)
    for c in ("n_raw", "n_canonical", "n_collision_groups", "max_group"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_URL_CANONICAL_COLLISIONS = r"""
WITH v AS (
  SELECT 'https://WWW.H' || (doc_id % 7) || '.Example.org:443/d/' || doc_id
         || '/' AS url FROM documents
  UNION ALL
  SELECT 'https://h' || (doc_id % 7) || '.example.org/d/' || doc_id || '#sec'
  FROM documents
  UNION ALL
  SELECT 'http://h' || (doc_id % 7) || '.example.org:80/d/' || doc_id
  FROM documents
  UNION ALL
  SELECT 'https://www.h' || (doc_id % 7) || '.example.org/d/' || doc_id
  FROM documents WHERE doc_id % 5 = 0
), c AS (
  SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           lower(split_part(url, '#', 1)),
           '://www\.', '://'),
           '^https://([^/:]+):443', 'https://\1'),
           '^http://([^/:]+):80', 'http://\1'),
           '/$', '') AS canon
  FROM v
), g AS (
  SELECT canon,
         regexp_extract(canon, '^https?://([^/]+)', 1) AS host,
         count(*) AS n_raw
  FROM c GROUP BY 1, 2
)
SELECT host,
       CAST(sum(n_raw) AS BIGINT) AS n_raw,
       CAST(count(*) AS BIGINT) AS n_canonical,
       CAST(sum(CASE WHEN n_raw > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_collision_groups,
       CAST(max(n_raw) AS BIGINT) AS max_group
FROM g GROUP BY host ORDER BY host
"""


# -- trending_terms -----------------------------------------------------------

_TREND_MIN_DF = 3


def trending_terms(sf_dir: str):
    """Day-over-day rising terms — the search-analytics "trending" rollup
    re-expressed over corpus snapshot days (day = doc_id % 30, the same
    deterministic snapshot-day rule snapshot_diff's epochs use). Score is
    the integer cross-ratio df_cur * 1e6 // (df_prev + 1) (+1 smoothing so
    brand-new terms rank by raw df), terms below df_cur=3 dropped, top 3
    per day with (score desc, df_cur desc, term) tie-break.

    Shape: distinct-(day, term) per doc at emit; per-block combiner sums
    document frequencies BEFORE the single bucketed shuffle keyed by term
    — day d and d-1 rows for a term co-locate, so the day-over-day merge
    is a bucket-local pandas join, never a Dataset self-join; each bucket
    prunes to its per-day top-3 (the global top-3 per day is necessarily
    inside some bucket's top-3), so the driver merge sees ≤ 256 × 30 × 3
    rows regardless of corpus size."""
    ds = _docs(sf_dir)

    def emit(t: pa.Table) -> pa.Table:
        days, terms = [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            ts = set(_WORD.findall((x or "").lower()))
            days.extend([d % 30] * len(ts))
            terms.extend(sorted(ts))
        return pa.table({
            "day": pa.array(days, pa.int64()),
            "term": pa.array(terms, pa.string()),
        })

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df.groupby(["term", "day"], sort=False).size().rename("df")
        p = p.reset_index()
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % 256).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby(["term", "day"], sort=False)["df"].sum()
             .reset_index())
        prev = m.rename(columns={"day": "pday", "df": "df_prev"})
        prev["day"] = prev["pday"] + 1
        cur = m[(m["day"] >= 1) & (m["df"] >= _TREND_MIN_DF)].rename(
            columns={"df": "df_cur"})
        j = cur.merge(prev[["term", "day", "df_prev"]],
                      on=["term", "day"], how="left")
        j["df_prev"] = j["df_prev"].fillna(0).astype(np.int64)
        j["score_ppm"] = (j["df_cur"] * 1_000_000) // (j["df_prev"] + 1)
        j = j.sort_values(
            ["day", "score_ppm", "df_cur", "term"],
            ascending=[True, False, False, True], kind="mergesort")
        j = j.groupby("day", sort=False).head(3)
        return j[["day", "term", "df_cur", "df_prev", "score_ppm"]]

    parts = (
        ds.map_batches(emit, batch_format="pyarrow")
        .map_batches(_pd_arrow(partial), batch_format="pandas")
        .groupby("_kb")
        .map_groups(_pd_arrow(fold), batch_format="pandas")
        .to_pandas()  # ≤ 256 buckets × 30 days × 3 rows
    )
    parts = parts.sort_values(
        ["day", "score_ppm", "df_cur", "term"],
        ascending=[True, False, False, True], kind="mergesort")
    top = parts.groupby("day", sort=True).head(3).reset_index(drop=True)
    top["rank"] = top.groupby("day").cumcount() + 1
    top = top[["day", "rank", "term", "df_cur", "df_prev", "score_ppm"]]
    for c in ("day", "rank", "df_cur", "df_prev", "score_ppm"):
        top[c] = top[c].astype("int64")
    return pa.Table.from_pandas(
        top, preserve_index=False).replace_schema_metadata(None)


SQL_TRENDING_TERMS = r"""
WITH tok AS (
  SELECT doc_id % 30 AS day,
         unnest(list_distinct(
           regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))) AS term
  FROM documents
), df AS (
  SELECT day, term, count(*) AS df FROM tok GROUP BY 1, 2
), sc AS (
  SELECT cur.day, cur.term, cur.df AS df_cur,
         coalesce(prev.df, 0) AS df_prev,
         cur.df * 1000000 // (coalesce(prev.df, 0) + 1) AS score_ppm
  FROM df cur LEFT JOIN df prev
    ON prev.term = cur.term AND prev.day = cur.day - 1
  WHERE cur.day >= 1 AND cur.df >= 3
), rk AS (
  SELECT *, row_number() OVER (
           PARTITION BY day
           ORDER BY score_ppm DESC, df_cur DESC, term) AS rank
  FROM sc
)
SELECT CAST(day AS BIGINT) AS day, CAST(rank AS BIGINT) AS rank, term,
       CAST(df_cur AS BIGINT) AS df_cur, CAST(df_prev AS BIGINT) AS df_prev,
       CAST(score_ppm AS BIGINT) AS score_ppm
FROM rk WHERE rank <= 3 ORDER BY day, rank
"""


# -- mojibake_scan ------------------------------------------------------------


def mojibake_scan(sf_dir: str):
    """Encoding-damage gate: per source, how many documents carry U+FFFD
    replacement characters or C0 control bytes — the scan every HTML→text
    extractor needs behind it (a downstream tokenizer chokes on both).
    The synthetic corpus is clean, so damage is PLANTED deterministically
    in both engines (the minhash_recall_planted pattern): doc_id % 37 == 0
    gets 1 + doc_id % 3 replacement chars appended, doc_id % 74 == 0
    additionally one 0x01 control byte. Exact integer accounting — no
    thresholds to drift.

    Shape: stateless scan map (vectorized count_substring for U+FFFD, one
    compiled-regex pass for the control class) + one bounded
    groupby(source); nothing row-sized ever shuffles."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def scan(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        planted = [
            (x or "")
            + (" " + "�" * (1 + int(i) % 3) if int(i) % 37 == 0 else "")
            + ("\x01" if int(i) % 74 == 0 else "")
            for i, x in zip(ids, texts)
        ]
        arr = pa.array(planted, pa.string())
        n_repl = pc.count_substring(arr, "�").to_numpy().astype(np.int64)
        n_ctrl = np.array([len(_CTRL.findall(x)) for x in planted],
                          dtype=np.int64)
        bad = ((n_repl + n_ctrl) > 0).astype(np.int64)
        return pa.table({
            "source": t.column("source"),
            "bad": pa.array(bad, pa.int64()),
            "n_repl": pa.array(n_repl, pa.int64()),
            "n_ctrl": pa.array(n_ctrl, pa.int64()),
        })

    out = (
        ds.map_batches(scan, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("bad", alias_name="n_bad_docs"),
            Sum("n_repl", alias_name="n_repl_chars"),
            Sum("n_ctrl", alias_name="n_ctrl_chars"),
        )
        .to_pandas()
    )
    out = out.sort_values("source", kind="mergesort").reset_index(drop=True)
    for c in ("n_docs", "n_bad_docs", "n_repl_chars", "n_ctrl_chars"):
        out[c] = out[c].astype("int64")
    out["bad_doc_ppm"] = (out["n_bad_docs"] * 1_000_000) // out["n_docs"]
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_MOJIBAKE_SCAN = r"""
WITH planted AS (
  SELECT source,
         coalesce(text, '')
         || CASE WHEN doc_id % 37 = 0
                 THEN ' ' || repeat(chr(65533), CAST(1 + doc_id % 3 AS INT))
                 ELSE '' END
         || CASE WHEN doc_id % 74 = 0 THEN chr(1) ELSE '' END AS x
  FROM documents
), scan AS (
  SELECT source,
         length(x) - length(replace(x, chr(65533), '')) AS n_repl,
         length(x) - length(regexp_replace(
           x, '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS n_ctrl
  FROM planted
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_repl + n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bad_docs,
       CAST(sum(n_repl) AS BIGINT) AS n_repl_chars,
       CAST(sum(n_ctrl) AS BIGINT) AS n_ctrl_chars,
       CAST(sum(CASE WHEN n_repl + n_ctrl > 0 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS bad_doc_ppm
FROM scan GROUP BY source ORDER BY source
"""


# -- js_divergence_sources ----------------------------------------------------


def js_divergence_sources(sf_dir: str):
    """Per-source Jensen-Shannon divergence between the source's unigram
    distribution P and the corpus distribution Q — the data-mixture eval
    that diagnoses which sources skew the training mix. Decomposed so only
    terms PRESENT in the source are enumerated per source:

        JS(P,Q) = 0.5·Σ_present [p·ln(p/m) + q·ln(q/m)]
                  + 0.5·ln 2 · (1 − Σ_present q)        m = 0.5·(p+q)

    (absent terms have p = 0, so each contributes 0.5·q·ln 2; their q-mass
    is recovered from integer counts, never a float sum). Every per-term
    contribution is quantized half-up at 1e12 BEFORE summation (the green
    tfidf/unigram ln-on-double rule: both engines compose the identical
    double expression from identical integer inputs, so the int64 stream
    is bit-equal and summation order cannot matter).

    Shape: (source, term, cnt) block combiner → ONE bucketed shuffle keyed
    by term; the corpus count of a term is the sum over sources INSIDE its
    bucket, so no term-level join or broadcast LM ever forms; per-source
    totals are two bounded aggregates; the bounded per-source fold and the
    absent-mass correction run on ≤ 256 × n_sources driver rows."""
    from collections import Counter

    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def tf_rows(t: pa.Table) -> pa.Table:
        srcs, terms, cnts = [], [], []
        agg: Counter = Counter()
        for s, x in zip(t.column("source").to_pylist(),
                        t.column("text").to_pylist()):
            for w in _WORD.findall((x or "").lower()):
                agg[(s, w)] += 1
        for (s, w), c in agg.items():
            srcs.append(s)
            terms.append(w)
            cnts.append(c)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "term": pa.array(terms, pa.string()),
            "cnt": pa.array(cnts, pa.int64()),
        })

    st = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    totals = st.groupby("source").aggregate(Sum("cnt", alias_name="t"))
    ts = {r["source"]: int(r["t"]) for r in totals.take_all()}
    big_t = sum(ts.values())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = (df.groupby(["term", "source"], sort=False)["cnt"].sum()
             .reset_index())
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % 256).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby(["term", "source"], sort=False)["cnt"].sum()
             .reset_index())
        corpus = m.groupby("term", sort=False)["cnt"].sum().rename("c")
        m = m.merge(corpus.reset_index(), on="term")
        tsv = m["source"].map(ts).to_numpy(dtype=np.float64)
        p = m["cnt"].to_numpy(dtype=np.float64) / tsv
        q = m["c"].to_numpy(dtype=np.float64) / float(big_t)
        mm = 0.5 * (p + q)
        contrib = 0.5 * (p * np.log(p / mm) + q * np.log(q / mm))
        m["cq"] = np.floor(contrib * 1_000_000_000_000.0 + 0.5).astype(
            np.int64)
        out = m.groupby("source", sort=False).agg(
            js_part=("cq", "sum"), n_terms=("term", "size"),
            sc=("c", "sum")).reset_index()
        return out

    parts = (
        st.map_batches(_pd_arrow(partial), batch_format="pandas")
        .groupby("_kb")
        .map_groups(_pd_arrow(fold), batch_format="pandas")
        .to_pandas()  # ≤ 256 buckets × n_sources rows
    )
    agg = parts.groupby("source", sort=True).agg(
        js_part=("js_part", "sum"), n_terms=("n_terms", "sum"),
        sc=("sc", "sum")).reset_index()
    absent = np.floor(
        0.5 * np.log(2.0)
        * ((big_t - agg["sc"].to_numpy(dtype=np.int64)) / float(big_t))
        * 1_000_000_000_000.0 + 0.5
    ).astype(np.int64)
    agg["js_e12"] = agg["js_part"].astype("int64") + absent
    out = agg[["source", "n_terms", "js_e12"]].copy()
    out["n_terms"] = out["n_terms"].astype("int64")
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_JS_DIVERGENCE_SOURCES = r"""
WITH tok AS (
  SELECT source,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
           AS term
  FROM documents
), st AS (
  SELECT source, term, count(*) AS cnt FROM tok GROUP BY 1, 2
), ct AS (
  SELECT term, sum(cnt) AS c FROM st GROUP BY 1
), ts AS (
  SELECT source, sum(cnt) AS t FROM st GROUP BY 1
), tt AS (
  SELECT sum(cnt) AS t FROM st
), pq AS (
  SELECT st.source,
         CAST(st.cnt AS DOUBLE) / ts.t AS p,
         CAST(ct.c AS DOUBLE) / tt.t AS q,
         ct.c AS c
  FROM st
  JOIN ct USING (term) JOIN ts USING (source) CROSS JOIN tt
), contrib AS (
  SELECT source,
         CAST(floor(0.5 * (p * ln(p / (0.5 * (p + q)))
                           + q * ln(q / (0.5 * (p + q))))
                    * 1000000000000.0 + 0.5) AS BIGINT) AS cq,
         c
  FROM pq
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(cq)
            + floor(0.5 * ln(2.0)
                    * (CAST((SELECT t FROM tt) - sum(c) AS DOUBLE)
                       / (SELECT t FROM tt))
                    * 1000000000000.0 + 0.5) AS BIGINT) AS js_e12
FROM contrib GROUP BY source ORDER BY source
"""


# -- edge_reciprocity ---------------------------------------------------------


def edge_reciprocity(sf_dir: str):
    """Link reciprocity over the shared derived web graph (dst = (7·src+j)
    mod n, j ∈ 1..3, self-loops removed — the same edge set pagerank /
    HITS / triangle_count use): what fraction of directed edges have the
    reverse edge. The classic directed-graph statistic (Garlaschelli &
    Loffredo 2004): reciprocated-edge ppm = 2 · reciprocal-pairs · 1e6 //
    edges.

    Shape: edges derive vectorized per block (no edge table is ever
    stored); unordered-pair keys carry a direction bit (1 = src<dst,
    2 = src>dst; each direction occurs at most once per pair since the
    three j-offsets are distinct mod n), so ONE bucketed (u, v) shuffle
    with sum(bit) = 3 marking reciprocal pairs; three global counters
    come back."""
    from .graphops import _n_docs

    n = _n_docs(sf_dir)
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        src = t.column("doc_id").to_numpy()
        us, vs, bits = [], [], []
        for j in (1, 2, 3):
            dst = (7 * src + j) % n
            keep = dst != src
            s, d = src[keep], dst[keep]
            us.append(np.minimum(s, d))
            vs.append(np.maximum(s, d))
            bits.append(np.where(s < d, 1, 2).astype(np.int64))
        return pa.table({
            "u": pa.array(np.concatenate(us), pa.int64()),
            "v": pa.array(np.concatenate(vs), pa.int64()),
            "bit": pa.array(np.concatenate(bits), pa.int64()),
            "one": pa.array(
                np.ones(sum(len(x) for x in us), dtype=np.int64), pa.int64()),
        })

    pairs = _bucketed_agg(
        ds.map_batches(edges, batch_format="pyarrow"),
        ["u", "v"], {"b": ("bit", "sum"), "c": ("one", "sum")},
    )

    def counters(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy()
        c = t.column("c").to_numpy()
        return pa.table({
            "n_pairs": pa.array([len(b)], pa.int64()),
            "n_reciprocal": pa.array([int((b == 3).sum())], pa.int64()),
            "n_edges": pa.array([int(c.sum())], pa.int64()),
        })

    agg = pairs.map_batches(counters, batch_format="pyarrow").aggregate(
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("n_reciprocal", alias_name="n_reciprocal"),
        Sum("n_edges", alias_name="n_edges"),
    )
    n_pairs = int(agg["n_pairs"])
    n_rec = int(agg["n_reciprocal"])
    n_edges = int(agg["n_edges"])
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "n_reciprocal": pa.array([n_rec], pa.int64()),
        "reciprocity_ppm": pa.array(
            [(2 * n_rec * 1_000_000) // n_edges], pa.int64()),
    })


SQL_EDGE_RECIPROCITY = r"""
WITH nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7 * doc_id + j.j) % nn.n AS dst
  FROM documents CROSS JOIN nn
  CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
  WHERE (7 * doc_id + j.j) % nn.n != doc_id
), pairs AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v,
         sum(CASE WHEN src < dst THEN 1 ELSE 2 END) AS b,
         count(*) AS c
  FROM edges GROUP BY 1, 2
)
SELECT CAST(sum(c) AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN b = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reciprocal,
       CAST(2 * sum(CASE WHEN b = 3 THEN 1 ELSE 0 END) * 1000000
            // sum(c) AS BIGINT) AS reciprocity_ppm
FROM pairs
"""


WEBQA_REGISTRY = {
    "url_canonical_collisions": (url_canonical_collisions,
                                 SQL_URL_CANONICAL_COLLISIONS),
    "trending_terms": (trending_terms, SQL_TRENDING_TERMS),
    "mojibake_scan": (mojibake_scan, SQL_MOJIBAKE_SCAN),
    "js_divergence_sources": (js_divergence_sources,
                              SQL_JS_DIVERGENCE_SOURCES),
    "edge_reciprocity": (edge_reciprocity, SQL_EDGE_RECIPROCITY),
}
