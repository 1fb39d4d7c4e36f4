"""Operator batch 42 — boolean retrieval, ecological estimation, lexical
adaptation and weekly seasonality.

Reference anchors: the reference's search is Elasticsearch multi_match
(disjunctive, scored); these add the conjunctive and statistical reads:

- boolean_and_search: doc-at-a-time conjunctive retrieval — documents
  containing ALL three of the corpus's highest-df terms, with the count
  and the first 10 doc ids; the AND-semantics complement to
  keyword_search's OR scoring.
- capture_recapture_vocab: the Lincoln–Petersen estimate of the TRUE
  vocabulary size from the two corpus halves (N̂ = n₁·n₂ // m, the
  mark-recapture estimator) against the observed vocabulary — how much
  vocab the corpus hasn't seen yet.
- term_adaptation_topk: Church's adaptation statistic for the top-10 df
  terms — P(term repeats within a doc | it occurred): df, docs with ≥ 2
  occurrences, adaptation ppm. Bursty terms adapt; function words don't.
- weekend_lift: per event type, the rate lift of weekend days (epoch
  day % 7 ∈ {2, 3} — a fixed shared convention) over weekdays, in ppm.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .engineops import _DAY_US
from .fpindex import _exact_doc_id_cuts
from .queries import _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")

_BOOL_TOP_IDS = 10
_ADAPT_TOP = 10
_LEX_BUCKETS = 256
_WEEKEND = (2, 3)


def _top_df_terms(ds, k: int) -> pd.DataFrame:
    """Top-k terms by document frequency (ties to term asc) with df,
    via the house term-bucketed distinct fold with per-bucket prune."""
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        term_l, doc_l = [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            for wd in set(_WORD_RE.findall((tx or "").lower())):
                term_l.append(wd)
                doc_l.append(did)
        p = pd.DataFrame({"term": term_l, "doc_id": doc_l})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _LEX_BUCKETS).astype(np.int64)
        return p

    def bucket_df(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["term", "doc_id"])
        cnt = d.groupby("term", sort=False).size().reset_index(name="df")
        return cnt.sort_values(["df", "term"], ascending=[False, True]) \
            .head(k)

    return (
        ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(bucket_df),
                                   batch_format="pandas")
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])
        .head(k)
    )


# ---------------------------------------------------------------------------
# boolean_and_search
# ---------------------------------------------------------------------------


def boolean_and_search(sf_dir: str):
    """Conjunctive (AND) retrieval: documents containing ALL three
    highest-df terms. One row per hit among the 10 smallest doc ids,
    plus a summary row (doc_id = -1) carrying the total hit count.

    Scale shape: the 3-term query set broadcasts; matching is one
    zero-shuffle map with block-local smallest-10 pruning; the summary
    count folds in a bounded aggregate."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .materialize()
    q = list(_top_df_terms(ds, 3)["term"])
    qset = set(q)

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(did for did, tx in zip(df["doc_id"], df["text"])
                     if qset <= set(_WORD_RE.findall((tx or "").lower())))
        # block-local smallest-10 prune + one count-partial sentinel row
        return pd.DataFrame({
            "doc_id": pd.array(ids[:_BOOL_TOP_IDS] + [-1], "int64"),
            "cnt": pd.array([0] * min(len(ids), _BOOL_TOP_IDS)
                            + [len(ids)], "int64"),
        })

    all_hits = ds.map_batches(_pd_arrow(hits), batch_format="pandas") \
        .to_pandas()
    total = int(all_hits.loc[all_hits["doc_id"] == -1, "cnt"].sum())
    top = all_hits[all_hits["doc_id"] >= 0].sort_values("doc_id") \
        .head(_BOOL_TOP_IDS)
    out = pd.concat([
        pd.DataFrame({"doc_id": [np.int64(-1)], "n_hits": np.int64(total)}),
        pd.DataFrame({"doc_id": top["doc_id"].astype("int64"),
                      "n_hits": np.int64(total)}),
    ], ignore_index=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_BOOLEAN_AND_SEARCH = f"""
WITH t AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
), q AS (
  SELECT term FROM (SELECT term, count(*) AS df FROM t GROUP BY 1)
  ORDER BY df DESC, term LIMIT 3
), hits AS (
  SELECT doc_id FROM t JOIN q USING (term)
  GROUP BY doc_id HAVING count(*) = 3
), n AS (SELECT count(*) AS total FROM hits)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST((SELECT total FROM n) AS BIGINT) AS n_hits
FROM (
  SELECT -1 AS doc_id
  UNION ALL
  SELECT doc_id FROM hits ORDER BY doc_id LIMIT {_BOOL_TOP_IDS + 1}
) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# capture_recapture_vocab
# ---------------------------------------------------------------------------


def capture_recapture_vocab(sf_dir: str):
    """Lincoln–Petersen vocabulary estimate: with n₁ / n₂ the distinct
    terms of each corpus half (split at the exact median doc_id) and m
    the terms in BOTH, N̂ = n₁·n₂ // m; reported with the observed
    vocabulary and the unseen-share estimate in ppm
    ((N̂ − observed)·10⁶ // N̂, floored at 0).

    Scale shape: per-term half-presence folds in ONE term-bucketed
    shuffle emitting three bounded counters per bucket."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    agg = ds.aggregate(Min("doc_id"), Max("doc_id"), Count())
    lo, hi, n = (int(agg["min(doc_id)"]), int(agg["max(doc_id)"]),
                 int(agg["count()"]))
    cut = int(_exact_doc_id_cuts(ds, lo, hi, n)[4])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        term_l, h_l = [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            h = 0 if did <= cut else 1
            for wd in set(_WORD_RE.findall((tx or "").lower())):
                term_l.append(wd)
                h_l.append(h)
        p = pd.DataFrame({"term": term_l, "h": h_l}).drop_duplicates()
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _LEX_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["term", "h"])
        pres = d.groupby("term", sort=False)["h"].agg(["min", "max",
                                                       "count"])
        n1 = int((pres["min"] == 0).sum())
        n2 = int((pres["max"] == 1).sum())
        m = int((pres["count"] == 2).sum())
        return pd.DataFrame({"n1": [np.int64(n1)], "n2": np.int64(n2),
                             "m": np.int64(m),
                             "obs": np.int64(len(pres))})

    tot = (
        ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .aggregate(Sum("n1", alias_name="n1"), Sum("n2", alias_name="n2"),
                   Sum("m", alias_name="m"), Sum("obs", alias_name="obs"))
        or {})
    n1, n2 = int(tot.get("n1") or 0), int(tot.get("n2") or 0)
    m, obs = int(tot.get("m") or 0), int(tot.get("obs") or 0)
    est = n1 * n2 // m if m else 0
    out = pd.DataFrame({
        "n_half1": [np.int64(n1)], "n_half2": np.int64(n2),
        "n_both": np.int64(m), "observed_vocab": np.int64(obs),
        "estimated_vocab": np.int64(est),
        "unseen_ppm": np.int64(max(0, est - obs) * 1_000_000 // est
                               if est else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CAPTURE_RECAPTURE_VOCAB = """
WITH t AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
), ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM documents
), cut AS (
  SELECT doc_id AS c FROM ranked
  WHERE rn = (5 * (SELECT count(*) FROM documents) + 9) // 10
), pres AS (
  SELECT term,
         max(CASE WHEN doc_id <= (SELECT c FROM cut) THEN 1 ELSE 0 END)
           AS in1,
         max(CASE WHEN doc_id > (SELECT c FROM cut) THEN 1 ELSE 0 END)
           AS in2
  FROM t GROUP BY term
), s AS (
  SELECT sum(in1) AS n1, sum(in2) AS n2,
         sum(CASE WHEN in1 = 1 AND in2 = 1 THEN 1 ELSE 0 END) AS m,
         count(*) AS obs
  FROM pres
)
SELECT CAST(n1 AS BIGINT) AS n_half1, CAST(n2 AS BIGINT) AS n_half2,
       CAST(m AS BIGINT) AS n_both, CAST(obs AS BIGINT) AS observed_vocab,
       CAST(CASE WHEN m = 0 THEN 0 ELSE n1 * n2 // m END AS BIGINT)
         AS estimated_vocab,
       CAST(CASE WHEN m = 0 OR n1 * n2 // m = 0 THEN 0
                 ELSE greatest(n1 * n2 // m - obs, 0) * 1000000
                      // (n1 * n2 // m) END AS BIGINT) AS unseen_ppm
FROM s
"""


# ---------------------------------------------------------------------------
# term_adaptation_topk
# ---------------------------------------------------------------------------


def term_adaptation_topk(sf_dir: str):
    """Church adaptation for the top-10 df terms: df, the number of docs
    where the term occurs ≥ 2 times, and adaptation_ppm = df2⁺·10⁶ //
    df — the burstiness signature (content words adapt, function words
    don't).

    Scale shape: per-doc occurrence counts fold block-locally into
    (term, df, df2) partials through ONE term-bucketed shuffle with
    per-bucket top-10 prune."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        term_l, doc_l, two_l = [], [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            local: dict = {}
            for w in _WORD_RE.findall((tx or "").lower()):
                local[w] = local.get(w, 0) + 1
            for w, c in local.items():
                term_l.append(w)
                doc_l.append(did)
                two_l.append(1 if c >= 2 else 0)
        p = pd.DataFrame({"term": term_l, "doc_id": doc_l, "two": two_l})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _LEX_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["term", "doc_id"])
        cnt = d.groupby("term", sort=False).agg(
            df=("doc_id", "size"), df2=("two", "sum")).reset_index()
        return cnt.sort_values(["df", "term"], ascending=[False, True]) \
            .head(_ADAPT_TOP)

    top = (
        ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])
        .head(_ADAPT_TOP).reset_index(drop=True)
    )
    top["adaptation_ppm"] = (top["df2"].astype("int64") * 1_000_000
                             // top["df"].astype("int64"))
    out = top[["term", "df", "df2", "adaptation_ppm"]]
    for c in ("df", "df2", "adaptation_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_TERM_ADAPTATION_TOPK = f"""
WITH occ AS (
  SELECT doc_id, term, count(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
  GROUP BY 1, 2
), stats AS (
  SELECT term, count(*) AS df,
         sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS df2
  FROM occ GROUP BY term
)
SELECT term, CAST(df AS BIGINT) AS df, CAST(df2 AS BIGINT) AS df2,
       CAST(df2 * 1000000 // df AS BIGINT) AS adaptation_ppm
FROM stats ORDER BY df DESC, term LIMIT {_ADAPT_TOP}
"""


# ---------------------------------------------------------------------------
# weekend_lift
# ---------------------------------------------------------------------------


def weekend_lift(sf_dir: str):
    """Weekend lift per event type: with weekend = epoch-day % 7 ∈
    {2, 3} (a fixed shared convention), lift_ppm = (weekend_count ·
    n_weekday_days · 10⁶) // (weekday_count · n_weekend_days) — > 1e6
    means the type over-indexes on weekends.

    Scale shape: one bounded (type, is_weekend) groupby over the global
    day range."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        return pa.table({
            "event_type": t["event_type"],
            "we": pa.array(np.isin(d % 7, _WEEKEND).astype(np.int64),
                           pa.int64()),
            "day": pa.array(d, pa.int64()),
        })

    dd = ev.map_batches(prep, batch_format="pyarrow").materialize()
    agg = dd.aggregate(Min("day"), Max("day")) or {}
    lo, hi = int(agg["min(day)"]), int(agg["max(day)"])
    days = np.arange(lo, hi + 1)
    n_we = int(np.isin(days % 7, _WEEKEND).sum())
    n_wd = len(days) - n_we
    cells = (
        dd.groupby(["event_type", "we"]).aggregate(Count(alias_name="c"))
        .to_pandas().set_index(["event_type", "we"])["c"]
    )
    types = sorted({t for t, _ in cells.index})
    rows = []
    for t in types:
        cwe = int(cells.get((t, 1), 0))
        cwd = int(cells.get((t, 0), 0))
        lift = (cwe * n_wd * 1_000_000 // (cwd * n_we)
                if cwd and n_we else 0)
        rows.append((t, cwe, cwd, lift))
    out = pd.DataFrame(rows, columns=["event_type", "weekend_events",
                                      "weekday_events", "lift_ppm"])
    for c in ("weekend_events", "weekday_events", "lift_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_WEEKEND_LIFT = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day FROM events
), lims AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
spine AS (
  SELECT unnest(generate_series((SELECT lo FROM lims),
                                (SELECT hi FROM lims))) AS day
), nd AS (
  SELECT sum(CASE WHEN day % 7 IN (2, 3) THEN 1 ELSE 0 END) AS n_we,
         sum(CASE WHEN day % 7 IN (2, 3) THEN 0 ELSE 1 END) AS n_wd
  FROM spine
), cells AS (
  SELECT event_type,
         sum(CASE WHEN day % 7 IN (2, 3) THEN 1 ELSE 0 END) AS cwe,
         sum(CASE WHEN day % 7 IN (2, 3) THEN 0 ELSE 1 END) AS cwd
  FROM d GROUP BY 1
)
SELECT event_type, CAST(cwe AS BIGINT) AS weekend_events,
       CAST(cwd AS BIGINT) AS weekday_events,
       CAST(CASE WHEN cwd = 0 OR (SELECT n_we FROM nd) = 0 THEN 0
                 ELSE cwe * (SELECT n_wd FROM nd) * 1000000
                      // (cwd * (SELECT n_we FROM nd)) END AS BIGINT)
         AS lift_ppm
FROM cells ORDER BY event_type
"""


LEXOPS_REGISTRY = {
    "boolean_and_search": (boolean_and_search, SQL_BOOLEAN_AND_SEARCH),
    "capture_recapture_vocab": (capture_recapture_vocab,
                                SQL_CAPTURE_RECAPTURE_VOCAB),
    "term_adaptation_topk": (term_adaptation_topk, SQL_TERM_ADAPTATION_TOPK),
    "weekend_lift": (weekend_lift, SQL_WEEKEND_LIFT),
}
