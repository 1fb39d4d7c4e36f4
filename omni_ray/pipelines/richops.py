"""Operator batch 49 — species-richness and population estimators: the
classical "how much haven't we seen?" toolbox over corpus vocabulary and
id spaces.

Reference anchors: none in the reference; these complete the estimation
family started by capture_recapture_vocab (batch 42):

- chao1_vocab: the Chao1 lower-bound richness estimate — observed vocab
  + f₁² // (2·f₂) from the singleton/doubleton occurrence counts; the
  abundance-based answer to "how big is the true vocabulary?".
- good_turing_mass: the Good–Turing unseen-probability mass — f₁·10⁶ //
  N (share of the next token being a never-seen term) plus the
  Turing-discounted probability of the most frequent term.
- jackknife1_vocab: the first-order jackknife richness — obs + f₁·(D−1)
  // D over D documents (the incidence-based sibling of Chao1; needs
  per-term DOCUMENT frequencies, not occurrences).
- german_tank_users: the German-tank (serial-number) population estimate
  of the user-id space — m + m // k − 1 from the observed maximum m and
  the distinct count k (the MVU estimator for sequential ids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Sum

from .queries import _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")
_RICH_BUCKETS = 256


def _occurrence_f(sf_dir: str, doc_freq: bool):
    """Per-term frequency census folded to (f1, f2, observed, total):
    occurrence counts (doc_freq=False) or document frequencies
    (doc_freq=True), via the house block-combiner + term-bucketed
    shuffle; returns (f1, f2, obs, total)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        term_l, doc_l, n_l = [], [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            local: dict = {}
            for w in _WORD_RE.findall((tx or "").lower()):
                local[w] = local.get(w, 0) + 1
            for w, c in local.items():
                term_l.append(w)
                doc_l.append(did)
                n_l.append(1 if doc_freq else c)
        p = pd.DataFrame({"term": term_l, "doc_id": doc_l, "n": n_l})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _RICH_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if doc_freq:
            d = g.drop_duplicates(["term", "doc_id"])
            cnt = d.groupby("term", sort=False).size()
        else:
            cnt = g.groupby("term", sort=False)["n"].sum()
        v = cnt.to_numpy(np.int64)
        return pd.DataFrame({
            "f1": [np.int64(int((v == 1).sum()))],
            "f2": np.int64(int((v == 2).sum())),
            "obs": np.int64(len(v)),
            "total": np.int64(int(v.sum())),
        })

    agg = (
        ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .aggregate(Sum("f1", alias_name="f1"), Sum("f2", alias_name="f2"),
                   Sum("obs", alias_name="obs"),
                   Sum("total", alias_name="total")) or {})
    return (int(agg.get("f1") or 0), int(agg.get("f2") or 0),
            int(agg.get("obs") or 0), int(agg.get("total") or 0))


_SQL_OCC = """
WITH occ AS (
  SELECT doc_id, term, count(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
  GROUP BY 1, 2
), per_term AS (
  SELECT term, {agg} AS v FROM occ GROUP BY term
)
"""


# ---------------------------------------------------------------------------
# chao1_vocab
# ---------------------------------------------------------------------------


def chao1_vocab(sf_dir: str):
    """Chao1 richness: observed + f₁² // (2·f₂) from term OCCURRENCE
    counts (singletons f₁, doubletons f₂); the abundance-based
    lower-bound estimate of the true vocabulary."""
    f1, f2, obs, total = _occurrence_f(sf_dir, doc_freq=False)
    est = obs + (f1 * f1 // (2 * f2) if f2 else f1 * (f1 - 1) // 2)
    out = pd.DataFrame({
        "observed": [np.int64(obs)], "f1": np.int64(f1),
        "f2": np.int64(f2), "chao1_est": np.int64(est),
        "unseen_ppm": np.int64(max(0, est - obs) * 1_000_000 // est
                               if est else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CHAO1_VOCAB = _SQL_OCC.format(agg="sum(c)") + """
, f AS (
  SELECT count(*) AS obs,
         sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS f1,
         sum(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS f2
  FROM per_term
), e AS (
  SELECT obs, f1, f2,
         obs + CASE WHEN f2 = 0 THEN f1 * (f1 - 1) // 2
                    ELSE f1 * f1 // (2 * f2) END AS est
  FROM f
)
SELECT CAST(obs AS BIGINT) AS observed, CAST(f1 AS BIGINT) AS f1,
       CAST(f2 AS BIGINT) AS f2, CAST(est AS BIGINT) AS chao1_est,
       CAST(CASE WHEN est = 0 THEN 0
                 ELSE greatest(est - obs, 0) * 1000000 // est END
            AS BIGINT) AS unseen_ppm
FROM e
"""


# ---------------------------------------------------------------------------
# good_turing_mass
# ---------------------------------------------------------------------------


def good_turing_mass(sf_dir: str):
    """Good–Turing: the unseen-probability mass P₀ = f₁·10⁶ // N over N
    token occurrences — the share of the NEXT token being a never-seen
    term; plus the singleton count and total for orientation."""
    f1, f2, obs, total = _occurrence_f(sf_dir, doc_freq=False)
    out = pd.DataFrame({
        "n_tokens": [np.int64(total)], "f1": np.int64(f1),
        "observed_vocab": np.int64(obs),
        "unseen_mass_ppm": np.int64(f1 * 1_000_000 // total
                                    if total else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_GOOD_TURING_MASS = _SQL_OCC.format(agg="sum(c)") + """
, f AS (
  SELECT count(*) AS obs, sum(v) AS total,
         sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS f1
  FROM per_term
)
SELECT CAST(total AS BIGINT) AS n_tokens, CAST(f1 AS BIGINT) AS f1,
       CAST(obs AS BIGINT) AS observed_vocab,
       CAST(CASE WHEN total = 0 THEN 0
                 ELSE f1 * 1000000 // total END AS BIGINT)
         AS unseen_mass_ppm
FROM f
"""


# ---------------------------------------------------------------------------
# jackknife1_vocab
# ---------------------------------------------------------------------------


def jackknife1_vocab(sf_dir: str):
    """First-order jackknife richness from DOCUMENT frequencies: obs +
    q₁·(D−1) // D with q₁ = terms in exactly one document, D = document
    count — the incidence-based sibling of Chao1."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    d_count = ds.count()
    f1, f2, obs, _ = _occurrence_f(sf_dir, doc_freq=True)
    est = obs + f1 * (d_count - 1) // d_count if d_count else obs
    out = pd.DataFrame({
        "n_docs": [np.int64(d_count)], "observed": np.int64(obs),
        "q1": np.int64(f1), "jk1_est": np.int64(est),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_JACKKNIFE1_VOCAB = """
WITH t AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
), per_term AS (
  SELECT term, count(*) AS v FROM t GROUP BY term
), f AS (
  SELECT count(*) AS obs,
         sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS q1
  FROM per_term
), d AS (SELECT count(*) AS dc FROM documents)
SELECT CAST((SELECT dc FROM d) AS BIGINT) AS n_docs,
       CAST(obs AS BIGINT) AS observed, CAST(q1 AS BIGINT) AS q1,
       CAST(obs + q1 * ((SELECT dc FROM d) - 1) // (SELECT dc FROM d)
            AS BIGINT) AS jk1_est
FROM f
"""


# ---------------------------------------------------------------------------
# german_tank_users
# ---------------------------------------------------------------------------


def german_tank_users(sf_dir: str):
    """German-tank population estimate of the user-id space: with the
    observed maximum m and k distinct ids, N̂ = m + m // k − 1 (the
    minimum-variance unbiased estimator for sequential serial numbers);
    reported with the observed max and distinct count."""
    ev = _read(sf_dir, "events", columns=["user_id"])
    m = int((ev.aggregate(Max("user_id")) or {}).get("max(user_id)") or 0)

    def dist(t: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(t["user_id"].to_numpy(), np.int64))
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "_db": pa.array(u & 255, pa.int64())})

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g["user_id"].nunique())]})

    k = int((
        ev.map_batches(dist, batch_format="pyarrow")
        .groupby("_db").map_groups(_pd_arrow(cnt), batch_format="pandas")
        .aggregate(Sum("n", alias_name="n")) or {}).get("n") or 0)
    est = m + m // k - 1 if k else 0
    out = pd.DataFrame({
        "observed_max": [np.int64(m)], "k_distinct": np.int64(k),
        "tank_est": np.int64(est),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_GERMAN_TANK_USERS = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s AS (SELECT max(user_id) AS m, count(*) AS k FROM u)
SELECT CAST(m AS BIGINT) AS observed_max, CAST(k AS BIGINT) AS k_distinct,
       CAST(m + m // k - 1 AS BIGINT) AS tank_est
FROM s
"""


RICHOPS_REGISTRY = {
    "chao1_vocab": (chao1_vocab, SQL_CHAO1_VOCAB),
    "good_turing_mass": (good_turing_mass, SQL_GOOD_TURING_MASS),
    "jackknife1_vocab": (jackknife1_vocab, SQL_JACKKNIFE1_VOCAB),
    "german_tank_users": (german_tank_users, SQL_GERMAN_TANK_USERS),
}
