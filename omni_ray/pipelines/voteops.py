"""Operator batch 51 — rank aggregation / social choice over source
metrics: when three measurements disagree about which source is "best",
these are the principled ways to combine them.

The three voters are exact integer metrics per source: m1 = document
count, m2 = total chars, m3 = distinct-term vocabulary.

- copeland_ranking: pairwise majority — source A beats B if ≥ 2 of the
  3 metrics strictly prefer A; Copeland score = wins − losses, with a
  Condorcet flag (1 on the row that beats every other source).
- borda_ranking: positional — per metric, rank = |strictly greater| + 1
  (the rank() convention); Borda score = Σ (n − rank); the smooth
  aggregate pairwise methods can contradict.
- approval_census: threshold — a metric approves a source strictly
  above that metric's type-1 median; per-source approval count plus the
  0..3 approval histogram.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")
_VOTE_BUCKETS = 256


def _source_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-source exact metric table (n_docs, n_chars, vocab) via one
    doc-level map plus a term-bucketed distinct fold for vocabulary."""
    ds = _read(sf_dir, "documents", columns=["source", "text", "n_chars"]) \
        .materialize()

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": df["source"].to_numpy(),
            "one": np.ones(len(df), np.int64),
            "chars": df["n_chars"].to_numpy(np.int64),
        }).groupby("source", sort=False).sum().reset_index()

    b = (ds.map_batches(_pd_arrow(base), batch_format="pandas")
         .groupby("source").aggregate(Sum("one", alias_name="n_docs"),
                                      Sum("chars", alias_name="n_chars"))
         .to_pandas())

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        src_l, term_l = [], []
        for src, tx in zip(df["source"], df["text"]):
            for w in set(_WORD_RE.findall((tx or "").lower())):
                src_l.append(src)
                term_l.append(w)
        p = pd.DataFrame({"source": src_l, "term": term_l}) \
            .drop_duplicates()
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _VOTE_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["source", "term"])
        return d.groupby("source", sort=False).size() \
            .reset_index(name="vocab")

    v = (ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
         .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
         .groupby("source").sum("vocab")
         .to_pandas())
    v.columns = ["source", "vocab"]
    m = b.merge(v, on="source", how="left").fillna(0)
    for c in ("n_docs", "n_chars", "vocab"):
        m[c] = m[c].astype("int64")
    return m.sort_values("source").reset_index(drop=True)


_SQL_METRICS = """
WITH base AS (
  SELECT source, count(*) AS n_docs, sum(n_chars) AS n_chars
  FROM documents GROUP BY 1
), voc AS (
  SELECT source, count(*) AS vocab
  FROM (SELECT DISTINCT source, term
        FROM (SELECT source,
                     unnest(regexp_extract_all(lower(coalesce(text, '')),
                                               '[a-z]+')) AS term
              FROM documents))
  GROUP BY 1
), m AS (
  SELECT base.source, base.n_docs, base.n_chars,
         coalesce(voc.vocab, 0) AS vocab
  FROM base LEFT JOIN voc USING (source)
)
"""


# ---------------------------------------------------------------------------
# copeland_ranking
# ---------------------------------------------------------------------------


def copeland_ranking(sf_dir: str):
    """Copeland rank aggregation: A beats B when ≥ 2 of the 3 metrics
    strictly prefer A; score = wins − losses; condorcet = 1 iff the
    source beats every other. Ordered by (score desc, source)."""
    m = _source_metrics(sf_dir)
    cols = ["n_docs", "n_chars", "vocab"]
    vals = m[cols].to_numpy(np.int64)
    srcs = m["source"].tolist()
    n = len(srcs)
    wins = np.zeros(n, np.int64)
    losses = np.zeros(n, np.int64)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            votes = int((vals[i] > vals[j]).sum())
            anti = int((vals[j] > vals[i]).sum())
            if votes > anti:
                wins[i] += 1
            elif anti > votes:
                losses[i] += 1
    out = pd.DataFrame({
        "source": srcs, "wins": wins, "losses": losses,
        "copeland": wins - losses,
        "condorcet": (wins == n - 1).astype(np.int64),
    }).sort_values(["copeland", "source"],
                   ascending=[False, True]).reset_index(drop=True)
    for c in ("wins", "losses", "copeland", "condorcet"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_COPELAND_RANKING = _SQL_METRICS + """
, duel AS (
  SELECT a.source AS sa, b.source AS sb,
         (CASE WHEN a.n_docs > b.n_docs THEN 1 ELSE 0 END
          + CASE WHEN a.n_chars > b.n_chars THEN 1 ELSE 0 END
          + CASE WHEN a.vocab > b.vocab THEN 1 ELSE 0 END) AS va,
         (CASE WHEN b.n_docs > a.n_docs THEN 1 ELSE 0 END
          + CASE WHEN b.n_chars > a.n_chars THEN 1 ELSE 0 END
          + CASE WHEN b.vocab > a.vocab THEN 1 ELSE 0 END) AS vb
  FROM m a JOIN m b ON b.source != a.source
), scored AS (
  SELECT sa AS source,
         sum(CASE WHEN va > vb THEN 1 ELSE 0 END) AS wins,
         sum(CASE WHEN vb > va THEN 1 ELSE 0 END) AS losses,
         count(*) AS n_others
  FROM duel GROUP BY 1
)
SELECT source, CAST(wins AS BIGINT) AS wins,
       CAST(losses AS BIGINT) AS losses,
       CAST(wins - losses AS BIGINT) AS copeland,
       CAST(CASE WHEN wins = n_others THEN 1 ELSE 0 END AS BIGINT)
         AS condorcet
FROM scored ORDER BY wins - losses DESC, source
"""


# ---------------------------------------------------------------------------
# borda_ranking
# ---------------------------------------------------------------------------


def borda_ranking(sf_dir: str):
    """Borda count: per metric, rank = |strictly greater| + 1; Borda
    score = Σ_metric (n − rank). Ordered by (borda desc, source)."""
    m = _source_metrics(sf_dir)
    n = len(m)
    borda = np.zeros(n, np.int64)
    for c in ("n_docs", "n_chars", "vocab"):
        v = m[c].to_numpy(np.int64)
        rank = (v[:, None] < v[None, :]).sum(axis=1) + 1
        borda += n - rank
    out = pd.DataFrame({"source": m["source"], "borda": borda}) \
        .sort_values(["borda", "source"],
                     ascending=[False, True]).reset_index(drop=True)
    out["borda"] = out["borda"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_BORDA_RANKING = _SQL_METRICS + """
, n AS (SELECT count(*) AS k FROM m),
r AS (
  SELECT source,
         (SELECT k FROM n) - rank() OVER (ORDER BY n_docs DESC)
         + (SELECT k FROM n) - rank() OVER (ORDER BY n_chars DESC)
         + (SELECT k FROM n) - rank() OVER (ORDER BY vocab DESC) AS borda
  FROM m
)
SELECT source, CAST(borda AS BIGINT) AS borda
FROM r ORDER BY borda DESC, source
"""


# ---------------------------------------------------------------------------
# approval_census
# ---------------------------------------------------------------------------


def approval_census(sf_dir: str):
    """Approval voting: a metric approves a source strictly above that
    metric's type-1 lower median across sources; per source the approval
    count (0..3). Ordered by (approvals desc, source)."""
    m = _source_metrics(sf_dir)
    approvals = np.zeros(len(m), np.int64)
    for c in ("n_docs", "n_chars", "vocab"):
        v = m[c].to_numpy(np.int64)
        med = int(np.sort(v)[(len(v) - 1) // 2])
        approvals += (v > med).astype(np.int64)
    out = pd.DataFrame({"source": m["source"], "approvals": approvals}) \
        .sort_values(["approvals", "source"],
                     ascending=[False, True]).reset_index(drop=True)
    out["approvals"] = out["approvals"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_APPROVAL_CENSUS = _SQL_METRICS + """
, med AS (
  SELECT quantile_disc(n_docs, 0.5) AS m1,
         quantile_disc(n_chars, 0.5) AS m2,
         quantile_disc(vocab, 0.5) AS m3
  FROM m
)
SELECT source,
       CAST(CASE WHEN n_docs > (SELECT m1 FROM med) THEN 1 ELSE 0 END
            + CASE WHEN n_chars > (SELECT m2 FROM med) THEN 1 ELSE 0 END
            + CASE WHEN vocab > (SELECT m3 FROM med) THEN 1 ELSE 0 END
            AS BIGINT) AS approvals
FROM m ORDER BY approvals DESC, source
"""


VOTEOPS_REGISTRY = {
    "copeland_ranking": (copeland_ranking, SQL_COPELAND_RANKING),
    "borda_ranking": (borda_ranking, SQL_BORDA_RANKING),
    "approval_census": (approval_census, SQL_APPROVAL_CENSUS),
}
