"""Operator batch 27 — ranking-quality evaluation, forensic digit audit,
sequential change detection and exact distribution distance.

Reference anchors: the reference evaluates nothing — its dashboards
(`src/api/dashboard.py`) report raw counts and its quality score is a
per-record heuristic; these add the evaluation instruments a curation
pipeline reads before trusting a ranker, a value stream, or a mixture:

- ndcg_eval: NDCG@10 per source of the length-descending ranking against
  graded distinct-term relevance — THE ranking-eval metric, with the
  1/log2(i+1) discounts as shared integer-millionth literals so both
  engines agree bit-for-bit.
- benford_audit: first-significant-digit census of purchase cents vs the
  Benford expectation (integer-ppm log10(1+1/d) literals) — the classic
  fabricated-data screen.
- cusum_changepoint: one-sided CUSUM drift statistics over the daily
  event counts via the REFLECTED-WALK closed form (S_d = P_d - min(0,
  min_{j<=d} P_j) for the prefix-sum P) — no recursion, one window scan.
- emd_length_drift: exact 1-D Wasserstein (earth-mover) distance between
  each source's n_chars distribution and the corpus distribution, in
  exact integer units of 1/(n_s * n_total) — the drift number JS
  divergence saturates on.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count

from .engineops import _DAY_US
from .queries import _pd_arrow, _read

_WORD_RE = re.compile(r"[a-z]+")

_NDCG_K = 10
# 1/log2(i+1) in millionths for positions 1..10 — literal-shared with SQL
_NDCG_DISC = [round(1_000_000 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)]

# Benford expected share of first digit d in millionths, d = 1..9
_BENFORD_PPM = [round(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)]


# ---------------------------------------------------------------------------
# ndcg_eval
# ---------------------------------------------------------------------------


def ndcg_eval(sf_dir: str):
    """NDCG@10 per source of the system ranking "n_chars descending, doc_id
    ascending" against graded relevance rel = min(3, distinct_terms // 100).
    DCG and the ideal DCG use the shared integer-millionth discount
    literals; ndcg_ppm = dcg * 10^6 // idcg (0 when idcg = 0).

    Scale shape: relevance is a zero-shuffle map; both top-10 lists prune
    block-locally per source (a bounded domain) before ONE bounded
    groupby folds survivors — nothing row-sized sorts globally."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source",
                                             "n_chars"])

    def rel(df: pd.DataFrame) -> pd.DataFrame:
        r = np.array(
            [min(3, len(set(_WORD_RE.findall((t or "").lower()))) // 100)
             for t in df["text"]], np.int64)
        out = pd.DataFrame({
            "source": df["source"].to_numpy(),
            "doc_id": df["doc_id"].to_numpy(),
            "n_chars": df["n_chars"].to_numpy(),
            "rel": r,
        })
        # block-local prune: keep each source's 10 best by BOTH orders
        # (system = n_chars desc/doc_id asc; ideal = rel desc) — the union
        # is a superset of every global top-10 candidate
        keep = set()
        for _, g in out.groupby("source", sort=False):
            sys10 = g.sort_values(["n_chars", "doc_id"],
                                  ascending=[False, True]).head(_NDCG_K)
            idl10 = g.sort_values(["rel", "n_chars", "doc_id"],
                                  ascending=[False, False, True]).head(_NDCG_K)
            keep.update(sys10.index)
            keep.update(idl10.index)
        return out.loc[sorted(keep)]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        sys10 = g.sort_values(["n_chars", "doc_id"],
                              ascending=[False, True]).head(_NDCG_K)
        dcg = int(sum(int(r) * d for r, d in zip(sys10["rel"], _NDCG_DISC)))
        ideal = np.sort(g["rel"].to_numpy(np.int64))[::-1][:_NDCG_K]
        idcg = int(sum(int(r) * d for r, d in zip(ideal, _NDCG_DISC)))
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "dcg_milli": np.int64(dcg),
            "idcg_milli": np.int64(idcg),
            "ndcg_ppm": np.int64(dcg * 1_000_000 // idcg if idcg else 0),
        })

    return (
        ds.map_batches(_pd_arrow(rel), batch_format="pandas")
        .groupby("source").map_groups(_pd_arrow(fold), batch_format="pandas")
        .sort("source")
    )


def _ndcg_sql() -> str:
    disc_vals = ", ".join(f"({i + 1}, {d})"
                          for i, d in enumerate(_NDCG_DISC))
    return f"""
WITH disc(pos, c) AS (VALUES {disc_vals}),
r AS (
  SELECT source, doc_id, n_chars,
         least(3, len(list_distinct(regexp_extract_all(
             lower(coalesce(text, '')), '[a-z]+'))) // 100) AS rel
  FROM documents
), sys AS (
  SELECT source, rel,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS pos
  FROM r
), idl AS (
  SELECT source, rel,
         row_number() OVER (PARTITION BY source ORDER BY rel DESC) AS pos
  FROM r
), dcg AS (
  SELECT source, sum(rel * c) AS v FROM sys JOIN disc USING (pos)
  WHERE pos <= {_NDCG_K} GROUP BY source
), idcg AS (
  SELECT source, sum(rel * c) AS v FROM idl JOIN disc USING (pos)
  WHERE pos <= {_NDCG_K} GROUP BY source
)
SELECT dcg.source, CAST(dcg.v AS BIGINT) AS dcg_milli,
       CAST(idcg.v AS BIGINT) AS idcg_milli,
       CAST(CASE WHEN idcg.v = 0 THEN 0
                 ELSE dcg.v * 1000000 // idcg.v END AS BIGINT) AS ndcg_ppm
FROM dcg JOIN idcg USING (source) ORDER BY source
"""


SQL_NDCG_EVAL = _ndcg_sql()


# ---------------------------------------------------------------------------
# benford_audit
# ---------------------------------------------------------------------------


def benford_audit(sf_dir: str):
    """First-significant-digit census of purchase cents against Benford's
    law: per digit 1..9 the observed count, observed ppm share, the
    Benford expected ppm (shared integer literals) and the signed gap.

    Scale shape: digit extraction is a vectorized map (repeated //10
    until < 10, log-free); the shuffle is a 9-key bounded groupby."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def digits(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        c = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        c = c[c > 0]
        while (c >= 10).any():
            c = np.where(c >= 10, c // 10, c)
        return pa.table({"digit": pa.array(c, pa.int64())})

    obs = (
        ev.map_batches(digits, batch_format="pyarrow")
        .groupby("digit").aggregate(Count(alias_name="obs"))
        .to_pandas().sort_values("digit")
    )
    total = int(obs["obs"].sum())
    spine = pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64)})
    out = spine.merge(obs, on="digit", how="left").fillna(0)
    out["obs"] = out["obs"].astype("int64")
    out["obs_ppm"] = out["obs"] * 1_000_000 // total
    out["exp_ppm"] = np.array(_BENFORD_PPM, np.int64)
    out["gap_ppm"] = out["obs_ppm"] - out["exp_ppm"]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


def _benford_sql() -> str:
    exp_vals = ", ".join(f"({d + 1}, {p})"
                         for d, p in enumerate(_BENFORD_PPM))
    return f"""
WITH exp(digit, exp_ppm) AS (VALUES {exp_vals}),
c AS (
  SELECT CAST(substr(CAST(CAST(floor(value*100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM events
  WHERE event_type = 'purchase' AND floor(value*100 + 0.5) > 0
), o AS (
  SELECT digit, count(*) AS obs FROM c GROUP BY digit
), n AS (SELECT count(*) AS t FROM c)
SELECT exp.digit, CAST(coalesce(o.obs, 0) AS BIGINT) AS obs,
       CAST(coalesce(o.obs, 0) * 1000000 // (SELECT t FROM n)
            AS BIGINT) AS obs_ppm,
       CAST(exp_ppm AS BIGINT) AS exp_ppm,
       CAST(coalesce(o.obs, 0) * 1000000 // (SELECT t FROM n) - exp_ppm
            AS BIGINT) AS gap_ppm
FROM exp LEFT JOIN o USING (digit) ORDER BY exp.digit
"""


SQL_BENFORD_AUDIT = _benford_sql()


# ---------------------------------------------------------------------------
# cusum_changepoint
# ---------------------------------------------------------------------------


def cusum_changepoint(sf_dir: str):
    """One-sided CUSUM drift statistics over the daily event-count series:
    with deviations scaled integer-exactly by the day count (dev_d =
    D * x_d - total), the positive CUSUM S_d = max(0, S_{d-1} + dev_d)
    is computed by its reflected-walk CLOSED FORM S_d = P_d - least(0,
    running_min(P)) over the prefix sums P — one window scan, no
    recursion; the negative side mirrors it.

    Scale shape: days are a bounded domain — ONE bounded groupby, then a
    vectorized scan over the day table."""
    ev = _read(sf_dir, "events", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.divide(pc.cast(t["ts"], pa.int64()),
                                          _DAY_US)})

    days = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="n_events"))
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    d = len(days)
    x = days["n_events"].to_numpy(np.int64)
    total = int(x.sum())
    dev = d * x - total
    p = np.cumsum(dev)
    run_min = np.minimum.accumulate(np.minimum(p, 0))
    run_max = np.maximum.accumulate(np.maximum(p, 0))
    days["dev_scaled"] = dev
    days["cusum_pos"] = p - run_min
    days["cusum_neg"] = run_max - p
    for c in days.columns:
        days[c] = days[c].astype("int64")
    return pa.Table.from_pandas(days, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CUSUM_CHANGEPOINT = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, count(*) AS n_events
  FROM events GROUP BY 1
), n AS (SELECT count(*) AS d, sum(n_events) AS total FROM daily),
p AS (
  SELECT day, n_events,
         (SELECT d FROM n) * n_events - (SELECT total FROM n) AS dev_scaled,
         sum((SELECT d FROM n) * n_events - (SELECT total FROM n))
           OVER (ORDER BY day) AS pref
  FROM daily
)
SELECT day, CAST(n_events AS BIGINT) AS n_events,
       CAST(dev_scaled AS BIGINT) AS dev_scaled,
       CAST(pref - least(0, min(least(pref, 0)) OVER (ORDER BY day))
            AS BIGINT) AS cusum_pos,
       CAST(greatest(0, max(greatest(pref, 0)) OVER (ORDER BY day)) - pref
            AS BIGINT) AS cusum_neg
FROM p ORDER BY day
"""


# ---------------------------------------------------------------------------
# emd_length_drift
# ---------------------------------------------------------------------------


def emd_length_drift(sf_dir: str):
    """Exact 1-D Wasserstein (earth-mover) distance between each source's
    n_chars distribution and the whole corpus's: EMD = Σ_v |CDF_s(v) -
    CDF_all(v)| · (next_v - v) over the merged value support, computed in
    exact integer units of 1/(n_s · n_total) as |cum_s·n_total -
    cum_all·n_s| · gap. (At petabyte row counts the cross product
    n_s·n_total overflows int64 — normalize to ppm there; the exact
    integer form is the oracle-stable choice at test scale.)

    Scale shape: document LENGTHS are a bounded value domain (the
    global_percentile CDF trick) — one bounded (source, n_chars) groupby;
    the per-source scan runs over the value histogram, never the rows."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    hist = (
        ds.groupby(["source", "n_chars"]).aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    support = np.sort(hist["n_chars"].unique())
    gaps = np.diff(support)
    n_total = int(hist["cnt"].sum())
    glob = hist.groupby("n_chars")["cnt"].sum() \
        .reindex(support, fill_value=0).to_numpy(np.int64)
    cum_all = np.cumsum(glob)
    rows = []
    for src, g in hist.groupby("source"):
        cnt = g.set_index("n_chars")["cnt"] \
            .reindex(support, fill_value=0).to_numpy(np.int64)
        n_s = int(cnt.sum())
        cum_s = np.cumsum(cnt)
        diff = np.abs(cum_s[:-1] * n_total - cum_all[:-1] * n_s)
        rows.append((src, n_s, int((diff * gaps).sum())))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "emd_scaled"]) \
        .sort_values("source").reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["emd_scaled"] = out["emd_scaled"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_EMD_LENGTH_DRIFT = """
WITH cells AS (
  SELECT source, n_chars, count(*) AS cnt FROM documents GROUP BY 1, 2
), support AS (SELECT DISTINCT n_chars FROM documents),
gcdf AS (
  SELECT n_chars, sum(cnt) AS g FROM cells GROUP BY 1
), tot AS (SELECT count(*) AS n_total FROM documents),
per_src AS (SELECT source, sum(cnt) AS n_s FROM cells GROUP BY 1),
spine AS (
  SELECT p.source, p.n_s, s.n_chars,
         coalesce(c.cnt, 0) AS cnt, g.g
  FROM per_src p CROSS JOIN support s
  JOIN gcdf g USING (n_chars)
  LEFT JOIN cells c ON c.source = p.source AND c.n_chars = s.n_chars
), cums AS (
  SELECT source, n_s, n_chars,
         sum(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum_s,
         sum(g)   OVER (PARTITION BY source ORDER BY n_chars) AS cum_all,
         lead(n_chars) OVER (PARTITION BY source ORDER BY n_chars) AS nxt
  FROM spine
)
SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(CASE WHEN nxt IS NULL THEN 0
                 ELSE abs(cum_s * (SELECT n_total FROM tot) - cum_all * n_s)
                      * (nxt - n_chars) END), 0) AS BIGINT) AS emd_scaled
FROM cums GROUP BY source ORDER BY source
"""


EVALOPS_REGISTRY = {
    "ndcg_eval": (ndcg_eval, SQL_NDCG_EVAL),
    "benford_audit": (benford_audit, SQL_BENFORD_AUDIT),
    "cusum_changepoint": (cusum_changepoint, SQL_CUSUM_CHANGEPOINT),
    "emd_length_drift": (emd_length_drift, SQL_EMD_LENGTH_DRIFT),
}
