"""Operator batch 46 — mixture drift, shared-value forensics, circular
statistics and inter-rater agreement.

Reference anchors: none in the reference; these add:

- source_mix_drift: per-source share of the FIRST vs LAST corpus decile
  (doc_id order, exact cuts) with the signed drift in ppm — the
  "is the crawl mix shifting?" read.
- shared_value_audit: purchase cent-values shared by the most distinct
  users (top-10) — the shared-credential/fraud-style collision pattern
  over a value column.
- circular_hour_stats: circular statistics of event hour-of-day per
  type — resultant length R in ppm (exact isqrt) from the shared
  integer-millionth cos/sin literals, plus the peak hour by exact
  argmax projection onto the 24 literal directions (never an atan2).
- cohens_kappa_bins: Cohen's kappa between two document discretizations
  (length quintile vs distinct-term quintile, exact rank cuts) —
  integer-exact kappa_ppm = (n·agree − Σrᵢcᵢ)·10⁶ // (n² − Σrᵢcᵢ).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .fpindex import _exact_doc_id_cuts
from .queries import _pd_arrow, _read
from .tsops import _exact_ranks, _trunc_div

_WORD_RE = __import__("re").compile(r"[a-z]+")

_HOUR_US = 3_600_000_000
_SHARED_TOP = 10

# cos/sin(2π·h/24) in millionths for h = 0..23 — literal-shared with SQL
_H24_COS = [round(math.cos(2 * math.pi * h / 24) * 1_000_000)
            for h in range(24)]
_H24_SIN = [round(math.sin(2 * math.pi * h / 24) * 1_000_000)
            for h in range(24)]


# ---------------------------------------------------------------------------
# source_mix_drift
# ---------------------------------------------------------------------------


def source_mix_drift(sf_dir: str):
    """Mixture drift: each source's milli-share of the FIRST corpus
    decile (doc_id ≤ cut₁) vs the LAST (doc_id > cut₉), with drift =
    last − first in milli — the crawl-mix shift read.

    Scale shape: cuts by exact distributed selection; one bounded
    (source, decile-flag) groupby; the share table is bounded."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"]) \
        .materialize()
    agg = ds.aggregate(Min("doc_id"), Max("doc_id"), Count())
    lo, hi, n = (int(agg["min(doc_id)"]), int(agg["max(doc_id)"]),
                 int(agg["count()"]))
    cuts = _exact_doc_id_cuts(ds, lo, hi, n)
    c1, c9 = int(cuts[0]), int(cuts[8])

    def flag(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"].to_numpy(), np.int64)
        grp = np.where(d <= c1, 0, np.where(d > c9, 1, -1))
        keep = grp >= 0
        return pa.table({
            "source": t["source"].filter(pa.array(keep)),
            "grp": pa.array(grp[keep], pa.int64()),
        })

    cells = (
        ds.map_batches(flag, batch_format="pyarrow")
        .groupby(["source", "grp"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    tot = cells.groupby("grp")["c"].sum()
    n0, n1 = int(tot.get(0, 0)), int(tot.get(1, 0))
    srcs = sorted(cells["source"].unique())
    idx = cells.set_index(["source", "grp"])["c"]
    rows = []
    for s in srcs:
        f = int(idx.get((s, 0), 0)) * 1000 // n0 if n0 else 0
        l_ = int(idx.get((s, 1), 0)) * 1000 // n1 if n1 else 0
        rows.append((s, f, l_, l_ - f))
    out = pd.DataFrame(rows, columns=["source", "first_milli",
                                      "last_milli", "drift_milli"])
    for c in ("first_milli", "last_milli", "drift_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SOURCE_MIX_DRIFT = """
WITH ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM documents
), n AS (SELECT count(*) AS c FROM documents),
cuts AS (
  SELECT (SELECT doc_id FROM ranked
          WHERE rn = (1 * (SELECT c FROM n) + 9) // 10) AS c1,
         (SELECT doc_id FROM ranked
          WHERE rn = (9 * (SELECT c FROM n) + 9) // 10) AS c9
), flagged AS (
  SELECT source,
         CASE WHEN doc_id <= (SELECT c1 FROM cuts) THEN 0
              WHEN doc_id > (SELECT c9 FROM cuts) THEN 1
              ELSE -1 END AS grp
  FROM documents
), cells AS (
  SELECT source, grp, count(*) AS c FROM flagged WHERE grp >= 0
  GROUP BY 1, 2
), tot AS (
  SELECT grp, sum(c) AS t FROM cells GROUP BY 1
), srcs AS (SELECT DISTINCT source FROM cells)
SELECT s.source,
       CAST(coalesce((SELECT c FROM cells
                      WHERE source = s.source AND grp = 0), 0) * 1000
            // (SELECT t FROM tot WHERE grp = 0) AS BIGINT)
         AS first_milli,
       CAST(coalesce((SELECT c FROM cells
                      WHERE source = s.source AND grp = 1), 0) * 1000
            // (SELECT t FROM tot WHERE grp = 1) AS BIGINT)
         AS last_milli,
       CAST(coalesce((SELECT c FROM cells
                      WHERE source = s.source AND grp = 1), 0) * 1000
            // (SELECT t FROM tot WHERE grp = 1)
            - coalesce((SELECT c FROM cells
                        WHERE source = s.source AND grp = 0), 0) * 1000
              // (SELECT t FROM tot WHERE grp = 0) AS BIGINT)
         AS drift_milli
FROM srcs s ORDER BY s.source
"""


# ---------------------------------------------------------------------------
# shared_value_audit
# ---------------------------------------------------------------------------


def shared_value_audit(sf_dir: str):
    """Shared-value forensics: the 10 purchase cent-values used by the
    most DISTINCT users (ties to smaller value) — the collision pattern
    shared credentials, fixtures or scripted traffic leave in a value
    column.

    Scale shape: (cents, user) pairs dedup block-locally and fold in ONE
    value-bucketed shuffle with per-bucket top-10 prune."""
    ev = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"]
        cents = np.floor(p["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        d = pd.DataFrame({"cents": cents,
                          "user_id": p["user_id"].to_numpy(np.int64)}) \
            .drop_duplicates()
        d["_kb"] = (d["cents"].to_numpy() & 255).astype(np.int64)
        return d

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["cents", "user_id"])
        cnt = d.groupby("cents", sort=False).agg(
            n_users=("user_id", "nunique"),
            n_rows=("user_id", "size")).reset_index()
        return cnt.sort_values(["n_users", "cents"],
                               ascending=[False, True]).head(_SHARED_TOP)

    out = (
        ev.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .to_pandas()
        .sort_values(["n_users", "cents"], ascending=[False, True])
        .head(_SHARED_TOP).reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SHARED_VALUE_AUDIT = f"""
WITH p AS (
  SELECT DISTINCT CAST(floor(value*100 + 0.5) AS BIGINT) AS cents,
         user_id
  FROM events WHERE event_type = 'purchase'
), agg AS (
  SELECT cents, count(*) AS n_users, count(*) AS n_rows FROM p GROUP BY 1
)
SELECT CAST(cents AS BIGINT) AS cents, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_rows AS BIGINT) AS n_rows
FROM agg ORDER BY n_users DESC, cents LIMIT {_SHARED_TOP}
"""


# ---------------------------------------------------------------------------
# circular_hour_stats
# ---------------------------------------------------------------------------


def circular_hour_stats(sf_dir: str):
    """Circular statistics of event hour-of-day per type: C = Σ cos_h,
    S = Σ sin_h over events (shared integer-millionth literals for the
    24 directions), resultant length r_ppm = isqrt(C² + S²) // n (exact,
    scale 1e6 built into the literals), and the peak hour = argmax over
    the 24 directions of the projection C·cos_h + S·sin_h (ties to the
    smaller hour) — concentration and phase without one atan2 or float.

    Scale shape: one bounded (type, hour) groupby; the circular fold
    runs on the bounded 24-row histogram per type."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        return pa.table({
            "event_type": t["event_type"],
            "hour": pa.array((us // _HOUR_US) % 24, pa.int64()),
        })

    hist = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    cosv = np.array(_H24_COS, dtype=object)
    sinv = np.array(_H24_SIN, dtype=object)
    rows = []
    for etype, g in hist.groupby("event_type"):
        h = g["hour"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64).astype(object)
        n = int(sum(c))
        cc = int(sum(cosv[h] * c))
        ss = int(sum(sinv[h] * c))
        r_ppm = math.isqrt(cc * cc + ss * ss) // n if n else 0
        best_h, best_p = 0, None
        for hh in range(24):
            p = cc * int(cosv[hh]) + ss * int(sinv[hh])
            if best_p is None or p > best_p:
                best_h, best_p = hh, p
        rows.append((etype, n, r_ppm, best_h))
    out = pd.DataFrame(rows, columns=["event_type", "n_events", "r_ppm",
                                      "peak_hour"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in ("n_events", "r_ppm", "peak_hour"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _circ_sql() -> str:
    lits = ", ".join(f"({h}, {c}, {s})" for h, (c, s)
                     in enumerate(zip(_H24_COS, _H24_SIN)))
    return f"""
WITH w24(h, cs, sn) AS (VALUES {lits}),
e AS (
  SELECT event_type, (epoch_us(ts) // {_HOUR_US}) % 24 AS hour
  FROM events
), hist AS (
  SELECT event_type, hour, count(*) AS c FROM e GROUP BY 1, 2
), acc AS (
  SELECT event_type, sum(CAST(c AS HUGEINT) * w24.cs) AS cc,
         sum(CAST(c AS HUGEINT) * w24.sn) AS ss, sum(c) AS n
  FROM hist JOIN w24 ON w24.h = hist.hour GROUP BY 1
), fs AS (
  SELECT event_type, cc, ss, n,
         CAST(floor(sqrt(CAST(cc * cc + ss * ss AS DOUBLE))) AS HUGEINT)
           AS f
  FROM acc
), isq AS (
  SELECT event_type, cc, ss, n,
         f - (CASE WHEN f * f > cc * cc + ss * ss THEN 1 ELSE 0 END)
           + (CASE WHEN (f + 1) * (f + 1) <= cc * cc + ss * ss
                   THEN 1 ELSE 0 END) AS r
  FROM fs
), proj AS (
  SELECT i.event_type, w24.h,
         i.cc * w24.cs + i.ss * w24.sn AS p,
         row_number() OVER (PARTITION BY i.event_type
                            ORDER BY i.cc * w24.cs + i.ss * w24.sn DESC,
                                     w24.h) AS rn
  FROM isq i CROSS JOIN w24
)
SELECT i.event_type, CAST(i.n AS BIGINT) AS n_events,
       CAST(i.r // i.n AS BIGINT) AS r_ppm,
       CAST(p.h AS BIGINT) AS peak_hour
FROM isq i JOIN proj p ON p.event_type = i.event_type AND p.rn = 1
ORDER BY i.event_type
"""


SQL_CIRCULAR_HOUR_STATS = _circ_sql()


# ---------------------------------------------------------------------------
# cohens_kappa_bins
# ---------------------------------------------------------------------------


def cohens_kappa_bins(sf_dir: str):
    """Cohen's kappa between two document discretizations: length
    quintile vs distinct-term quintile (exact rank cuts at ceil(k·n/5)),
    kappa_ppm = (n·agree − Σrᵢcᵢ)·10⁶ // (n² − Σrᵢcᵢ) — exact integer
    chance-corrected agreement between two labelers.

    Scale shape: both cut sets by exact distributed selection; the 5×5
    confusion matrix is a bounded groupby; kappa folds on the bounded
    matrix."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"]) \
        .materialize()
    n = ds.count()
    ranks = [(k * n + 4) // 5 for k in range(1, 5)]
    len_cuts = _exact_ranks(ds, "n_chars", ranks)

    def vocab(t: pa.Table) -> pa.Table:
        nt = np.array([len(set(_WORD_RE.findall((x or "").lower())))
                       for x in t["text"].to_pylist()], np.int64)
        return pa.table({"voc": pa.array(nt, pa.int64()),
                         "n_chars": t["n_chars"]})

    vv = ds.map_batches(vocab, batch_format="pyarrow").materialize()
    voc_cuts = _exact_ranks(vv, "voc", ranks)

    def label(t: pa.Table) -> pa.Table:
        ln = np.asarray(t["n_chars"].to_numpy(), np.int64)
        vc = np.asarray(t["voc"].to_numpy(), np.int64)
        a = np.ones(len(ln), np.int64)
        b = np.ones(len(vc), np.int64)
        for c in len_cuts:
            a += ln > c
        for c in voc_cuts:
            b += vc > c
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    conf = (
        vv.map_batches(label, batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    agree = int(conf.loc[conf["a"] == conf["b"], "c"].sum())
    row = conf.groupby("a")["c"].sum()
    col = conf.groupby("b")["c"].sum()
    chance = sum(int(row.get(k, 0)) * int(col.get(k, 0))
                 for k in range(1, 6))
    num = n * agree - chance
    den = n * n - chance
    out = pd.DataFrame({
        "n_docs": [np.int64(n)],
        "agree": np.int64(agree),
        "kappa_ppm": np.int64(_trunc_div(1_000_000 * num, den)
                              if den else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_COHENS_KAPPA_BINS = """
WITH v AS (
  SELECT n_chars AS ln,
         len(list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                                              '[a-z]+'))) AS vc
  FROM documents
), n AS (SELECT count(*) AS c FROM v),
lr AS (SELECT ln, row_number() OVER (ORDER BY ln) AS rn FROM v),
vr AS (SELECT vc, row_number() OVER (ORDER BY vc) AS rn FROM v),
lcuts AS (
  SELECT k, (SELECT ln FROM lr
             WHERE rn = (k * (SELECT c FROM n) + 4) // 5) AS cut
  FROM (SELECT unnest(generate_series(1, 4)) AS k)
), vcuts AS (
  SELECT k, (SELECT vc FROM vr
             WHERE rn = (k * (SELECT c FROM n) + 4) // 5) AS cut
  FROM (SELECT unnest(generate_series(1, 4)) AS k)
), lab AS (
  SELECT 1 + (SELECT count(*) FROM lcuts WHERE v.ln > cut) AS a,
         1 + (SELECT count(*) FROM vcuts WHERE v.vc > cut) AS b
  FROM v
), conf AS (SELECT a, b, count(*) AS c FROM lab GROUP BY 1, 2),
parts AS (
  SELECT (SELECT c FROM n) AS nn,
         (SELECT coalesce(sum(c), 0) FROM conf WHERE a = b) AS agree,
         (SELECT coalesce(sum(ra.r * cb.co), 0)
          FROM (SELECT a, sum(c) AS r FROM conf GROUP BY 1) ra
          JOIN (SELECT b, sum(c) AS co FROM conf GROUP BY 1) cb
            ON cb.b = ra.a) AS chance
  FROM n
)
SELECT CAST(nn AS BIGINT) AS n_docs, CAST(agree AS BIGINT) AS agree,
       CAST(CASE WHEN nn * nn - chance = 0 THEN 0
                 ELSE (CAST(nn AS HUGEINT) * agree - chance) * 1000000
                      // (CAST(nn AS HUGEINT) * nn - chance) END
            AS BIGINT) AS kappa_ppm
FROM parts
"""


CIRCOPS_REGISTRY = {
    "source_mix_drift": (source_mix_drift, SQL_SOURCE_MIX_DRIFT),
    "shared_value_audit": (shared_value_audit, SQL_SHARED_VALUE_AUDIT),
    "circular_hour_stats": (circular_hour_stats, SQL_CIRCULAR_HOUR_STATS),
    "cohens_kappa_bins": (cohens_kappa_bins, SQL_COHENS_KAPPA_BINS),
}
