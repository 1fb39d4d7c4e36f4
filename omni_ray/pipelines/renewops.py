"""Operator batch 60 — renewal-theory diagnostics and rank-law fitting.

Reference anchors: none in the reference; these add:

- inspection_paradox_audit: the waiting-time (length-biased sampling)
  factor per event type — E[gap containing a random instant]/E[gap] =
  n·Σg² / (Σg)² in milli over per-user seconds-quantized gaps; 1000 for
  clockwork arrivals, ≫ 1000 when a few huge gaps dominate the
  timeline. The factor that explains "why does the average user always
  land in a quiet stretch?".
- gap_burstiness_b: the Goh–Barabási burstiness parameter B =
  (σ − μ)/(σ + μ) of the gap distribution per type in milli (σ from the
  exact isqrt of the scaled variance); −1000 clockwork, 0 Poisson,
  → +1000 extremely bursty.
- zipf_slope_theil: the Zipf exponent fitted robustly — Theil–Sen
  median slope over the top-50 terms' (ln rank, ln count) points with
  per-point quantized logs (the webqa rule) and the exact
  (value, num, den) median selection of batch 30; alpha_milli =
  −slope_milli.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read
from .tsops import _trunc_div

_WORD_RE = __import__("re").compile(r"[a-z]+")
_ZIPF_TOP = 50
_REN_BUCKETS = 256


def _gap_moments(sf_dir: str) -> pd.DataFrame:
    """Per event type: (n_gaps, Σgap_s, Σgap_s²) over per-user
    seconds-quantized inter-event gaps, via one user-bucketed fold."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (_, et), u in g.groupby(["user_id", "event_type"]):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            us = u["us"].to_numpy(np.int64)[order]
            if len(us) < 2:
                continue
            d = (np.diff(us) // 1_000_000).astype(object)
            ss = int(sum(x * x for x in d))
            # split sum-of-squares into base-2^30 limbs: the cross-bucket
            # Sum() reduce runs in int64 (the oracle is HUGEINT) — limbs
            # keep every partial in range at any sf; recombined exactly
            # on the bounded per-type driver side
            rows.append((et, len(d), int(sum(d)),
                         ss >> 30, ss & ((1 << 30) - 1)))
        return pd.DataFrame(rows,
                            columns=["event_type", "n", "s", "ss_hi", "ss_lo"]) \
            if rows else pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "ss_hi": pd.Series([], dtype="int64"),
                "ss_lo": pd.Series([], dtype="int64")})

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(gaps), batch_format="pandas")
        .groupby("event_type").aggregate(Sum("n", alias_name="n"),
                                         Sum("s", alias_name="s"),
                                         Sum("ss_hi", alias_name="ss_hi"),
                                         Sum("ss_lo", alias_name="ss_lo"))
        .to_pandas().sort_values("event_type").reset_index(drop=True)
        .assign(ss=lambda d: [(int(h) << 30) + int(l)
                              for h, l in zip(d["ss_hi"], d["ss_lo"])])
        .drop(columns=["ss_hi", "ss_lo"])
    )


_SQL_GAP_MOMENTS = """
WITH seq AS (
  SELECT event_type, user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), g AS (
  SELECT event_type, (us - prev) // 1000000 AS gap_s
  FROM seq WHERE prev IS NOT NULL
), m AS (
  SELECT event_type, count(*) AS n, sum(gap_s) AS s,
         sum(CAST(gap_s AS HUGEINT) * gap_s) AS ss
  FROM g GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# inspection_paradox_audit
# ---------------------------------------------------------------------------


def inspection_paradox_audit(sf_dir: str):
    """Length-biased waiting-time factor per type: factor_milli =
    1000·n·Σg² // (Σg)² — the ratio of the gap a random instant lands in
    to the average gap; 1000 iff all gaps are equal."""
    m = _gap_moments(sf_dir)
    rows = []
    for _, r in m.iterrows():
        n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        rows.append((r["event_type"], n,
                     1000 * n * ss // (s * s) if s else 0))
    out = pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                      "factor_milli"])
    for c in ("n_gaps", "factor_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_INSPECTION_PARADOX_AUDIT = _SQL_GAP_MOMENTS + """
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(CASE WHEN s = 0 THEN 0
                 ELSE 1000 * n * ss // (CAST(s AS HUGEINT) * s) END
            AS BIGINT) AS factor_milli
FROM m ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# gap_burstiness_b
# ---------------------------------------------------------------------------


def gap_burstiness_b(sf_dir: str):
    """Goh–Barabási burstiness per type: with the scaled variance V =
    n·Σg² − (Σg)² and σ_scaled = isqrt(V) (so σ_scaled/n = σ exactly at
    the shared floor), b_milli = trunc(1000·(σ_scaled − Σg) /
    (σ_scaled + Σg)) — both σ and μ carry the same n scale, so the ratio
    needs no division by n."""
    m = _gap_moments(sf_dir)
    rows = []
    for _, r in m.iterrows():
        n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        v = n * ss - s * s
        sig = math.isqrt(v) if v > 0 else 0
        b = _trunc_div(1000 * (sig - s), sig + s) if sig + s else 0
        rows.append((r["event_type"], n, b))
    out = pd.DataFrame(rows, columns=["event_type", "n_gaps", "b_milli"])
    for c in ("n_gaps", "b_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_GAP_BURSTINESS_B = _SQL_GAP_MOMENTS + """
, fs AS (
  SELECT event_type, n, s, n * ss - CAST(s AS HUGEINT) * s AS v,
         CAST(floor(sqrt(CAST(greatest(n * ss - CAST(s AS HUGEINT) * s, 0)
                              AS DOUBLE))) AS HUGEINT) AS f
  FROM m
), isq AS (
  SELECT event_type, n, s,
         CASE WHEN v <= 0 THEN 0
              ELSE f - (CASE WHEN f * f > v THEN 1 ELSE 0 END)
                 + (CASE WHEN (f + 1) * (f + 1) <= v THEN 1 ELSE 0 END)
         END AS sig
  FROM fs
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(CASE WHEN sig + s = 0 THEN 0
                 ELSE 1000 * (sig - s) // (sig + s) END AS BIGINT)
         AS b_milli
FROM isq ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# zipf_slope_theil
# ---------------------------------------------------------------------------


def zipf_slope_theil(sf_dir: str):
    """Robust Zipf exponent: the top-50 terms by occurrence count (ties
    by term asc) give points (qr_i, qf_i) with q = floor(10⁶·ln(x) +
    0.5) on rank and count; the Theil–Sen median slope over all pairs is
    selected exactly by (value, num, den) (batch 30's convention);
    alpha_milli = −trunc(1000·num/den).

    Scale shape: the top-50 come from the term-bucketed occurrence fold
    with per-bucket prune; the 1225-pair scan is bounded."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def occ(df: pd.DataFrame) -> pd.DataFrame:
        local: dict = {}
        for tx in df["text"]:
            for w in _WORD_RE.findall((tx or "").lower()):
                local[w] = local.get(w, 0) + 1
        p = pd.DataFrame({"term": list(local), "n": list(local.values())})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _REN_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("term", sort=False)["n"].sum().reset_index()
        return d.sort_values(["n", "term"], ascending=[False, True]) \
            .head(_ZIPF_TOP)

    top = (
        ds.map_batches(_pd_arrow(occ), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True])
        .head(_ZIPF_TOP).reset_index(drop=True)
    )
    k = len(top)
    qr = np.array([int(math.floor(1_000_000 * math.log(i) + 0.5))
                   for i in range(1, k + 1)], np.int64)
    qf = np.array([int(math.floor(1_000_000 * math.log(int(c)) + 0.5))
                   for c in top["n"]], np.int64)
    i, j = np.triu_indices(k, k=1)
    num = qf[j] - qf[i]
    den = qr[j] - qr[i]  # > 0: rank strictly increases
    order = np.lexsort((den, num, num / den))
    mid = order[(len(order) - 1) // 2]
    slope_milli = _trunc_div(1000 * int(num[mid]), int(den[mid]))
    out = pd.DataFrame({
        "k_terms": [np.int64(k)],
        "slope_milli": np.int64(slope_milli),
        "alpha_milli": np.int64(-slope_milli),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ZIPF_SLOPE_THEIL = f"""
WITH occ AS (
  SELECT term, count(*) AS n
  FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                         '[a-z]+')) AS term
        FROM documents)
  GROUP BY 1
), top AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, term) AS r
  FROM occ ORDER BY n DESC, term LIMIT {_ZIPF_TOP}
), pts AS (
  SELECT r,
         CAST(floor(1000000 * ln(CAST(r AS DOUBLE)) + 0.5) AS BIGINT)
           AS qr,
         CAST(floor(1000000 * ln(CAST(n AS DOUBLE)) + 0.5) AS BIGINT)
           AS qf
  FROM top
), pairs AS (
  SELECT b.qf - a.qf AS num, b.qr - a.qr AS den,
         row_number() OVER (
           ORDER BY CAST(b.qf - a.qf AS DOUBLE) / (b.qr - a.qr),
                    b.qf - a.qf, b.qr - a.qr) AS rn,
         count(*) OVER () AS np_
  FROM pts a JOIN pts b ON b.r > a.r
)
SELECT CAST((SELECT count(*) FROM top) AS BIGINT) AS k_terms,
       CAST(max(CASE WHEN rn = (np_ + 1) // 2
                     THEN 1000 * num // den END) AS BIGINT)
         AS slope_milli,
       CAST(max(CASE WHEN rn = (np_ + 1) // 2
                     THEN -(1000 * num // den) END) AS BIGINT)
         AS alpha_milli
FROM pairs
"""


RENEWOPS_REGISTRY = {
    "inspection_paradox_audit": (inspection_paradox_audit,
                                 SQL_INSPECTION_PARADOX_AUDIT),
    "gap_burstiness_b": (gap_burstiness_b, SQL_GAP_BURSTINESS_B),
    "zipf_slope_theil": (zipf_slope_theil, SQL_ZIPF_SLOPE_THEIL),
}
