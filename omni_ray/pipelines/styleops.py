"""Stylometry / multiple-testing / stability operators (round 4, batch 68):
Burrows' Delta between sources, Hoeffding-bounded Benjamini–Hochberg FDR
flags, and the Allan variance of the daily event-count series.

- burrows_delta_sources: the classic authorship/stylistic distance —
  per-source relative frequencies (integer ppm) of the corpus's top-K
  function words, per-term z-difference |x1−x2|/σ_t summed over terms.
  μ_t cancels in the pairwise difference, so only σ_t is needed; σ_t comes
  from exact integer moments (D_t = n·Σx² − (Σx)², σ = √D/n), and each
  term's contribution is quantized to ppm BEFORE the cross-term sum (the
  webqa per-cell rule: IEEE sqrt/×/÷ are correctly rounded, so the same
  double expression over the same ints is bit-identical in both engines;
  the SUM of unquantized doubles would not be, because SQL sum order is
  nondeterministic). In a 100-TB corpus the source-pair count is the only
  quadratic factor — pairs of SOURCES (bounded), never pairs of docs.
- hoeffding_bh_fdr: screening which sources' long-doc share deviates from
  the corpus share, with Hoeffding tail BOUNDS as the p-values
  (p = exp(−2·n·δ²) — no erf needed, exp is IEEE-identical) and the
  Benjamini–Hochberg step-up at α = 1/20 run entirely in integers:
  flag iff p_ppm · m · 20 ≤ rank · 10⁶, then step-up closure. The FDR
  discipline for fleet-wide drift monitors (thousands of shards → control
  the false-discovery rate, not the per-test rate).
- allan_variance_daily: σ²_y(τ) over the daily count series at τ ∈
  {1,2,4}, computed from non-overlapping block SUMS so everything before
  the single final division is integer-exact: avar_ppm = 10⁶·ΣD² //
  (2·(m−1)·τ²) with D = adjacent block-sum differences. Day index is the
  dense rank of observed days (gap-safe). The clock-stability read that
  separates white noise (slope −1) from drift in arrival-rate series.

Scale shape: every op folds to a bounded table (source×term with K≤30,
sources, days) before any driver math; the only row-sized shuffle is the
term-count fold, which rides _bucketed_agg.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_TOPK_TERMS = 30
_LONG_CHARS = 2000


def burrows_delta_sources(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.lower().str.findall(r"[a-z]+")
        out = df[["source"]].copy()
        out["term"] = t
        out = out.explode("term").dropna(subset=["term"])
        return out.groupby(["source", "term"], sort=False) \
            .size().rename("tf").reset_index()

    counts = _bucketed_agg(
        ds.map_batches(_pd_arrow(toks), batch_format="pandas"),
        ["source", "term"], {"tf": ("tf", "sum")}).to_pandas()

    # bounded driver math from here: top-K terms, per-source ppm, pair deltas
    totals = counts.groupby("source")["tf"].sum()
    top = (counts.groupby("term")["tf"].sum()
           .sort_values(ascending=False, kind="mergesort"))
    top = top.reset_index().sort_values(["tf", "term"],
                                        ascending=[False, True],
                                        kind="mergesort")["term"].head(
        _TOPK_TERMS).tolist()
    sources = sorted(totals.index)
    n = len(sources)
    ppm = {}
    sub = counts[counts["term"].isin(top)]
    pivot = sub.pivot_table(index="term", columns="source", values="tf",
                            aggfunc="sum", fill_value=0)
    for t in top:
        row = pivot.loc[t] if t in pivot.index else pd.Series(0, index=sources)
        ppm[t] = {s: int(row.get(s, 0)) * 1_000_000 // int(totals[s])
                  for s in sources}
    # per-term integer moment D = n*Σx² − (Σx)²; σ = √D / n
    usable = []
    for t in top:
        xs = [ppm[t][s] for s in sources]
        sx, sxx = sum(xs), sum(x * x for x in xs)
        d = n * sxx - sx * sx
        if d > 0:
            usable.append((t, d))
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            s1, s2 = sources[i], sources[j]
            acc = 0
            for t, d in usable:
                dx = abs(ppm[t][s1] - ppm[t][s2])
                # per-cell quantize: identical double expr both engines
                acc += int(math.floor(
                    1_000_000.0 * dx * n / math.sqrt(float(d)) + 0.5))
            rows.append((s1, s2, acc // len(usable) if usable else 0))
    out = pd.DataFrame(rows, columns=["s1", "s2", "delta_ppm"])
    out["delta_ppm"] = out["delta_ppm"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_BURROWS_DELTA = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                           '[a-z]+')) AS term
  FROM documents
), tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(tf) AS BIGINT) AS t FROM tf GROUP BY 1
), top AS (
  SELECT term FROM (SELECT term, sum(tf) AS c FROM tf GROUP BY 1)
  ORDER BY c DESC, term LIMIT {_TOPK_TERMS}
), grid AS (
  SELECT tot.source, top.term,
         coalesce(tf.tf, 0) * 1000000 // tot.t AS x
  FROM tot CROSS JOIN top
  LEFT JOIN tf ON tf.source = tot.source AND tf.term = top.term
), mom AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x*x) AS BIGINT) AS sxx
  FROM grid GROUP BY 1
), usable AS (
  SELECT term, n, n*sxx - sx*sx AS d FROM mom WHERE n*sxx - sx*sx > 0
), cells AS (
  SELECT a.source AS s1, b.source AS s2, u.term,
         CAST(floor(1000000.0 * abs(a.x - b.x) * u.n
                    / sqrt(CAST(u.d AS DOUBLE)) + 0.5) AS BIGINT) AS c
  FROM usable u
  JOIN grid a ON a.term = u.term
  JOIN grid b ON b.term = u.term AND a.source < b.source
)
SELECT s1, s2, CAST(sum(c) // count(*) AS BIGINT) AS delta_ppm
FROM cells GROUP BY 1, 2
"""


def hoeffding_bh_fdr(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def ind(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t["source"],
            "long": pc.cast(pc.greater(t["n_chars"], _LONG_CHARS), pa.int64()),
        })

    per = (
        ds.map_batches(ind, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("long", alias_name="n_long"))
        .to_pandas()
    )
    n_tot = int(per["n_docs"].sum())
    l_tot = int(per["n_long"].sum())
    rows = []
    for _, r in per.iterrows():
        nd, nl = int(r["n_docs"]), int(r["n_long"])
        share_ppm = nl * 1_000_000 // nd
        base_ppm = l_tot * 1_000_000 // n_tot
        diff = float(share_ppm - base_ppm)
        # EXACT left-assoc mirror of the SQL expression — a different
        # multiply/divide order rounds differently and can flip the floor
        arg = -2.0 * nd * diff / 1_000_000.0 * diff / 1_000_000.0
        p = math.exp(arg)
        rows.append((str(r["source"]), nd, share_ppm,
                     int(math.floor(1_000_000.0 * p + 0.5))))
    df = pd.DataFrame(rows, columns=["source", "n_docs", "share_ppm", "p_ppm"])
    df = df.sort_values(["p_ppm", "source"], kind="mergesort") \
        .reset_index(drop=True)
    m = len(df)
    rank = np.arange(1, m + 1, dtype=np.int64)
    ok = df["p_ppm"].to_numpy(np.int64) * m * 20 <= rank * 1_000_000
    cut = int(np.max(np.nonzero(ok)[0])) + 1 if ok.any() else 0
    df["flagged"] = (np.arange(m) < cut).astype(np.int64)
    for c in ("n_docs", "share_ppm", "p_ppm"):
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_HOEFFDING_BH_FDR = f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN n_chars > {_LONG_CHARS} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_long
  FROM documents GROUP BY 1
), tot AS (
  SELECT sum(n_docs) AS n, sum(n_long) AS l FROM per
), p AS (
  SELECT source, n_docs,
         n_long * 1000000 // n_docs AS share_ppm,
         CAST(floor(1000000.0 * exp(-2.0 * n_docs
              * CAST((n_long * 1000000 // n_docs)
                     - (tot.l * 1000000 // tot.n) AS DOUBLE) / 1000000.0
              * CAST((n_long * 1000000 // n_docs)
                     - (tot.l * 1000000 // tot.n) AS DOUBLE) / 1000000.0)
              + 0.5) AS BIGINT) AS p_ppm
  FROM per CROSS JOIN tot
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_ppm, source) AS rnk,
         count(*) OVER () AS m
  FROM p
), cut AS (
  SELECT coalesce(max(rnk), 0) AS c FROM ranked
  WHERE p_ppm * m * 20 <= rnk * 1000000
)
SELECT source, n_docs, CAST(share_ppm AS BIGINT) AS share_ppm, p_ppm,
       CAST(CASE WHEN rnk <= (SELECT c FROM cut) THEN 1 ELSE 0 END
            AS BIGINT) AS flagged
FROM ranked
"""


def allan_variance_daily(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts"])

    def day(t: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.divide(pc.cast(t["ts"], pa.int64()),
                             86_400_000_000),
        })

    daily = (
        ev.map_batches(day, batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="cnt"))
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    cnt = daily["cnt"].to_numpy(np.int64)  # dense day index = row order
    rows = []
    for tau in (1, 2, 4):
        m = len(cnt) // tau
        if m < 2:
            continue
        blocks = cnt[: m * tau].reshape(m, tau).sum(axis=1)
        d = np.diff(blocks)
        num = int((d.astype(object) ** 2).sum())
        rows.append((tau, m, num * 1_000_000 // (2 * (m - 1) * tau * tau)))
    out = pd.DataFrame(rows, columns=["tau", "m_blocks", "avar_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ALLAN_VARIANCE = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), idx AS (
  SELECT cnt, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS nd
  FROM daily
), taus AS (SELECT unnest([1, 2, 4]) AS tau),
blocks AS (
  SELECT t.tau, i.i // t.tau AS b, CAST(sum(i.cnt) AS BIGINT) AS s,
         max(i.nd) AS nd
  FROM idx i CROSS JOIN taus t
  WHERE i.i < (i.nd // t.tau) * t.tau
  GROUP BY 1, 2
), diffs AS (
  SELECT tau, s - lag(s) OVER (PARTITION BY tau ORDER BY b) AS d,
         nd // tau AS m
  FROM blocks
)
SELECT tau, CAST(m AS BIGINT) AS m_blocks,
       CAST(sum(CAST(d AS HUGEINT) * d) * 1000000
            // (2 * (m - 1) * tau * tau) AS BIGINT) AS avar_ppm
FROM diffs WHERE d IS NOT NULL AND m >= 2
GROUP BY 1, m
"""


STYLEOPS_REGISTRY = {
    "burrows_delta_sources": (burrows_delta_sources, SQL_BURROWS_DELTA),
    "hoeffding_bh_fdr": (hoeffding_bh_fdr, SQL_HOEFFDING_BH_FDR),
    "allan_variance_daily": (allan_variance_daily, SQL_ALLAN_VARIANCE),
}
