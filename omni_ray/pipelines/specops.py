"""Operator batch 34 — cross-series structure: lagged cross-correlation,
weekly spectral power, vocabulary movers and peak census.

Reference anchors: the reference's time-series layer is raw daily counts
(`src/api/dashboard.py`); these add the cross-series reads:

- daily_ccf_best_lag: integer-exact cross-correlation between every
  ordered pair of event types' dense daily series at lags 0..3 (does A
  lead B?), with the best lag by |ppm| (ties to the smaller lag).
- weekly_spectrum: Goertzel-style spectral power at the 7-day period per
  event type — the cos/sin of the 7th roots of unity enter BOTH engines
  as the same integer-millionth literals, so the power is bit-exact.
- term_movers_topk: the 10 biggest document-frequency movers between the
  corpus halves among the top-100 terms — the drill-down behind
  rank_stability_tau's single number.
- daily_peaks: strict local-maxima census of each type's daily series
  (count, tallest peak, peak mass) — the spike inventory.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min

from .engineops import _DAY_US
from .fpindex import _exact_doc_id_cuts
from .queries import _pd_arrow, _read
from .tsops import _trunc_div

_WORD_RE = re.compile(r"[a-z]+")

_CCF_LAGS = 3
_MOVERS_POOL = 100
_MOVERS_TOP = 10
_MOVERS_BUCKETS = 256

# cos/sin(2π·t/7) in millionths for t = 0..6 — literal-shared with SQL
_W7_COS = [round(math.cos(2 * math.pi * t / 7) * 1_000_000)
           for t in range(7)]
_W7_SIN = [round(math.sin(2 * math.pi * t / 7) * 1_000_000)
           for t in range(7)]


def _dense_by_type(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
        })

    daily = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    n = hi - lo + 1
    series = {}
    for etype, g in daily.groupby("event_type"):
        x = np.zeros(n, np.int64)
        x[g["day"].to_numpy(np.int64) - lo] = g["c"].to_numpy(np.int64)
        series[str(etype)] = x
    return series, n


# ---------------------------------------------------------------------------
# daily_ccf_best_lag
# ---------------------------------------------------------------------------


def daily_ccf_best_lag(sf_dir: str):
    """For every ordered pair of event types (a ≠ b), the integer-exact
    cross-correlation of their dense daily series at lags 0..3 (b shifted
    k days later than a: Σ_t ea_t·eb_{t+k} over valid t, deviations
    scaled by n), normalized per-lag in ppm of sqrt-free form num² sign
    — reported as ccf_ppm = trunc(10^6·num_k / den) with den =
    isqrt(Σea²·Σeb²) exact via math.isqrt; best lag maximizes |ccf_ppm|
    (ties to the smaller lag).

    Scale shape: (type, day) bounded groupby → driver-side vectorized
    scan over the bounded type × lag grid."""
    series, n = _dense_by_type(sf_dir)
    devs = {t: (n * x - int(x.sum())).astype(object)
            for t, x in series.items()}
    sq = {t: int(sum(v * v for v in e)) for t, e in devs.items()}
    rows = []
    for a in sorted(series):
        for b in sorted(series):
            if a == b:
                continue
            den = math.isqrt(sq[a] * sq[b])
            best_lag, best_ppm = 0, None
            for k in range(_CCF_LAGS + 1):
                ea, eb = devs[a], devs[b]
                num = int(sum(ea[t] * eb[t + k] for t in range(n - k)))
                ppm = _trunc_div(1_000_000 * num, den) if den else 0
                if best_ppm is None or abs(ppm) > abs(best_ppm):
                    best_lag, best_ppm = k, ppm
            rows.append((a, b, best_lag, best_ppm))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "best_lag",
                                      "ccf_ppm"])
    for c in ("best_lag", "ccf_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DAILY_CCF_BEST_LAG = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (SELECT min(day) AS lo, max(day) AS hi,
                   max(day) - min(day) + 1 AS n FROM d),
spine AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM lims),
                                            (SELECT hi FROM lims)))
              AS day) s
), dense AS (
  SELECT sp.event_type, sp.day, coalesce(d.c, 0) AS x
  FROM spine sp LEFT JOIN d
    ON d.event_type = sp.event_type AND d.day = sp.day
), tt AS (SELECT event_type, sum(x) AS total FROM dense GROUP BY 1),
dev AS (
  SELECT de.event_type, de.day,
         (SELECT n FROM lims) * de.x - tt.total AS e
  FROM dense de JOIN tt USING (event_type)
), sq AS (
  SELECT event_type, sum(CAST(e AS HUGEINT) * e) AS s2 FROM dev GROUP BY 1
), ks AS (SELECT unnest(generate_series(0, {_CCF_LAGS})) AS k),
num AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, ks.k,
         sum(CAST(a.e AS HUGEINT) * b.e) AS nk
  FROM ks CROSS JOIN dev a
  JOIN dev b ON b.day = a.day + ks.k AND b.event_type != a.event_type
  GROUP BY 1, 2, 3
), prod AS (
  SELECT n.type_a, n.type_b, n.k, n.nk, sa.s2 * sb.s2 AS pr,
         CAST(floor(sqrt(CAST(sa.s2 * sb.s2 AS DOUBLE))) AS HUGEINT) AS fs
  FROM num n JOIN sq sa ON sa.event_type = n.type_a
  JOIN sq sb ON sb.event_type = n.type_b
), isq AS (
  -- one-step correction makes the float sqrt an exact integer sqrt
  SELECT type_a, type_b, k, nk,
         fs - (CASE WHEN fs * fs > pr THEN 1 ELSE 0 END)
            + (CASE WHEN (fs + 1) * (fs + 1) <= pr THEN 1 ELSE 0 END)
           AS den
  FROM prod
), scored AS (
  SELECT type_a, type_b, k,
         CAST(CASE WHEN den = 0 THEN 0
              ELSE 1000000 * nk // den END AS BIGINT) AS ppm
  FROM isq
), best AS (
  SELECT type_a, type_b, k, ppm,
         row_number() OVER (PARTITION BY type_a, type_b
                            ORDER BY abs(ppm) DESC, k) AS rn
  FROM scored
)
SELECT type_a, type_b, CAST(k AS BIGINT) AS best_lag,
       CAST(ppm AS BIGINT) AS ccf_ppm
FROM best WHERE rn = 1 ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# weekly_spectrum
# ---------------------------------------------------------------------------


def weekly_spectrum(sf_dir: str):
    """Spectral power at the 7-day period per event type: with the
    deviations e_t = n·x_t − T and the shared integer-millionth literals
    for cos/sin(2π·(t mod 7)/7), C = Σ e_t·cos_t, S = Σ e_t·sin_t, and
    power_scaled = (C² + S²)//10¹² — exact because the roots of unity enter both
    engines as identical integers. power_ppm normalizes by the
    one-bin Parseval denominator (n/2)·10¹²·Σe², so a pure weekly cosine
    reads 10⁶ and a one-day-per-week spike train reads ≈ 1/3 (its energy
    splits across the three harmonic pairs).

    Scale shape: bounded (type, day) groupby → vectorized driver scan."""
    series, n = _dense_by_type(sf_dir)
    cosv = np.array(_W7_COS, dtype=object)
    sinv = np.array(_W7_SIN, dtype=object)
    rows = []
    for t, x in sorted(series.items()):
        e = (n * x - int(x.sum())).astype(object)
        idx = np.arange(n) % 7
        c = int(sum(e[i] * cosv[idx[i]] for i in range(n)))
        s = int(sum(e[i] * sinv[idx[i]] for i in range(n)))
        power = (c * c + s * s) // 10 ** 12  # descaled: fits int64
        tot = int(sum(v * v for v in e))  # Σe²
        # one-bin Parseval denominator under the 1e6 literal scale: a
        # pure ±1/7-frequency cosine reads exactly 1e6 ppm (C = A·n/2·1e6
        # ⇒ C² = Σe²·(n/2)·1e12); a periodic one-day spike train reads
        # ~1/3 (its energy splits across the 3 harmonic pairs)
        den = (10 ** 12) * tot * n // 2
        rows.append((t, c, s, power,
                     (c * c + s * s) * 1_000_000 // den if den else 0))
    out = pd.DataFrame(rows, columns=["event_type", "c_scaled", "s_scaled",
                                      "power_scaled", "power_ppm"])
    for col in ("c_scaled", "s_scaled", "power_scaled", "power_ppm"):
        out[col] = out[col].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


def _spectrum_sql() -> str:
    cosvals = ", ".join(f"({t}, {c}, {s})" for t, (c, s)
                        in enumerate(zip(_W7_COS, _W7_SIN)))
    return f"""
WITH w7(t7, cs, sn) AS (VALUES {cosvals}),
d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (SELECT min(day) AS lo, max(day) - min(day) + 1 AS n FROM d),
spine AS (
  SELECT t.event_type, s.i
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(generate_series(
    0, (SELECT n FROM lims) - 1)) AS i) s
), dense AS (
  SELECT sp.event_type, sp.i, coalesce(d.c, 0) AS x
  FROM spine sp LEFT JOIN d
    ON d.event_type = sp.event_type
   AND d.day = (SELECT lo FROM lims) + sp.i
), tt AS (SELECT event_type, sum(x) AS total FROM dense GROUP BY 1),
dev AS (
  SELECT de.event_type, de.i,
         (SELECT n FROM lims) * de.x - tt.total AS e
  FROM dense de JOIN tt USING (event_type)
), acc AS (
  SELECT dv.event_type,
         sum(CAST(dv.e AS HUGEINT) * w7.cs) AS c,
         sum(CAST(dv.e AS HUGEINT) * w7.sn) AS s,
         sum(CAST(dv.e AS HUGEINT) * dv.e) AS tot
  FROM dev dv JOIN w7 ON w7.t7 = dv.i % 7
  GROUP BY 1
)
SELECT event_type, CAST(c AS BIGINT) AS c_scaled,
       CAST(s AS BIGINT) AS s_scaled,
       CAST((c * c + s * s) // CAST(1000000000000 AS HUGEINT)
            AS BIGINT) AS power_scaled,
       CAST(CASE WHEN tot = 0 THEN 0
                 ELSE (c * c + s * s) * 1000000
                      // (CAST(1000000000000 AS HUGEINT) * tot
                          * (SELECT n FROM lims) // 2)
            END AS BIGINT) AS power_ppm
FROM acc ORDER BY event_type
"""


SQL_WEEKLY_SPECTRUM = _spectrum_sql()


# ---------------------------------------------------------------------------
# term_movers_topk
# ---------------------------------------------------------------------------


def term_movers_topk(sf_dir: str):
    """The 10 biggest document-frequency movers between the corpus halves
    (split at the exact median doc_id) among the overall top-100 terms:
    ordered by |df2 − df1| desc, then term. The drill-down behind
    rank_stability_tau.

    Scale shape: the same ONE term-bucketed (df, df1, df2) fold with
    per-bucket top-100 prune; the mover sort runs over ≤ 100 rows."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    agg = ds.aggregate(Min("doc_id"), Max("doc_id"), Count())
    lo, hi, n = (int(agg["min(doc_id)"]), int(agg["max(doc_id)"]),
                 int(agg["count()"]))
    cut = int(_exact_doc_id_cuts(ds, lo, hi, n)[4])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        term_l, doc_l = [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            for wd in set(_WORD_RE.findall((tx or "").lower())):
                term_l.append(wd)
                doc_l.append(did)
        p = pd.DataFrame({"term": term_l, "doc_id": doc_l})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _MOVERS_BUCKETS).astype(np.int64)
        return p

    def bucket_df(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["term", "doc_id"])
        h1 = d["doc_id"] <= cut
        cnt = d.assign(h1=h1.astype(np.int64),
                       h2=(~h1).astype(np.int64)) \
            .groupby("term", sort=False) \
            .agg(df=("doc_id", "size"), df1=("h1", "sum"),
                 df2=("h2", "sum")).reset_index()
        return cnt.sort_values(["df", "term"], ascending=[False, True]) \
            .head(_MOVERS_POOL)

    top = (
        ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(bucket_df),
                                   batch_format="pandas")
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])
        .head(_MOVERS_POOL)
    )
    top["shift"] = (top["df2"] - top["df1"]).abs()
    out = top.sort_values(["shift", "term"],
                          ascending=[False, True]).head(_MOVERS_TOP)
    out = out[["term", "df", "df1", "df2", "shift"]].reset_index(drop=True)
    for c in ("df", "df1", "df2", "shift"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_TERM_MOVERS_TOPK = f"""
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
), dfs AS (
  SELECT term, count(*) AS df,
         sum(CASE WHEN doc_id <= (SELECT c FROM cut) THEN 1 ELSE 0 END)
           AS df1,
         sum(CASE WHEN doc_id > (SELECT c FROM cut) THEN 1 ELSE 0 END)
           AS df2
  FROM t GROUP BY term
), pool AS (
  SELECT term, df, df1, df2 FROM dfs
  ORDER BY df DESC, term LIMIT {_MOVERS_POOL}
)
SELECT term, CAST(df AS BIGINT) AS df, CAST(df1 AS BIGINT) AS df1,
       CAST(df2 AS BIGINT) AS df2,
       CAST(abs(df2 - df1) AS BIGINT) AS shift
FROM pool ORDER BY abs(df2 - df1) DESC, term LIMIT {_MOVERS_TOP}
"""


# ---------------------------------------------------------------------------
# daily_peaks
# ---------------------------------------------------------------------------


def daily_peaks(sf_dir: str):
    """Strict local-maxima census per event type over the dense daily
    series (interior days only: x_{t-1} < x_t > x_{t+1}): peak count,
    the tallest peak and the total peak mass.

    Scale shape: bounded (type, day) groupby → vectorized neighbor
    comparison over the day vector."""
    series, n = _dense_by_type(sf_dir)
    rows = []
    for t, x in sorted(series.items()):
        if n < 3:
            rows.append((t, 0, 0, 0))
            continue
        mid = x[1:-1]
        is_peak = (mid > x[:-2]) & (mid > x[2:])
        pk = mid[is_peak]
        rows.append((t, int(is_peak.sum()),
                     int(pk.max()) if len(pk) else 0, int(pk.sum())))
    out = pd.DataFrame(rows, columns=["event_type", "n_peaks",
                                      "tallest", "peak_mass"])
    for c in ("n_peaks", "tallest", "peak_mass"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DAILY_PEAKS = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
spine AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM lims),
                                            (SELECT hi FROM lims)))
              AS day) s
), dense AS (
  SELECT sp.event_type, sp.day, coalesce(d.c, 0) AS x
  FROM spine sp LEFT JOIN d
    ON d.event_type = sp.event_type AND d.day = sp.day
), nb AS (
  SELECT event_type, day, x,
         lag(x) OVER (PARTITION BY event_type ORDER BY day) AS xl,
         lead(x) OVER (PARTITION BY event_type ORDER BY day) AS xr
  FROM dense
)
SELECT event_type,
       CAST(coalesce(sum(CASE WHEN x > xl AND x > xr THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_peaks,
       CAST(coalesce(max(CASE WHEN x > xl AND x > xr THEN x END), 0)
            AS BIGINT) AS tallest,
       CAST(coalesce(sum(CASE WHEN x > xl AND x > xr THEN x ELSE 0 END), 0)
            AS BIGINT) AS peak_mass
FROM nb WHERE xl IS NOT NULL AND xr IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


SPECOPS_REGISTRY = {
    "daily_ccf_best_lag": (daily_ccf_best_lag, SQL_DAILY_CCF_BEST_LAG),
    "weekly_spectrum": (weekly_spectrum, SQL_WEEKLY_SPECTRUM),
    "term_movers_topk": (term_movers_topk, SQL_TERM_MOVERS_TOPK),
    "daily_peaks": (daily_peaks, SQL_DAILY_PEAKS),
}
