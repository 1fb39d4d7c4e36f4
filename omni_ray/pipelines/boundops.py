"""Operator batch 48 — concentration bounds, robust scale, trend tests
and record statistics.

Reference anchors: none in the reference; these add:

- hoeffding_ci_conversion: distribution-free 95% confidence half-width
  for each event type's purchase-conversion share — Hoeffding's
  ε = sqrt(ln(2/δ)/(2n)) with ln(40)/2 as a shared integer-10¹²
  literal and an exact isqrt; the deterministic error bar no bootstrap
  can give.
- sn_scale_daily: Rousseeuw's Sₙ robust scale of the dense daily count
  series per type — lowmed_i lowmed_j |x_i − x_j| (type-1 medians both
  levels), the 50%-breakdown spread estimate immune to the outlier days
  that inflate a standard deviation.
- mann_kendall_trend: the Mann–Kendall S statistic per type — Σ_{i<j}
  sign(x_j − x_i) over the dense daily series; the nonparametric trend
  companion to Theil–Sen's slope and the runs test.
- record_days_audit: record-breaking days (strict running maxima) per
  type vs the i.i.d. expectation H_n (the harmonic number, as the exact
  shared integer Σ 10⁶ // k) — more records than H_n flags growth,
  fewer flags early saturation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .engineops import _DAY_US
from .queries import _bucketed_agg, _pd_arrow, _read
from .tsops import _trunc_div

# ln(2/0.05)/2 = ln(40)/2 in trillionths — shared literal with SQL
_HOEFF_A_T12 = round(math.log(40.0) / 2 * 10 ** 12)


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
# hoeffding_ci_conversion
# ---------------------------------------------------------------------------


def hoeffding_ci_conversion(sf_dir: str):
    """Per event type: the share of users with ≥ 1 event of that type who
    ALSO purchased (conversion ppm over n users), with the Hoeffding 95%
    half-width eps_ppm = isqrt(ln(40)/2 · 10¹² // n) — exact,
    distribution-free, no bootstrap.

    Scale shape: per-user type bitmask + purchase flag fold in ONE
    user-bucketed shuffle; per-type counts are bounded."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "event_type"])
        d = d.assign(_kb=(d["user_id"].to_numpy(np.int64) % 256))
        return d[["user_id", "event_type", "_kb"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        buyers = set(d.loc[d["event_type"] == "purchase", "user_id"])
        out = d.groupby("event_type", sort=False)["user_id"].agg(
            n="nunique",
            conv=lambda v: int(sum(1 for u in set(v) if u in buyers)),
        ).reset_index()
        return out

    per_type = (
        ev.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("event_type").aggregate(Sum("n", alias_name="n"),
                                         Sum("conv", alias_name="conv"))
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    rows = []
    for _, r in per_type.iterrows():
        n, conv = int(r["n"]), int(r["conv"])
        eps = math.isqrt(_HOEFF_A_T12 // n) if n else 0
        rows.append((r["event_type"], n, conv,
                     conv * 1_000_000 // n if n else 0, eps))
    out = pd.DataFrame(rows, columns=["event_type", "n_users",
                                      "n_converted", "conv_ppm",
                                      "eps_ppm"])
    for c in ("n_users", "n_converted", "conv_ppm", "eps_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_HOEFFDING_CI_CONVERSION = f"""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
buyers AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase'),
per AS (
  SELECT ut.event_type, count(*) AS n,
         sum(CASE WHEN buyers.user_id IS NOT NULL THEN 1 ELSE 0 END)
           AS conv
  FROM ut LEFT JOIN buyers USING (user_id) GROUP BY 1
), fs AS (
  SELECT event_type, n, conv,
         CAST(floor(sqrt(CAST({_HOEFF_A_T12} // n AS DOUBLE)))
              AS BIGINT) AS f
  FROM per
)
SELECT event_type, CAST(n AS BIGINT) AS n_users,
       CAST(conv AS BIGINT) AS n_converted,
       CAST(conv * 1000000 // n AS BIGINT) AS conv_ppm,
       CAST(f - (CASE WHEN f * f > {_HOEFF_A_T12} // n
                      THEN 1 ELSE 0 END)
              + (CASE WHEN (f + 1) * (f + 1) <= {_HOEFF_A_T12} // n
                      THEN 1 ELSE 0 END) AS BIGINT) AS eps_ppm
FROM fs ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# sn_scale_daily
# ---------------------------------------------------------------------------


def sn_scale_daily(sf_dir: str):
    """Rousseeuw's Sₙ robust scale per event type over the dense daily
    series: for each day i, m_i = lowmed_j |x_i − x_j| (j ≠ i, type-1
    lower median); Sₙ = lowmed_i m_i. 50% breakdown: half the days can
    be wild without moving it.

    Scale shape: days are bounded — one bounded groupby, then an
    O(days²) scan over the day table per type."""
    series, n = _dense_by_type(sf_dir)
    rows = []
    for etype, x in sorted(series.items()):
        ms = []
        for i in range(n):
            d = np.sort(np.abs(x[i] - np.delete(x, i)))
            ms.append(int(d[(len(d) - 1) // 2]))
        ms = np.sort(np.array(ms, np.int64))
        rows.append((etype, n, int(ms[(n - 1) // 2])))
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "sn_scale"])
    for c in ("n_days", "sn_scale"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SN_SCALE_DAILY = f"""
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
), inner_med AS (
  SELECT a.event_type, a.day,
         quantile_disc(abs(a.x - b.x), 0.5) AS m
  FROM dense a JOIN dense b
    ON b.event_type = a.event_type AND b.day != a.day
  GROUP BY 1, 2
)
SELECT event_type,
       CAST((SELECT n FROM lims) AS BIGINT) AS n_days,
       CAST(quantile_disc(m, 0.5) AS BIGINT) AS sn_scale
FROM inner_med GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# mann_kendall_trend
# ---------------------------------------------------------------------------


def mann_kendall_trend(sf_dir: str):
    """Mann–Kendall trend statistic per event type: S = Σ_{i<j}
    sign(x_j − x_i) over the dense daily series, with the pair count and
    the normalized s_ppm = 10⁶·S // n_pairs (the tau-a numerator). The
    nonparametric trend test behind Theil–Sen's slope.

    Scale shape: bounded day table — O(days²) vectorized scan."""
    series, n = _dense_by_type(sf_dir)
    i, j = np.triu_indices(n, k=1)
    rows = []
    for etype, x in sorted(series.items()):
        s = int(np.sign(x[j] - x[i]).sum())
        npairs = len(i)
        rows.append((etype, npairs, s,
                     _trunc_div(1_000_000 * s, npairs) if npairs else 0))
    out = pd.DataFrame(rows, columns=["event_type", "n_pairs", "s_stat",
                                      "s_ppm"])
    for c in ("n_pairs", "s_stat", "s_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MANN_KENDALL_TREND = f"""
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
), pairs AS (
  SELECT a.event_type, sign(b.x - a.x) AS s
  FROM dense a JOIN dense b
    ON b.event_type = a.event_type AND b.day > a.day
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(s) AS BIGINT) AS s_stat,
       CAST(1000000 * sum(s) // count(*) AS BIGINT) AS s_ppm
FROM pairs GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# record_days_audit
# ---------------------------------------------------------------------------


def record_days_audit(sf_dir: str):
    """Record-breaking days per event type: strict running maxima of the
    dense daily series (day 1 is always a record) vs the i.i.d.
    expectation H_n as the exact shared integer Σ_{k=1..n} 10⁶ // k.
    More records than H_n ⇒ growth; fewer ⇒ front-loaded peak.

    Scale shape: bounded day table — one vectorized cummax scan."""
    series, n = _dense_by_type(sf_dir)
    h_n = sum(1_000_000 // k for k in range(1, n + 1))
    rows = []
    for etype, x in sorted(series.items()):
        run = np.maximum.accumulate(x)
        prev = np.concatenate([[np.iinfo(np.int64).min], run[:-1]])
        records = int((x > prev).sum())
        rows.append((etype, n, records, h_n,
                     records * 1_000_000 - h_n))
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "records",
                                      "expected_ppm", "gap_ppm"])
    for c in ("n_days", "records", "expected_ppm", "gap_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_RECORD_DAYS_AUDIT = f"""
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
), recs AS (
  SELECT event_type, day, x,
         max(x) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prevmax
  FROM dense
), hn AS (
  SELECT sum(1000000 // k) AS h
  FROM (SELECT unnest(generate_series(1, (SELECT n FROM lims))) AS k)
)
SELECT event_type,
       CAST((SELECT n FROM lims) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN prevmax IS NULL OR x > prevmax
                     THEN 1 ELSE 0 END) AS BIGINT) AS records,
       CAST((SELECT h FROM hn) AS BIGINT) AS expected_ppm,
       CAST(sum(CASE WHEN prevmax IS NULL OR x > prevmax
                     THEN 1 ELSE 0 END) * 1000000
            - (SELECT h FROM hn) AS BIGINT) AS gap_ppm
FROM recs GROUP BY event_type ORDER BY event_type
"""


BOUNDOPS_REGISTRY = {
    "hoeffding_ci_conversion": (hoeffding_ci_conversion,
                                SQL_HOEFFDING_CI_CONVERSION),
    "sn_scale_daily": (sn_scale_daily, SQL_SN_SCALE_DAILY),
    "mann_kendall_trend": (mann_kendall_trend, SQL_MANN_KENDALL_TREND),
    "record_days_audit": (record_days_audit, SQL_RECORD_DAYS_AUDIT),
}
