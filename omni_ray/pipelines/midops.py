"""Operator batch 54 — robust location, curvature detection and
milestone timing.

Reference anchors: none in the reference; these add:

- interquartile_mean: the midmean of purchase cents — the mean over
  exact type-1 rank positions ceil(n/4)+1 .. ceil(3n/4), computed from
  the bounded value histogram with per-value rank windows (no sort);
  the robust location between median and mean.
- quadratic_trend_sign: curvature of the dense daily series per type —
  the exact integer quadratic contrast U = Σ q_t·x_t with q_t =
  n·(2t−n+1)² − Σ_s(2s−n+1)² (Σq = 0 by construction); U > 0 is convex
  (U-shaped / accelerating), U < 0 concave (peaked) — the term the
  linear Mann–Kendall test cannot see.
- days_to_spend_milestone: per purchasing user, the day offset (from
  their first purchase) at which cumulative spend first reaches $50;
  the exact median offset among users who reach it, plus the reach
  rate — the LTV-milestone read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .engineops import _DAY_US
from .queries import _pd_arrow, _read
from .tsops import _trunc_div

_MILESTONE_CENTS = 5_000


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# interquartile_mean
# ---------------------------------------------------------------------------


def interquartile_mean(sf_dir: str):
    """Midmean of purchase cents: with lo = ceil(n/4) and hi = ceil(3n/4),
    the mean (milli-cents, floored) over sorted ranks lo+1 .. hi —
    computed from the bounded value histogram by clipping each value's
    rank window to (lo, hi], never sorting rows.

    Scale shape: one bounded cents groupby; the rank clipping is a
    vectorized scan of the histogram."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        c = _cents(t["value"].to_numpy())
        return pa.table({"cents": pa.array(c, pa.int64()),
                         "one": pa.array(np.ones(len(c), np.int64))})

    hist = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("one", alias_name="n"))
        .to_pandas().sort_values("cents")
    )
    v = hist["cents"].to_numpy(np.int64)
    cn = hist["n"].to_numpy(np.int64)
    n = int(cn.sum())
    lo, hi = (n + 3) // 4, (3 * n + 3) // 4
    cum = np.cumsum(cn)
    start = cum - cn  # ranks before this value
    take = np.minimum(cum, hi) - np.maximum(start, lo)
    take = np.maximum(take, 0)
    mass = int((v.astype(object) * take.astype(object)).sum())
    k = int(take.sum())
    out = pd.DataFrame({
        "n_purchases": [np.int64(n)],
        "k_mid": np.int64(k),
        "midmean_milli": np.int64(mass * 1000 // k if k else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_INTERQUARTILE_MEAN = """
WITH p AS (
  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), hist AS (
  SELECT cents, count(*) AS n FROM p GROUP BY 1
), tot AS (
  SELECT sum(n) AS nn, ((sum(n) + 3) // 4) AS lo,
         ((3 * sum(n) + 3) // 4) AS hi
  FROM hist
), scan AS (
  SELECT cents, n,
         sum(n) OVER (ORDER BY cents) AS cum
  FROM hist
), take AS (
  SELECT cents,
         greatest(least(cum, (SELECT hi FROM tot))
                  - greatest(cum - n, (SELECT lo FROM tot)), 0) AS t
  FROM scan
)
SELECT CAST((SELECT nn FROM tot) AS BIGINT) AS n_purchases,
       CAST(sum(t) AS BIGINT) AS k_mid,
       CAST(CASE WHEN sum(t) = 0 THEN 0
                 ELSE sum(CAST(cents AS HUGEINT) * t) * 1000 // sum(t)
            END AS BIGINT) AS midmean_milli
FROM take
"""


# ---------------------------------------------------------------------------
# quadratic_trend_sign
# ---------------------------------------------------------------------------


def quadratic_trend_sign(sf_dir: str):
    """Quadratic contrast over the dense daily series per type: with
    b_t = 2t − (n−1) and B = Σ b_s², the contrast weights q_t = n·b_t²
    − B sum to zero; U = Σ q_t·x_t, sign(U) = +1 convex / −1 concave.
    Reported with U descaled by 10³ for readability.

    Scale shape: bounded day table — one vectorized contrast fold."""
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
    t_idx = np.arange(n, dtype=object)
    b = 2 * t_idx - (n - 1)
    big_b = int(sum(x * x for x in b))
    q = n * (b * b) - big_b
    rows = []
    for etype, g in daily.groupby("event_type"):
        x = np.zeros(n, dtype=object)
        for _, r in g.iterrows():
            x[int(r["day"]) - lo] = int(r["c"])
        u = int(sum(qq * xx for qq, xx in zip(q, x)))
        rows.append((etype, n, _trunc_div(u, 1000),
                     0 if u == 0 else (1 if u > 0 else -1)))
    out = pd.DataFrame(rows, columns=["event_type", "n_days",
                                      "u_scaled", "curvature"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in ("n_days", "u_scaled", "curvature"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_QUADRATIC_TREND_SIGN = f"""
WITH d AS (
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
), bb AS (
  SELECT sum(CAST(2 * i - ((SELECT n FROM lims) - 1) AS HUGEINT)
             * (2 * i - ((SELECT n FROM lims) - 1))) AS b
  FROM (SELECT unnest(generate_series(
    0, (SELECT n FROM lims) - 1)) AS i)
), u AS (
  SELECT event_type,
         sum(((SELECT n FROM lims)
              * CAST(2 * i - ((SELECT n FROM lims) - 1) AS HUGEINT)
              * (2 * i - ((SELECT n FROM lims) - 1))
              - (SELECT b FROM bb)) * x) AS uu
  FROM dense GROUP BY 1
)
SELECT event_type,
       CAST((SELECT n FROM lims) AS BIGINT) AS n_days,
       CAST(uu // 1000 AS BIGINT) AS u_scaled,
       CAST(sign(uu) AS BIGINT) AS curvature
FROM u ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# days_to_spend_milestone
# ---------------------------------------------------------------------------


def days_to_spend_milestone(sf_dir: str):
    """LTV milestone: per purchasing user, the day offset from their
    FIRST purchase at which cumulative spend first reaches $50 (5000
    cents). Output: purchasing users, users reaching it, reach ppm, and
    the exact type-1 median offset among reachers (from the bounded
    offset histogram).

    Scale shape: per-user ordered scan inside ONE user-bucketed shuffle
    emits each reacher's offset; the median comes from the bounded
    day-offset histogram."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "cents": pa.array(_cents(t["value"].to_numpy()), pa.int64()),
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        offs, users = [], 0
        for _, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            us = u["us"].to_numpy(np.int64)[order]
            c = u["cents"].to_numpy(np.int64)[order]
            users += 1
            cum = np.cumsum(c)
            idx = np.searchsorted(cum, _MILESTONE_CENTS, side="left")
            if idx < len(cum):
                offs.append(int((us[idx] - us[0]) // _DAY_US))
        return pd.DataFrame({
            "off": pd.array(offs + [-1], "int64"),
            "n": pd.array([0] * len(offs) + [users], "int64"),
        })

    parts = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(scan), batch_format="pandas")
        .groupby("off").aggregate(Count(alias_name="c"),
                                  Sum("n", alias_name="n"))
        .to_pandas().sort_values("off")
    )
    n_users = int(parts.loc[parts["off"] == -1, "n"].sum())
    reach = parts[parts["off"] >= 0]
    v = reach["off"].to_numpy(np.int64)
    cn = reach["c"].to_numpy(np.int64)
    k = int(cn.sum())
    if k:
        cum = np.cumsum(cn)
        med = int(v[np.searchsorted(cum, (k + 1) // 2, side="left")])
    else:
        med = 0
    out = pd.DataFrame({
        "n_buyers": [np.int64(n_users)],
        "n_reached": np.int64(k),
        "reach_ppm": np.int64(k * 1_000_000 // n_users if n_users else 0),
        "median_days": np.int64(med),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DAYS_TO_SPEND_MILESTONE = f"""
WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), scans AS (
  SELECT user_id, us,
         sum(cents) OVER w AS cum,
         min(us) OVER (PARTITION BY user_id) AS first_us
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), reach AS (
  SELECT user_id,
         min(CASE WHEN cum >= {_MILESTONE_CENTS}
                  THEN (us - first_us) // {_DAY_US} END) AS off
  FROM scans GROUP BY 1
), agg AS (
  SELECT count(*) AS n_buyers,
         count(off) AS n_reached,
         quantile_disc(off, 0.5) AS med
  FROM reach
)
SELECT CAST(n_buyers AS BIGINT) AS n_buyers,
       CAST(n_reached AS BIGINT) AS n_reached,
       CAST(n_reached * 1000000 // n_buyers AS BIGINT) AS reach_ppm,
       CAST(coalesce(med, 0) AS BIGINT) AS median_days
FROM agg
"""


MIDOPS_REGISTRY = {
    "interquartile_mean": (interquartile_mean, SQL_INTERQUARTILE_MEAN),
    "quadratic_trend_sign": (quadratic_trend_sign, SQL_QUADRATIC_TREND_SIGN),
    "days_to_spend_milestone": (days_to_spend_milestone,
                                SQL_DAYS_TO_SPEND_MILESTONE),
}
