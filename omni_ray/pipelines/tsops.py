"""Operator batch 29 — time-series structure and customer-value analytics.

Reference anchors: the reference's time axis is "articles in the last
hour/day" counters (`src/api/dashboard.py`); these add the
autocorrelation, segmentation and concentration reads an operator of a
100-TB event stream actually makes decisions from:

- daily_acf: integer-exact autocovariance-ratio ACF of the dense daily
  count series at lags 1..7 — seasonality detection without a single
  float (deviations scaled by n, ratio in ppm with the TRUNCATING
  division both engines share).
- rfm_segments: the classic Recency/Frequency/Monetary quartile cube —
  per-user purchase metrics, type-1 quartile cuts (sorted[ceil(q·n)-1],
  DuckDB's quantile_disc convention), 64-cell census.
- spend_concentration: share of total purchase value held by the top
  1/5/10/25% of users, with the k-th-largest threshold found by exact
  distributed selection and ties settled arithmetically — the Lorenz
  numbers behind "whales vs long tail".
- churn_cells: the inactive × declining 2×2 census (last activity > 7
  days before stream end; second-half count strictly below first-half).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .engineops import _DAY_US
from .queries import _bucketed_agg, _pd_arrow, _read

_ACF_LAGS = 7
_RFM_QS = (0.25, 0.5, 0.75)
_CONC_PCTS = (1, 5, 10, 25)
_CHURN_IDLE_DAYS = 7


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


def _trunc_div(a: int, b: int) -> int:
    """Exact integer division truncating toward zero — DuckDB's `//`
    semantics (Python's `//` floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _exact_ranks(ds, col: str, ranks: list[int], n_bins: int = 1024):
    """Exact type-1 order statistics of ``ds[col]`` at the given 1-based
    ascending ranks WITHOUT a global sort: one bounded equal-width
    histogram locates each rank's bin; a second filtered pass collects
    only those bins' values for the driver to refine (≈ rows/bins each).
    The same distributed-selection shape as fpindex's decile cuts."""
    agg = ds.aggregate(Min(col), Max(col)) or {}
    lo, hi = int(agg[f"min({col})"]), int(agg[f"max({col})"])
    width = max(1, (hi - lo + n_bins) // n_bins)

    def binit(t: pa.Table) -> pa.Table:
        return pa.table({"bin": pa.array(
            (t[col].to_numpy() - lo) // width, pa.int64())})

    hist = (
        ds.map_batches(binit, batch_format="pyarrow")
        .groupby("bin").aggregate(Count(alias_name="cnt"))
        .to_pandas().sort_values("bin")
    )
    bins = hist["bin"].to_numpy(np.int64)
    cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
    rk = np.asarray(ranks, np.int64)
    bin_idx = np.searchsorted(cum, rk, side="left")
    need = set(bins[bin_idx].tolist())

    def pick(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy()
        m = np.isin((v - lo) // width, list(need))
        return pa.table({col: pa.array(v[m], pa.int64())})

    picked = np.sort(ds.map_batches(pick, batch_format="pyarrow")
                     .to_pandas()[col].to_numpy(np.int64))
    out = np.empty(len(rk), np.int64)
    for i, (r, bi) in enumerate(zip(rk, bin_idx)):
        below = int(cum[bi - 1]) if bi > 0 else 0
        inbin = picked[(picked - lo) // width == bins[bi]]
        out[i] = inbin[r - below - 1]
    return out


# ---------------------------------------------------------------------------
# daily_acf
# ---------------------------------------------------------------------------


def daily_acf(sf_dir: str):
    """Integer-exact ACF of the dense (zero-filled) daily event-count
    series at lags 1..7: with deviations e_t = n·x_t − T, num_k =
    Σ_{t} e_t·e_{t+k}, den = Σ e_t², acf_ppm = trunc(10^6·num_k / den).

    Scale shape: days are a bounded domain — one bounded groupby, then a
    vectorized scan over the day table; no row ever leaves its block
    twice."""
    ev = _read(sf_dir, "events", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.divide(pc.cast(t["ts"], pa.int64()),
                                          _DAY_US)})

    daily = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="c"))
        .to_pandas().sort_values("day")
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    x = np.zeros(hi - lo + 1, np.int64)
    x[daily["day"].to_numpy(np.int64) - lo] = daily["c"].to_numpy(np.int64)
    n, total = len(x), int(x.sum())
    e = (n * x - total).astype(object)  # python ints: overflow-proof
    den = int(sum(v * v for v in e))
    rows = []
    for k in range(1, _ACF_LAGS + 1):
        num = int(sum(e[t] * e[t + k] for t in range(n - k))) \
            if k < n else 0
        rows.append((k, num, den,
                     _trunc_div(1_000_000 * num, den) if den else 0))
    out = pd.DataFrame(rows, columns=["lag", "num_scaled", "den_scaled",
                                      "acf_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DAILY_ACF = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1
), spine AS (
  SELECT unnest(generate_series((SELECT min(day) FROM daily),
                                (SELECT max(day) FROM daily))) AS day
), dense AS (
  SELECT s.day, coalesce(d.c, 0) AS x FROM spine s
  LEFT JOIN daily d USING (day)
), n AS (SELECT count(*) AS nn, sum(x) AS tt FROM dense),
dev AS (
  SELECT day, (SELECT nn FROM n) * x - (SELECT tt FROM n) AS e FROM dense
), den AS (SELECT sum(e * e) AS d0 FROM dev),
ks(k) AS (VALUES (1), (2), (3), (4), (5), (6), (7)),
num AS (
  SELECT k, coalesce(sum(a.e * b.e), 0) AS nk
  FROM ks CROSS JOIN dev a JOIN dev b ON b.day = a.day + ks.k
  GROUP BY k
)
SELECT CAST(k AS BIGINT) AS lag, CAST(nk AS BIGINT) AS num_scaled,
       CAST((SELECT d0 FROM den) AS BIGINT) AS den_scaled,
       CAST(CASE WHEN (SELECT d0 FROM den) = 0 THEN 0
                 ELSE 1000000 * nk // (SELECT d0 FROM den) END
            AS BIGINT) AS acf_ppm
FROM num ORDER BY k
"""


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------


def _rfm_metrics(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type",
                                          "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            "cents": pa.array(_cents(t["value"].to_numpy()), pa.int64()),
        })

    return _bucketed_agg(
        ev.map_batches(prep, batch_format="pyarrow"), ["user_id"],
        {"rec": ("day", "max"), "freq": ("day", "count"),
         "mon": ("cents", "sum")}).materialize()


def rfm_segments(sf_dir: str):
    """RFM quartile cube: per purchasing user the recency (last purchase
    day), frequency (purchase count) and monetary (cents) metrics,
    quartile-binned with type-1 cuts (sorted[ceil(q·n)-1] — DuckDB's
    quantile_disc) via bin = 1 + Σ (v > cut); 64-cell census.

    Scale shape: per-user metrics via ONE user-bucketed fold; each
    quartile cut by exact distributed selection over the metrics table
    (histogram + pinpoint-bin refine); the census is a bounded
    64-key groupby."""
    m = _rfm_metrics(sf_dir)
    n = m.count()
    ranks = [max(1, -(-int(q * 100 * n) // 100)) for q in _RFM_QS]
    cuts = {c: _exact_ranks(m, c, ranks) for c in ("rec", "freq", "mon")}

    def binit(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c, b in (("rec", "r_bin"), ("freq", "f_bin"), ("mon", "m_bin")):
            v = df[c].to_numpy(np.int64)
            out[b] = (1 + (v > cuts[c][0]).astype(np.int64)
                      + (v > cuts[c][1]) + (v > cuts[c][2]))
        return pd.DataFrame(out)

    out = (
        m.map_batches(_pd_arrow(binit), batch_format="pandas")
        .groupby(["r_bin", "f_bin", "m_bin"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas().sort_values(["r_bin", "f_bin", "m_bin"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_RFM_SEGMENTS = f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT user_id, max(day) AS rec, count(*) AS freq, sum(cents) AS mon
  FROM p GROUP BY 1
), q AS (
  SELECT quantile_disc(rec, 0.25) AS r1, quantile_disc(rec, 0.5) AS r2,
         quantile_disc(rec, 0.75) AS r3,
         quantile_disc(freq, 0.25) AS f1, quantile_disc(freq, 0.5) AS f2,
         quantile_disc(freq, 0.75) AS f3,
         quantile_disc(mon, 0.25) AS m1, quantile_disc(mon, 0.5) AS m2,
         quantile_disc(mon, 0.75) AS m3
  FROM m
)
SELECT CAST(1 + CAST(rec > q.r1 AS INT) + CAST(rec > q.r2 AS INT)
              + CAST(rec > q.r3 AS INT) AS BIGINT) AS r_bin,
       CAST(1 + CAST(freq > q.f1 AS INT) + CAST(freq > q.f2 AS INT)
              + CAST(freq > q.f3 AS INT) AS BIGINT) AS f_bin,
       CAST(1 + CAST(mon > q.m1 AS INT) + CAST(mon > q.m2 AS INT)
              + CAST(mon > q.m3 AS INT) AS BIGINT) AS m_bin,
       CAST(count(*) AS BIGINT) AS n_users
FROM m, q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# spend_concentration
# ---------------------------------------------------------------------------


def spend_concentration(sf_dir: str):
    """Lorenz concentration: for the top 1/5/10/25% of purchasing users
    by spend (k = ceil(pct·n/100)), the user count k, their combined
    spend and its ppm share of total. The k-th-largest spend comes from
    exact distributed selection; ties at the threshold contribute
    (k − |above|)·v* arithmetically, so no global sort and no arbitrary
    tie-breaking is needed.

    Scale shape: per-user spend via ONE user-bucketed fold; thresholds
    via the bounded-histogram selection; one final pass folds
    above-threshold counts and sums for all four thresholds at once."""
    m = _rfm_metrics(sf_dir)
    n = m.count()
    tot = int((m.aggregate(Sum("mon", alias_name="s")) or {}).get("s") or 0)
    ks = [(p * n + 99) // 100 for p in _CONC_PCTS]
    # k-th largest = (n-k+1)-th smallest
    vstars = _exact_ranks(m, "mon", [n - k + 1 for k in ks])

    def above(t: pa.Table) -> pa.Table:
        v = np.asarray(t["mon"].to_numpy(), np.int64)
        rows = {"i": [], "n_above": [], "s_above": []}
        for i, vs in enumerate(vstars):
            mask = v > vs
            rows["i"].append(i)
            rows["n_above"].append(int(mask.sum()))
            rows["s_above"].append(int(v[mask].sum()))
        return pa.table({k: pa.array(val, pa.int64())
                         for k, val in rows.items()})

    acc = (
        m.map_batches(above, batch_format="pyarrow")
        .groupby("i").aggregate(Sum("n_above", alias_name="na"),
                                Sum("s_above", alias_name="sa"))
        .to_pandas().sort_values("i")
    )
    rows = []
    for i, (p, k, vs) in enumerate(zip(_CONC_PCTS, ks, vstars)):
        na = int(acc.loc[acc["i"] == i, "na"].iloc[0])
        sa = int(acc.loc[acc["i"] == i, "sa"].iloc[0])
        top = sa + (k - na) * int(vs)
        rows.append((p, k, top, top * 1_000_000 // tot if tot else 0))
    out = pd.DataFrame(rows, columns=["pct", "k_users", "spend_cents",
                                      "share_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _conc_sql() -> str:
    pcts = ", ".join(f"({p})" for p in _CONC_PCTS)
    return f"""
WITH p AS (
  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT user_id, sum(cents) AS mon FROM p GROUP BY 1
), r AS (
  SELECT mon, row_number() OVER (ORDER BY mon DESC, user_id) AS rn FROM m
), n AS (SELECT count(*) AS nu, sum(mon) AS tot FROM m),
pc(pct) AS (VALUES {pcts})
SELECT CAST(pct AS BIGINT) AS pct,
       CAST((pct * (SELECT nu FROM n) + 99) // 100 AS BIGINT) AS k_users,
       CAST((SELECT sum(mon) FROM r
             WHERE rn <= (pct * (SELECT nu FROM n) + 99) // 100)
            AS BIGINT) AS spend_cents,
       CAST((SELECT sum(mon) FROM r
             WHERE rn <= (pct * (SELECT nu FROM n) + 99) // 100)
            * 1000000 // (SELECT tot FROM n) AS BIGINT) AS share_ppm
FROM pc ORDER BY pct
"""


SQL_SPEND_CONCENTRATION = _conc_sql()


# ---------------------------------------------------------------------------
# churn_cells
# ---------------------------------------------------------------------------


def churn_cells(sf_dir: str):
    """Churn 2×2 census over all event activity: inactive = last event
    more than 7 days before the stream's max day; declining = strictly
    fewer events in the second half of [min_day, max_day] (day > mid,
    mid = (lo+hi)//2) than the first. Four dense cells with user counts.

    Scale shape: global day bounds from one aggregate; per-user
    (last, n1, n2) via ONE user-bucketed combiner fold; the census is a
    bounded 4-key groupby, zero-filled output-side."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
        })

    days = ev.map_batches(prep, batch_format="pyarrow").materialize()
    agg = days.aggregate(Min("day"), Max("day")) or {}
    lo, hi = int(agg["min(day)"]), int(agg["max(day)"])
    mid = (lo + hi) // 2

    def halves(t: pa.Table) -> pa.Table:
        d = np.asarray(t["day"].to_numpy(), np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "day": t["day"],
            "h1": pa.array((d <= mid).astype(np.int64), pa.int64()),
            "h2": pa.array((d > mid).astype(np.int64), pa.int64()),
        })

    per_user = _bucketed_agg(
        days.map_batches(halves, batch_format="pyarrow"), ["user_id"],
        {"last": ("day", "max"), "n1": ("h1", "sum"), "n2": ("h2", "sum")})

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "inactive": ((hi - df["last"].to_numpy(np.int64))
                         > _CHURN_IDLE_DAYS).astype(np.int64),
            "declining": (df["n2"].to_numpy(np.int64)
                          < df["n1"].to_numpy(np.int64)).astype(np.int64),
        })

    got = (
        per_user.map_batches(_pd_arrow(cells), batch_format="pandas")
        .groupby(["inactive", "declining"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    spine = pd.MultiIndex.from_product([[0, 1], [0, 1]],
                                       names=["inactive", "declining"])
    out = got.set_index(["inactive", "declining"]) \
        .reindex(spine, fill_value=0).reset_index()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CHURN_CELLS = f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
), lims AS (
  SELECT min(day) AS lo, max(day) AS hi,
         (min(day) + max(day)) // 2 AS mid
  FROM d
), m AS (
  SELECT user_id, max(day) AS last,
         sum(CASE WHEN day <= (SELECT mid FROM lims) THEN 1 ELSE 0 END)
           AS n1,
         sum(CASE WHEN day > (SELECT mid FROM lims) THEN 1 ELSE 0 END)
           AS n2
  FROM d GROUP BY 1
), flags AS (
  SELECT CAST((SELECT hi FROM lims) - last > {_CHURN_IDLE_DAYS} AS INT)
           AS inactive,
         CAST(n2 < n1 AS INT) AS declining
  FROM m
), spine AS (
  SELECT i // 2 AS inactive, i % 2 AS declining
  FROM (SELECT unnest(generate_series(0, 3)) AS i)
)
SELECT CAST(s.inactive AS BIGINT) AS inactive,
       CAST(s.declining AS BIGINT) AS declining,
       CAST(coalesce(f.n, 0) AS BIGINT) AS n_users
FROM spine s LEFT JOIN (
  SELECT inactive, declining, count(*) AS n FROM flags GROUP BY 1, 2
) f ON f.inactive = s.inactive AND f.declining = s.declining
ORDER BY s.inactive, s.declining
"""


TSOPS_REGISTRY = {
    "daily_acf": (daily_acf, SQL_DAILY_ACF),
    "rfm_segments": (rfm_segments, SQL_RFM_SEGMENTS),
    "spend_concentration": (spend_concentration, SQL_SPEND_CONCENTRATION),
    "churn_cells": (churn_cells, SQL_CHURN_CELLS),
}
