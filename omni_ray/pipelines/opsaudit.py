"""Operator batch 22 — operational stewardship: fair budgets, gap filling,
readability QA, and drift monitoring.

Reference anchors: the reference throttles per-host with a fixed semaphore
(`src/crawler/crawler_engine.py` politeness sleeps) and never revisits the
budget; these add the quantitative versions a 100-TB operation runs:

- host_budget_waterfill: max-min fair allocation of a global crawl budget
  across sources (the progressive-filling / water-filling algorithm) —
  integer level search over the sorted demand prefix sums, exact in both
  engines.
- ffill_gaps: per-user daily last-observation-carried-forward series over
  a dense day spine — the gap-filling read behind every "state as of day
  d" dashboard.
- readability_scores: per-source Flesch-style readability (integer-milli
  arithmetic over the repo's token/sentence/syllable conventions) — the
  corpus-QA signal beside Gopher-style filters.
- psi_drift: Population Stability Index between the first and second half
  of the event stream over value bands (+1-smoothed, ppm shares,
  ln-quantized per the tfidf convention) — the standard "did my
  distribution move" monitor.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .engineops import _DAY_US
from .queries import _bucketed_agg, _pd_arrow, _read

_WF_CAP_NUM, _WF_CAP_DEN = 1, 2  # budget = half of total demand

_RS_WORD = re.compile(r"[a-z]+")
_RS_SYL = re.compile(r"[aeiouy]+")

_PSI_BAND = 1_000  # cents per value band
_PPM = 1_000_000
_WEEK_DAYS = 7


# ---------------------------------------------------------------------------
# host_budget_waterfill
# ---------------------------------------------------------------------------


def host_budget_waterfill(sf_dir: str):
    """Max-min fair split of a global crawl budget (half the corpus) across
    sources: every source gets min(demand, level) where the integer water
    level is the largest t with Σ min(d_i, t) ≤ budget — small demands are
    fully served, big ones capped at one fair level.

    Scale shape: demands are ONE bounded per-source count (sources are a
    bounded domain); the waterfill itself is an O(k log k) driver fold over
    the k-row demand vector — the politeness-budget allocator of the crawl
    loop, exact."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["source"])
    dem = ds.groupby("source").aggregate(Count(alias_name="demand")) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    d = dem["demand"].to_numpy(np.int64)
    total = int(d.sum())
    budget = total * _WF_CAP_NUM // _WF_CAP_DEN

    order = np.argsort(d, kind="stable")
    ds_sorted = d[order]
    prefix = np.concatenate([[0], np.cumsum(ds_sorted)])
    k = len(ds_sorted)
    level = int(ds_sorted[-1])  # no cap needed if budget covers everything
    for r in range(k):
        # fair share of the remaining budget among the unsaturated tail;
        # a demand at or below it is fully served (below the water line)
        cand = (budget - int(prefix[r])) // (k - r)
        if cand < int(ds_sorted[r]):
            level = cand
            break
    alloc = np.minimum(d, level)
    return pa.table({
        "source": pa.array(dem["source"].tolist(), pa.string()),
        "demand": pa.array(d, pa.int64()),
        "alloc": pa.array(alloc, pa.int64()),
        "level": pa.array(np.full(len(d), level, np.int64)),
    })


SQL_HOST_BUDGET_WATERFILL = f"""
WITH dem AS (
  SELECT source, count(*) AS demand FROM documents GROUP BY 1
), tot AS (
  SELECT sum(demand) * {_WF_CAP_NUM} // {_WF_CAP_DEN} AS budget,
         count(*) AS k, max(demand) AS mx
  FROM dem
), ranked AS (
  SELECT demand,
         row_number() OVER (ORDER BY demand, source) AS rn,
         coalesce(sum(demand) OVER (ORDER BY demand, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM dem
), lvl AS (
  -- first rank whose fair share falls short of its demand sets the level;
  -- shares are non-increasing from there on, so max() == first
  SELECT coalesce(
    (SELECT max((tot.budget - prefix) // (tot.k - rn + 1))
     FROM ranked CROSS JOIN tot
     WHERE (tot.budget - prefix) // (tot.k - rn + 1) < demand),
    (SELECT mx FROM tot)) AS level
)
SELECT d.source, CAST(d.demand AS BIGINT) AS demand,
       CAST(least(d.demand, lvl.level) AS BIGINT) AS alloc,
       CAST(lvl.level AS BIGINT) AS level
FROM dem d CROSS JOIN lvl ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# ffill_gaps
# ---------------------------------------------------------------------------


def ffill_gaps(sf_dir: str):
    """Per-user daily state series: the last observed event value (cents,
    ties broken by ts then event_id) carried forward over a dense day
    spine from the user's first active day to the global last day.

    Scale shape: global max day is one bounded aggregate; each user's
    events co-locate through ONE user-bucketed shuffle and the fill is a
    vectorized reindex+ffill inside the bucket — the output is the
    users × days state table, exactly the size the read demands."""
    import ray
    from ray.data.aggregate import Max

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.divide(us, _DAY_US),
            "us": us,
            "event_id": t["event_id"],
            "cents": pa.array(cents, pa.int64()),
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    rows = ev.map_batches(prep, batch_format="pyarrow")
    max_day = int(rows.aggregate(Max("day", alias_name="m"))["m"])

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day", "us", "event_id"])
        last = g.groupby(["user_id", "day"], as_index=False).tail(1)
        outs = []
        for uid, u in last.groupby("user_id"):
            spine = np.arange(int(u["day"].min()), max_day + 1,
                              dtype=np.int64)
            s = u.set_index("day")["cents"].reindex(spine).ffill() \
                .astype(np.int64)
            outs.append(pd.DataFrame({
                "user_id": np.int64(uid), "day": spine,
                "cents_ff": s.to_numpy(),
            }))
        return pd.concat(outs, ignore_index=True)

    return (
        rows.groupby("_kb")
        .map_groups(_pd_arrow(fill), batch_format="pandas")
        .sort(["user_id", "day"])
    )


SQL_FFILL_GAPS = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day, epoch_us(ts) AS us,
         event_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events
), daily AS (
  SELECT user_id, day, cents FROM (
    SELECT user_id, day, cents,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM e) WHERE rn = 1
), mx AS (SELECT max(day) AS max_day FROM e),
spine AS (
  SELECT u.user_id, unnest(range(u.lo, mx.max_day + 1)) AS day
  FROM (SELECT user_id, min(day) AS lo FROM e GROUP BY 1) u CROSS JOIN mx
)
SELECT s.user_id, s.day, CAST(d.cents AS BIGINT) AS cents_ff
FROM spine s JOIN daily d
  ON d.user_id = s.user_id
 AND d.day = (SELECT max(d2.day) FROM daily d2
              WHERE d2.user_id = s.user_id AND d2.day <= s.day)
ORDER BY s.user_id, s.day
"""


# ---------------------------------------------------------------------------
# readability_scores
# ---------------------------------------------------------------------------


def readability_scores(sf_dir: str):
    """Per-source Flesch-style readability in integer millis:
    score_m = 206835 - 1015·(words·1000//sentences)//1000
                     - 84600·(syllables·1000//words)//1000,
    with the repo's `[a-z]+` word, `'. '`-split sentence and `[aeiouy]+`
    syllable-group conventions. Bounded per-source rollup of mean (exact
    floor), min and max.

    Scale shape: one zero-shuffle scoring map, one bounded groupby."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def score(t: pa.Table) -> pa.Table:
        srcs, scores = [], []
        for src, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            low = text.lower()
            w = len(_RS_WORD.findall(low))
            if w == 0:  # wordless docs are excluded in BOTH engines
                continue
            s = len(text.split(". "))
            sy = len(_RS_SYL.findall(low))
            srcs.append(src)
            scores.append(206835
                          - 1015 * (w * 1000 // s) // 1000
                          - 84600 * (sy * 1000 // w) // 1000)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "score_m": pa.array(np.asarray(scores, np.int64), pa.int64()),
        })

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("score_m", alias_name="s"),
                   Min("score_m", alias_name="min_m"),
                   Max("score_m", alias_name="max_m"))
        .to_pandas()
    )
    n = out["n_docs"].to_numpy(np.int64)
    s = out["s"].to_numpy(np.int64)
    res = pd.DataFrame({
        "source": out["source"],
        "n_docs": n,
        "mean_m": s // n,  # both engines floor-divide non-negative sums
        "min_m": out["min_m"].astype("int64"),
        "max_m": out["max_m"].astype("int64"),
    }).sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_READABILITY_SCORES = """
WITH scored AS (
  SELECT source,
         206835
         - 1015 * (len(regexp_extract_all(lower(text), '[a-z]+')) * 1000
                   // len(string_split(text, '. '))) // 1000
         - 84600 * (len(regexp_extract_all(lower(text), '[aeiouy]+')) * 1000
                    // len(regexp_extract_all(lower(text), '[a-z]+'))) // 1000
           AS score_m
  FROM documents
  WHERE len(regexp_extract_all(lower(text), '[a-z]+')) > 0
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(score_m) // count(*) AS BIGINT) AS mean_m,
       CAST(min(score_m) AS BIGINT) AS min_m,
       CAST(max(score_m) AS BIGINT) AS max_m
FROM scored GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------


def psi_drift(sf_dir: str):
    """Population Stability Index between the first and second half of the
    event stream (split at the median week boundary) over $10 value bands:
    per band, +1-smoothed ppm shares p/q and the PSI term
    (p_ppm - q_ppm)·lnq(p/q) with lnq the tfidf-convention quantized log —
    the drift monitor every scoring pipeline runs.

    Scale shape: one bounded (band, half) count fold (bands are a bounded
    value domain); smoothing, shares and terms fold on the output-sized
    band table."""
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US)
        week = pc.divide(day, _WEEK_DAYS).to_numpy()
        cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({
            "band": pa.array(cents // _PSI_BAND, pa.int64()),
            "week": pa.array(week, pa.int64()),
            "n": pa.array(np.ones(len(cents), np.int64)),
        })

    rows = ev.map_batches(prep, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max, Min

    span = rows.aggregate(Min("week", alias_name="lo"),
                          Max("week", alias_name="hi"))
    mid = (int(span["lo"]) + int(span["hi"]) + 1) // 2

    def halves(t: pa.Table) -> pa.Table:
        second = pc.greater_equal(t["week"], mid)
        return pa.table({
            "band": t["band"],
            "p": pc.if_else(second, pa.scalar(0, pa.int64()), t["n"]),
            "q": pc.if_else(second, t["n"], pa.scalar(0, pa.int64())),
        })

    bands = rows.map_batches(halves, batch_format="pyarrow") \
        .groupby("band").sum(["p", "q"]).to_pandas()
    bands.columns = ["band", "p", "q"]
    bands = bands.sort_values("band").reset_index(drop=True)
    p = bands["p"].to_numpy(np.int64) + 1  # Laplace smoothing
    q = bands["q"].to_numpy(np.int64) + 1
    p_ppm = p * _PPM // int(p.sum())
    q_ppm = q * _PPM // int(q.sum())
    lnq = np.floor(np.log(p_ppm.astype(np.float64) / q_ppm)
                   * _PPM + 0.5).astype(np.int64)
    term = (p_ppm - q_ppm) * lnq
    return pa.table({
        "band": pa.array(bands["band"].to_numpy(np.int64)),
        "p_ppm": pa.array(p_ppm, pa.int64()),
        "q_ppm": pa.array(q_ppm, pa.int64()),
        "psi_term": pa.array(term, pa.int64()),
    })


SQL_PSI_DRIFT = f"""
WITH e AS (
  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) // {_PSI_BAND} AS band,
         (epoch_us(ts) // {_DAY_US}) // {_WEEK_DAYS} AS week
  FROM events
), mid AS (SELECT (min(week) + max(week) + 1) // 2 AS m FROM e),
bands AS (
  SELECT band,
         sum(CASE WHEN week < mid.m THEN 1 ELSE 0 END) + 1 AS p,
         sum(CASE WHEN week >= mid.m THEN 1 ELSE 0 END) + 1 AS q
  FROM e CROSS JOIN mid GROUP BY 1
), tot AS (SELECT sum(p) AS sp, sum(q) AS sq FROM bands),
shares AS (
  SELECT band, p * {_PPM} // tot.sp AS p_ppm, q * {_PPM} // tot.sq AS q_ppm
  FROM bands CROSS JOIN tot
)
SELECT band, CAST(p_ppm AS BIGINT) AS p_ppm, CAST(q_ppm AS BIGINT) AS q_ppm,
       CAST((p_ppm - q_ppm)
            * CAST(floor(ln(CAST(p_ppm AS DOUBLE) / q_ppm) * {_PPM} + 0.5)
                   AS BIGINT) AS BIGINT) AS psi_term
FROM shares ORDER BY band
"""


OPSAUDIT_REGISTRY = {
    "host_budget_waterfill": (host_budget_waterfill,
                              SQL_HOST_BUDGET_WATERFILL),
    "ffill_gaps": (ffill_gaps, SQL_FFILL_GAPS),
    "readability_scores": (readability_scores, SQL_READABILITY_SCORES),
    "psi_drift": (psi_drift, SQL_PSI_DRIFT),
}
