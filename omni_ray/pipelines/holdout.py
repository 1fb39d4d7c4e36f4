"""Temporal-holdout / long-memory / LSH-planning operators (round 4,
batch 70):

- temporal_holdout_census: the train/test time-cutoff audit a training-data
  pipeline runs before freezing an eval split — per event type: event and
  user counts on each side of the cutoff and the USER OVERLAP (the leakage
  unit a time-split is supposed to kill; any user in both halves carries
  cross-split signal). One pass, bounded per-type output.
- hurst_rs_audit: rescaled-range (R/S) statistics of the daily event-count
  series over non-overlapping windows of {4, 8} days. Everything before
  the final per-window quantization is integer-exact: with window sum S
  and prefix sums P_j, the n-scaled cumulative deviation is
  D_j = n·P_j − j·S (int), R' = max D − min D = n·R, and
  n·S_std = √(n·Σx² − S²) exactly, so R/S = R' / √(nΣx²−S²) — one IEEE
  sqrt + divide per window (correctly rounded ⇒ bit-identical in both
  engines), quantized per window BEFORE the cross-window mean (the
  per-cell rule). R/S growing faster than √n across window sizes is the
  long-memory / burst-persistence signal a capacity planner reads.
- lsh_param_planner: the MinHash-LSH banding planner — for 128
  permutations split as (bands b, rows r) ∈ {(64,2),(32,4),(16,8),(8,16)}
  and Jaccard levels s ∈ {0.5, 0.7, 0.8, 0.9}, the candidate-pair
  probability 1 − (1 − s^r)^b, computed as exp/ln chains (the webqa ln
  rule: same libm, identical expression ⇒ identical doubles) and quantized
  per cell. The table stages/dedup.py's banding choice is read off; the
  n_docs column ties the plan to the corpus it was computed for.

Scale shape: census and R/S fold through bounded groupbys (types, days);
the planner is O(grid) driver math after one count().
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read

_CUT_US = 1_705_881_600_000_000  # 2024-01-22 00:00:00 UTC in epoch us


def temporal_holdout_census(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        tr = pc.cast(pc.less(pc.cast(t["ts"], pa.int64()),
                             pa.scalar(_CUT_US, pa.int64())), pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "user_id": t["user_id"],
            "tr": tr,
            "te": pc.subtract(pa.scalar(1, pa.int64()), tr),
        })

    keyed = ev.map_batches(prep, batch_format="pyarrow")
    # per (type, user): presence on each side — the user-grain fold
    per_user = (
        keyed.groupby(["event_type", "user_id"])
        .aggregate(Sum("tr", alias_name="n_tr"), Sum("te", alias_name="n_te"))
    )

    def flags(t: pa.Table) -> pa.Table:
        tr = pc.cast(pc.greater(t["n_tr"], 0), pa.int64())
        te = pc.cast(pc.greater(t["n_te"], 0), pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "n_events_train": t["n_tr"],
            "n_events_test": t["n_te"],
            "u_train": tr,
            "u_test": te,
            "u_both": pc.multiply(tr, te),
        })

    out = (
        per_user.map_batches(flags, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_events_train", alias_name="n_events_train"),
                   Sum("n_events_test", alias_name="n_events_test"),
                   Sum("u_train", alias_name="n_users_train"),
                   Sum("u_test", alias_name="n_users_test"),
                   Sum("u_both", alias_name="n_users_leaked"))
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_TEMPORAL_HOLDOUT = """
WITH per_user AS (
  SELECT event_type, user_id,
         sum(CASE WHEN epoch_us(ts) < 1705881600000000 THEN 1 ELSE 0 END)
           AS n_tr,
         sum(CASE WHEN epoch_us(ts) < 1705881600000000 THEN 0 ELSE 1 END)
           AS n_te
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(sum(n_tr) AS BIGINT) AS n_events_train,
       CAST(sum(n_te) AS BIGINT) AS n_events_test,
       CAST(sum(CASE WHEN n_tr > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_train,
       CAST(sum(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_test,
       CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_leaked
FROM per_user GROUP BY 1
"""


def hurst_rs_audit(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts"])

    def day(t: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
        })

    daily = (
        ev.map_batches(day, batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="cnt"))
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    x = daily["cnt"].to_numpy(np.int64)
    rows = []
    for w in (4, 8):
        m = len(x) // w
        if m < 1:
            continue
        cells = []
        for b in range(m):
            seg = x[b * w:(b + 1) * w].astype(object)
            s = int(seg.sum())
            sq = int((seg * seg).sum())
            pref = np.cumsum(seg)
            dj = [w * int(pref[j]) - (j + 1) * s for j in range(w)]
            rp = max(dj) - min(dj)          # n-scaled range, exact int
            d = w * sq - s * s              # (n*sigma)^2, exact int
            if d <= 0:
                cells.append(0)
            else:
                cells.append(int(math.floor(
                    1_000_000.0 * rp / math.sqrt(float(d)) + 0.5)))
        rows.append((w, m, sum(cells) // m))
    out = pd.DataFrame(rows, columns=["w", "m_windows", "mean_rs_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_HURST_RS = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), idx AS (
  SELECT cnt, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS nd
  FROM daily
), ws AS (SELECT unnest([4, 8]) AS w),
blk AS (
  SELECT ws.w, i.i // ws.w AS b, i.i % ws.w AS j, i.cnt,
         i.nd // ws.w AS m
  FROM idx i CROSS JOIN ws
  WHERE i.i < (i.nd // ws.w) * ws.w
), pre AS (
  SELECT w, b, j, m,
         sum(cnt) OVER (PARTITION BY w, b ORDER BY j) AS p,
         sum(cnt) OVER (PARTITION BY w, b) AS s,
         sum(CAST(cnt AS HUGEINT) * cnt) OVER (PARTITION BY w, b) AS sq
  FROM blk
), dev AS (
  SELECT w, b, m, CAST(w AS HUGEINT) * p - (j + 1) * s AS dj,
         s, sq
  FROM pre
), per AS (
  SELECT w, b, m, max(dj) - min(dj) AS rp,
         max(CAST(w AS HUGEINT) * sq - CAST(s AS HUGEINT) * s) AS d
  FROM dev GROUP BY 1, 2, 3
), cell AS (
  SELECT w, m,
         CASE WHEN d <= 0 THEN 0
              ELSE CAST(floor(1000000.0 * rp / sqrt(CAST(d AS DOUBLE)) + 0.5)
                        AS BIGINT) END AS c
  FROM per
)
SELECT w, CAST(m AS BIGINT) AS m_windows,
       CAST(sum(c) // m AS BIGINT) AS mean_rs_ppm
FROM cell GROUP BY 1, m
"""


_LSH_GRID = [(64, 2), (32, 4), (16, 8), (8, 16)]
_LSH_S = [(5, 10), (7, 10), (8, 10), (9, 10)]  # s as exact rationals


def lsh_param_planner(sf_dir: str):
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    rows = []
    for b, r in _LSH_GRID:
        for num, den in _LSH_S:
            s = float(num) / float(den)
            # exp/ln chains (same libm both engines), per-cell quantize
            p1 = math.exp(r * math.log(s))
            miss = math.exp(b * math.log(1.0 - p1))
            collide = 1.0 - miss
            rows.append((n_docs, b, r, num * 1_000_000 // den,
                         int(math.floor(1_000_000.0 * collide + 0.5))))
    out = pd.DataFrame(rows, columns=["n_docs", "bands", "rows_per_band",
                                      "s_ppm", "collide_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LSH_PLANNER = """
WITH grid AS (
  SELECT unnest([64, 32, 16, 8]) AS b, unnest([2, 4, 8, 16]) AS r
), s AS (
  SELECT unnest([5, 7, 8, 9]) AS num, 10 AS den
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT n.n_docs, CAST(g.b AS BIGINT) AS bands,
       CAST(g.r AS BIGINT) AS rows_per_band,
       CAST(s.num * 1000000 // s.den AS BIGINT) AS s_ppm,
       CAST(floor(1000000.0 *
              (1.0 - exp(g.b * ln(1.0 - exp(g.r * ln(
                 CAST(s.num AS DOUBLE) / CAST(s.den AS DOUBLE))))))
            + 0.5) AS BIGINT) AS collide_ppm
FROM grid g CROSS JOIN s CROSS JOIN n
"""


HOLDOUT_REGISTRY = {
    "temporal_holdout_census": (temporal_holdout_census, SQL_TEMPORAL_HOLDOUT),
    "hurst_rs_audit": (hurst_rs_audit, SQL_HURST_RS),
    "lsh_param_planner": (lsh_param_planner, SQL_LSH_PLANNER),
}
