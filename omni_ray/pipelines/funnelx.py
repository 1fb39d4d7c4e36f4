"""Timed-funnel / robust-gap / correlated-argmin operators (round 4,
batch 76):

- strict_funnel_timed: the timed conversion chain — first view, first
  click AT-OR-AFTER it, first purchase at-or-after that click, with HARD
  deadlines (click within 1 h of the view, purchase within 2 h of the
  click). Deterministic first-eligible-chain semantics (min-joins), so
  the oracle is exact; the untimed funnel_conversion can't see deadline
  attrition, which is the number a growth team actually tracks.
- gap_median_by_type: exact MEDIAN inter-event gap per type — the robust
  companion to renewops' gap moments (one heavy user can drag a mean by
  orders of magnitude; the median can't move). ONE bucketed (type, gap)
  value-count fold, then the rank cut on its cumsum — type-1 order stat,
  rank ⌈n/2⌉ = DuckDB quantile_disc(0.5); no global sort, no per-type
  re-scan (second-granularity gaps repeat heavily, so the count table is
  orders smaller than the gap stream).
- q2_min_cost_supplier: the TPC-H Q2 correlated-minimum shape adapted to
  this schema (no partsupp: the part→supplier relation is lineitem's
  distinct pairs, cost is s_acctbal): per part, the (min acctbal, then
  min suppkey) supplier. Distinct pairs via _bucketed_agg, the 100-row
  supplier dim broadcast, the per-part argmin run as an int64-packed
  bucketed MIN (the dedup_keep_best packing rule; 20-bit suppkey
  field holds to sf100) — one shuffle of
  (part, packed) partials, never a sort.

Scale shape: the funnel folds per user inside hash-bucketed map_groups;
the median moves only bounded histograms + one rank-bin refinement per
type; the argmin moves one packed int per (block, part).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from .queries import _bucketed_agg, _pd_arrow, _read

_CLICK_WINDOW_US = 3_600_000_000
_PURCHASE_WINDOW_US = 7_200_000_000


def strict_funnel_timed(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def kb(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_kb", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int64()))

    def stage(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        us_all = g["ts"].astype("datetime64[us]").astype("int64")
        for uid, u in g.assign(us=us_all).groupby("user_id"):
            views = np.sort(u.loc[u["event_type"] == "view", "us"].to_numpy())
            st = "none"
            if len(views):
                st = "view"
                v0 = int(views[0])
                clicks = np.sort(
                    u.loc[u["event_type"] == "click", "us"].to_numpy())
                clicks = clicks[clicks >= v0]
                if len(clicks) and int(clicks[0]) - v0 <= _CLICK_WINDOW_US:
                    st = "click"
                    c0 = int(clicks[0])
                    buys = np.sort(
                        u.loc[u["event_type"] == "purchase", "us"].to_numpy())
                    buys = buys[buys >= c0]
                    if len(buys) and int(buys[0]) - c0 <= _PURCHASE_WINDOW_US:
                        st = "purchase"
            out.append((st,))
        return pd.DataFrame(out, columns=["stage"])

    out = (
        ev.map_batches(kb, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(stage), batch_format="pandas")
        .groupby("stage").aggregate(Count(alias_name="n_users"))
        .to_pandas().sort_values("stage").reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_STRICT_FUNNEL = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
  SELECT user_id, min(epoch_us(ts)) AS v0 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS c0
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v0
  GROUP BY 1
), cq AS (
  SELECT c.user_id, c.c0 FROM c JOIN v ON c.user_id = v.user_id
  WHERE c.c0 - v.v0 <= {_CLICK_WINDOW_US}
), p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS p0
  FROM events e JOIN cq ON e.user_id = cq.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= cq.c0
  GROUP BY 1
), pq AS (
  SELECT p.user_id FROM p JOIN cq ON p.user_id = cq.user_id
  WHERE p.p0 - cq.c0 <= {_PURCHASE_WINDOW_US}
), lab AS (
  SELECT u.user_id,
         CASE WHEN pq.user_id IS NOT NULL THEN 'purchase'
              WHEN cq.user_id IS NOT NULL THEN 'click'
              WHEN v.user_id IS NOT NULL THEN 'view'
              ELSE 'none' END AS stage
  FROM u LEFT JOIN v ON u.user_id = v.user_id
  LEFT JOIN cq ON u.user_id = cq.user_id
  LEFT JOIN pq ON u.user_id = pq.user_id
)
SELECT stage, CAST(count(*) AS BIGINT) AS n_users
FROM lab GROUP BY 1
"""


def gap_median_by_type(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_id", "user_id",
                                          "event_type"])

    def kb(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_kb", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int64()))

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (_, et), u in g.groupby(["user_id", "event_type"]):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["ts"].astype("datetime64[us]")
                                 .astype("int64").to_numpy()))
            us = u["ts"].astype("datetime64[us]").astype("int64") \
                .to_numpy()[order]
            for d in (np.diff(us) // 1_000_000):
                rows.append((et, int(d)))
        return pd.DataFrame(rows, columns=["event_type", "gap_s"]) \
            if rows else pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "gap_s": pd.Series([], dtype="int64")})

    gds = ev.map_batches(kb, batch_format="pyarrow") \
        .groupby("_kb").map_groups(_pd_arrow(gaps), batch_format="pandas")
    # ONE value-count fold replaces per-type selection passes: the
    # (type, gap_s) count table is orders smaller than the gap stream
    # (values repeat heavily at second granularity), and the rank cut
    # runs on its cumsum — type-1 order stat, same as quantile_disc(0.5)
    vc = _bucketed_agg(gds, ["event_type", "gap_s"],
                       {"c": ("gap_s", "count")}).to_pandas()
    rows = []
    for et, g in vc.groupby("event_type"):
        g = g.sort_values("gap_s")
        cnt = g["c"].to_numpy(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        med = int(g["gap_s"].to_numpy(np.int64)[
            np.searchsorted(cum, (n + 1) // 2, side="left")])
        rows.append((str(et), n, med))
    rows.sort()
    out = pd.DataFrame(rows, columns=["event_type", "n_gaps", "median_gap_s"])
    for c in ("n_gaps", "median_gap_s"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_GAP_MEDIAN = """
WITH seq AS (
  SELECT event_type, user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), g AS (
  SELECT event_type, (us - prev) // 1000000 AS gap_s
  FROM seq WHERE prev IS NOT NULL
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap_s, 0.5) AS BIGINT) AS median_gap_s
FROM g GROUP BY 1
"""


_ACCTBAL_OFFSET = 1_000_000  # cents offset making every packed key positive


def q2_min_cost_supplier(sf_dir: str):
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    cents = np.floor(np.asarray(
        sup["s_acctbal"].to_numpy(zero_copy_only=False)) * 100.0
        + 0.5).astype(np.int64)
    packed = {int(k): (int(c) + _ACCTBAL_OFFSET) * (1 << 20) + int(k)
              for k, c in zip(sup["s_suppkey"].to_pylist(), cents)}
    pref = ray.put(packed)

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pack(t: pa.Table) -> pa.Table:
        m = ray.get(pref)
        return pa.table({
            "l_partkey": t["l_partkey"],
            "pk": pa.array([m[int(s)] for s in t["l_suppkey"].to_pylist()],
                           pa.int64()),
        })

    best = _bucketed_agg(
        li.map_batches(pack, batch_format="pyarrow"),
        ["l_partkey"], {"pk": ("pk", "min")}).to_pandas()
    pk = best["pk"].to_numpy(np.int64)
    out = pd.DataFrame({
        "l_partkey": best["l_partkey"].to_numpy(np.int64),
        "s_suppkey": pk % (1 << 20),
        "acctbal_cents": pk // (1 << 20) - _ACCTBAL_OFFSET,
    }).sort_values("l_partkey").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_Q2_MIN_COST = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), ranked AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
         row_number() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT), l_suppkey)
           AS rk
  FROM pairs JOIN supplier ON l_suppkey = s_suppkey
)
SELECT l_partkey, CAST(l_suppkey AS BIGINT) AS s_suppkey, acctbal_cents
FROM ranked WHERE rk = 1
"""


FUNNELX_REGISTRY = {
    "strict_funnel_timed": (strict_funnel_timed, SQL_STRICT_FUNNEL),
    "gap_median_by_type": (gap_median_by_type, SQL_GAP_MEDIAN),
    "q2_min_cost_supplier": (q2_min_cost_supplier, SQL_Q2_MIN_COST),
}
