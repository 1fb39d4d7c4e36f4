"""Operator batch 36 — link prediction, bitmap container planning,
market concentration and arrival-process diagnostics.

Reference anchors: none in the reference; these add:

- link_prediction_topk: classic common-out-neighbor link prediction over
  the house synthetic doc graph (src → (7·src+j) mod n, j = 1..3):
  wedge join on the shared neighbor, existing edges excluded
  FORMULAICALLY (no edge join), top-10 predicted pairs.
- roaring_plan_users: Roaring-bitmap container plan for the distinct
  user-id set — per 2¹⁶ chunk, the cardinality decides array (< 4096,
  2 B/value) vs bitmap (8 KiB) container; the storage read behind every
  fast set index.
- hhi_brand_revenue: the Herfindahl–Hirschman concentration index of
  lineitem revenue across part brands, in ppm (Σ r_i²·10⁶ // T²) — the
  one-number answer to "is revenue concentrated in a few brands?".
- expfit_gap_audit: per event type, the mean and exact median of
  SECONDS-quantized per-user inter-event gaps plus the median/mean ratio
  in ppm — for a Poisson process the ratio sits at ln 2 ≈ 693147, so the
  gap to it measures burstiness of the arrival process.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_LP_TOP = 10
_ROAR_ARRAY_MAX = 4096


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# link_prediction_topk
# ---------------------------------------------------------------------------


def link_prediction_topk(sf_dir: str):
    """Common-out-neighbor link prediction on the synthetic doc graph:
    for unordered node pairs (a < b) sharing at least one out-neighbor,
    score = |N⁺(a) ∩ N⁺(b)|; pairs already connected by an edge (either
    direction, by the edge formula) are excluded; top-10 by (score desc,
    a, b).

    Scale shape: the wedge join is ONE dst-bucketed shuffle (each dst's
    in-neighbors pair in-bucket — in-degree is bounded by the formula);
    pair scores fold in a pair-bucketed combiner; the existing-edge test
    is vectorized arithmetic, never an edge join."""
    nodes = _read(sf_dir, "documents", columns=["doc_id"]).materialize()
    n = nodes.count()

    def edges(t: pa.Table) -> pa.Table:
        src = np.asarray(t["doc_id"].to_numpy(), np.int64)
        srcs, dsts = [], []
        for j in (1, 2, 3):
            dst = (7 * src + j) % n
            keep = dst != src
            srcs.append(src[keep])
            dsts.append(dst[keep])
        s = np.concatenate(srcs)
        d = np.concatenate(dsts)
        return pa.table({
            "src": pa.array(s, pa.int64()),
            "dst": pa.array(d, pa.int64()),
            "_kb": pa.array(d & 255, pa.int64()),
        })

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        a_l, b_l = [], []
        for _, grp in g.groupby("dst"):
            ins = np.sort(grp["src"].unique().astype(np.int64))
            if len(ins) < 2:
                continue
            ii, jj = np.triu_indices(len(ins), k=1)
            a_l.append(ins[ii])
            b_l.append(ins[jj])
        if not a_l:
            return pd.DataFrame({"a": pd.Series([], "int64"),
                                 "b": pd.Series([], "int64"),
                                 "s": pd.Series([], "int64")})
        a = np.concatenate(a_l)
        b = np.concatenate(b_l)
        return pd.DataFrame({"a": a, "b": b,
                             "s": np.ones(len(a), np.int64)})

    scores = _bucketed_agg(
        nodes.map_batches(edges, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(wedges),
                                   batch_format="pandas"),
        ["a", "b"], {"score": ("s", "sum")})

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        # existing-edge test by the formula, both directions
        linked = np.zeros(len(a), bool)
        for j in (1, 2, 3):
            linked |= (7 * a + j) % n == b
            linked |= (7 * b + j) % n == a
        keep = df[~linked]
        return keep.sort_values(["score", "a", "b"],
                                ascending=[False, True, True]) \
            .head(_LP_TOP)

    out = (
        scores.map_batches(_pd_arrow(prune), batch_format="pandas")
        .to_pandas()
        .sort_values(["score", "a", "b"], ascending=[False, True, True])
        .head(_LP_TOP).reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LINK_PREDICTION_TOPK = f"""
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
  SELECT doc_id AS src, (7 * doc_id + j) % (SELECT c FROM n) AS dst
  FROM documents, (SELECT unnest([1, 2, 3]) AS j)
  WHERE (7 * doc_id + j) % (SELECT c FROM n) != doc_id
), ed AS (SELECT DISTINCT src, dst FROM e),
wedge AS (
  SELECT a.src AS a, b.src AS b, count(DISTINCT a.dst) AS score
  FROM ed a JOIN ed b ON b.dst = a.dst AND b.src > a.src
  GROUP BY 1, 2
), pruned AS (
  SELECT a, b, score FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM ed
                    WHERE (ed.src = w.a AND ed.dst = w.b)
                       OR (ed.src = w.b AND ed.dst = w.a))
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(score AS BIGINT) AS score
FROM pruned ORDER BY score DESC, a, b LIMIT {_LP_TOP}
"""


# ---------------------------------------------------------------------------
# roaring_plan_users
# ---------------------------------------------------------------------------


def roaring_plan_users(sf_dir: str):
    """Roaring-bitmap container plan for the distinct user-id set: per
    2¹⁶-value chunk, the distinct-id cardinality, the container verdict
    (0 = array when < 4096, 1 = bitmap otherwise) and the estimated
    bytes (2 per value for arrays, 8192 flat for bitmaps).

    Scale shape: distinct ids per chunk via ONE chunk-keyed bucketed
    distinct fold (block-local dedup first); the plan is a bounded chunk
    table."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].drop_duplicates().to_numpy(np.int64)
        return pd.DataFrame({
            "chunk": u >> 16, "user_id": u,
            "_kb": (u % 251).astype(np.int64),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id"])
        return d.groupby("chunk", sort=False).size() \
            .reset_index(name="n")

    out = (
        ev.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("chunk").sum("n")
        .to_pandas()
    )
    out.columns = ["chunk", "n_values"]
    out = out.sort_values("chunk").reset_index(drop=True)
    bitmap = out["n_values"] >= _ROAR_ARRAY_MAX
    out["container"] = bitmap.astype("int64")
    out["est_bytes"] = np.where(bitmap, 8192, out["n_values"] * 2)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ROARING_PLAN_USERS = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
ch AS (
  SELECT user_id // 65536 AS chunk, count(*) AS n_values
  FROM u GROUP BY 1
)
SELECT CAST(chunk AS BIGINT) AS chunk,
       CAST(n_values AS BIGINT) AS n_values,
       CAST(CASE WHEN n_values >= {_ROAR_ARRAY_MAX} THEN 1 ELSE 0 END
            AS BIGINT) AS container,
       CAST(CASE WHEN n_values >= {_ROAR_ARRAY_MAX} THEN 8192
                 ELSE n_values * 2 END AS BIGINT) AS est_bytes
FROM ch ORDER BY chunk
"""


# ---------------------------------------------------------------------------
# hhi_brand_revenue
# ---------------------------------------------------------------------------


def hhi_brand_revenue(sf_dir: str):
    """Herfindahl–Hirschman index of lineitem revenue across part brands:
    with per-brand revenue cents r_i and total T, hhi_ppm = Σr_i²·10⁶ //
    T². 10⁶/k for k equal brands; 10⁶ for a monopoly. Includes the
    top-brand share for orientation.

    Scale shape: the part→brand map broadcasts (bounded brand table via
    a partkey-bucketed join is unnecessary — parts are dimension-sized
    here; the docstring notes the hash-join alternative for giant part
    tables); revenue folds in a bounded brand groupby."""
    import pyarrow.parquet as pq
    import ray

    pmap = dict(zip(
        *[pq.read_table(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"]).column(c)
          .to_pylist() for c in ("p_partkey", "p_brand")]))
    ref = ray.put(pmap)

    def prep(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = t["l_partkey"].to_numpy()
        cents = _cents(t["l_extendedprice"].to_numpy())
        return pa.table({
            "brand": pa.array([m[int(k)] for k in keys]),
            "cents": pa.array(cents, pa.int64()),
        })

    rev = (
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("brand").aggregate(Sum("cents", alias_name="r"))
        .to_pandas()
    )
    r = rev["r"].astype(object).to_numpy()
    t_sum = int(sum(r))
    hhi = int(sum(v * v for v in r)) * 1_000_000 // (t_sum * t_sum) \
        if t_sum else 0
    top = int(max(r)) if len(r) else 0
    out = pd.DataFrame({
        "n_brands": [np.int64(len(rev))],
        "total_cents": np.int64(t_sum),
        "hhi_ppm": np.int64(hhi),
        "top_share_ppm": np.int64(top * 1_000_000 // t_sum if t_sum else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_HHI_BRAND_REVENUE = """
WITH rev AS (
  SELECT p_brand,
         sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS r
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1
), tot AS (SELECT sum(r) AS t, count(*) AS k, max(r) AS top FROM rev)
SELECT CAST((SELECT k FROM tot) AS BIGINT) AS n_brands,
       CAST((SELECT t FROM tot) AS BIGINT) AS total_cents,
       CAST((SELECT sum(CAST(r AS HUGEINT) * r) FROM rev) * 1000000
            // (CAST((SELECT t FROM tot) AS HUGEINT)
                * (SELECT t FROM tot)) AS BIGINT) AS hhi_ppm,
       CAST((SELECT top FROM tot) * 1000000 // (SELECT t FROM tot)
            AS BIGINT) AS top_share_ppm
FROM tot
"""


# ---------------------------------------------------------------------------
# expfit_gap_audit
# ---------------------------------------------------------------------------


def expfit_gap_audit(sf_dir: str):
    """Arrival-process diagnostics per event type: per-user inter-event
    gaps quantized to whole SECONDS (floor), their count, integer mean,
    exact type-1 median (from the bounded seconds-value histogram), and
    median·10⁶ // mean — a Poisson process reads ≈ ln 2 = 693147 ppm,
    so the deviation measures burstiness/regularity.

    Scale shape: gaps fold per user inside ONE user-bucketed shuffle
    emitting (type, gap_s) rows; the median comes from a bounded
    (type, seconds) value histogram — the CDF trick, no sort."""
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
        outs = []
        for (_, et), u in g.groupby(["user_id", "event_type"]):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            us = u["us"].to_numpy(np.int64)[order]
            if len(us) < 2:
                continue
            outs.append(pd.DataFrame({
                "event_type": et,
                "gap_s": np.diff(us) // 1_000_000,
            }))
        if not outs:
            return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                                 "gap_s": pd.Series([], "int64")})
        return pd.concat(outs, ignore_index=True)

    hist = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(gaps), batch_format="pandas")
        .groupby(["event_type", "gap_s"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("gap_s")
        v = g["gap_s"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        total = int((v.astype(object) * c.astype(object)).sum())
        cum = np.cumsum(c)
        med = int(v[np.searchsorted(cum, (n + 1) // 2, side="left")])
        mean = total // n
        rows.append((et, n, mean, med,
                     med * 1_000_000 // mean if mean else 0))
    out = pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                      "mean_gap_s", "median_gap_s",
                                      "ratio_ppm"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in ("n_gaps", "mean_gap_s", "median_gap_s", "ratio_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_EXPFIT_GAP_AUDIT = """
WITH seq AS (
  SELECT event_type, user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), g AS (
  SELECT event_type, (us - prev) // 1000000 AS gap_s
  FROM seq WHERE prev IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS n, sum(gap_s) AS tot,
         quantile_disc(gap_s, 0.5) AS med
  FROM g GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(tot // n AS BIGINT) AS mean_gap_s,
       CAST(med AS BIGINT) AS median_gap_s,
       CAST(CASE WHEN tot // n = 0 THEN 0
                 ELSE med * 1000000 // (tot // n) END AS BIGINT)
         AS ratio_ppm
FROM agg ORDER BY event_type
"""


LINKOPS_REGISTRY = {
    "link_prediction_topk": (link_prediction_topk, SQL_LINK_PREDICTION_TOPK),
    "roaring_plan_users": (roaring_plan_users, SQL_ROARING_PLAN_USERS),
    "hhi_brand_revenue": (hhi_brand_revenue, SQL_HHI_BRAND_REVENUE),
    "expfit_gap_audit": (expfit_gap_audit, SQL_EXPFIT_GAP_AUDIT),
}
