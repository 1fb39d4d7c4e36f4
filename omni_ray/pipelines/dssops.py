"""Operator batch 28 — TPC-H-style decision-support shapes the suite's
relational layer didn't yet cover.

Reference anchors: the reference's SQL surface is single-table SQLite
reads with WHERE/ORDER/LIMIT (`src/storage/database_manager.py`); these
add the four classic hard DSS shapes over the same star schema, each
with the integer-exact conventions of this repo (cents = floor(x*100 +
0.5), data-derived thresholds instead of float literals):

- custdist_q13: customer distribution by order count — the left-join
  count histogram (customers with zero orders form the 0 bucket WITHOUT
  a join: total minus matched).
- small_lot_revenue_q17: lost-revenue-from-small-lots — the correlated
  per-part average threshold (5·qty·n_p < Σqty ⟺ qty < 0.2·avg),
  restricted to the min brand (Q17's brand filter keeps the broadcast
  side tiny at any scale).
- large_order_customers_q18: top large-volume orders — per-order
  quantity fold, HAVING via a data-derived 2×-average threshold, then a
  qualifying-set broadcast filter back onto orders and customers.
- low_engagement_q22: above-average-balance customers with < 5 orders,
  rolled up per nation — the anti/semi-join + scalar-subquery shape
  (pure NOT EXISTS is degenerate here: every synthetic customer has
  orders, so the predicate is "fewer than 5").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Sum

from .engineops import _DAY_US
from .queries import _bucketed_agg, _pd_arrow, _read

_Q18_TOP = 100
_Q22_MAX_ORDERS = 5


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# custdist_q13
# ---------------------------------------------------------------------------


def custdist_q13(sf_dir: str):
    """Distribution of customers by order count (TPC-H Q13 shape): rows
    (c_count, custdist), custdist desc / c_count desc, including the
    zero-order bucket.

    Scale shape: per-customer counts via ONE custkey-bucketed combiner
    fold (custkeys are row-sized); the histogram is a bounded groupby
    over the counts; the zero bucket is total-customers minus matched —
    no left join ships the customer table anywhere."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    per_cust = _bucketed_agg(orders, ["o_custkey"],
                             {"c_count": ("o_custkey", "count")})
    hist = (
        per_cust.groupby("c_count").aggregate(Count(alias_name="custdist"))
        .to_pandas()
    )
    n_cust = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    n_matched = int(hist["custdist"].sum())
    if n_cust > n_matched:
        hist = pd.concat([hist, pd.DataFrame(
            {"c_count": [0], "custdist": [n_cust - n_matched]})],
            ignore_index=True)
    out = hist.sort_values(["custdist", "c_count"],
                           ascending=[False, False]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CUSTDIST_Q13 = """
WITH pc AS (SELECT o_custkey, count(*) AS c_count FROM orders GROUP BY 1),
hist AS (
  SELECT c_count, count(*) AS custdist FROM pc GROUP BY 1
  UNION ALL
  SELECT 0, (SELECT count(*) FROM customer) - (SELECT count(*) FROM pc)
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(custdist AS BIGINT) AS custdist
FROM hist WHERE custdist > 0 ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# small_lot_revenue_q17
# ---------------------------------------------------------------------------


def small_lot_revenue_q17(sf_dir: str):
    """Average yearly revenue lost to small lots (TPC-H Q17 shape): over
    the min brand's parts, lineitems with quantity below 0.2× that
    part's average quantity — integer-exactly 5·qc·n_p < Σqc — summed
    and divided by 7. One row: (brand, n_qualifying, avg_yearly_cents).

    Scale shape: the brand filter keeps the part side tiny (Q17's
    design), so qualifying partkeys broadcast; the lineitem stream
    filters map-side and the per-part averages fold over the small
    filtered set; the verdict pass re-streams with the broadcast
    threshold map — zero row-sized shuffles."""
    parts = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def bmin(t: pa.Table) -> pa.Table:
        return pa.table({"b": pa.array([pc.min(t["p_brand"]).as_py()])})

    brand = min(parts.map_batches(bmin, batch_format="pyarrow")
                .to_pandas()["b"])
    pk = parts.filter(lambda r: r["p_brand"] == brand).to_pandas()
    pkeys_ref = ray.put(set(pk["p_partkey"].astype("int64")))

    def narrow(t: pa.Table) -> pa.Table:
        keys = ray.get(pkeys_ref)
        m = np.array([k in keys for k in t["l_partkey"].to_numpy()])
        return pa.table({
            "l_partkey": pa.array(t["l_partkey"].to_numpy()[m], pa.int64()),
            "qc": pa.array(_cents(t["l_quantity"].to_numpy())[m], pa.int64()),
            "pcents": pa.array(
                _cents(t["l_extendedprice"].to_numpy())[m], pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(narrow, batch_format="pyarrow").materialize()
    per_part = _bucketed_agg(li, ["l_partkey"], {
        "sq": ("qc", "sum"), "np_": ("qc", "count")}).to_pandas()
    thr = {int(r["l_partkey"]): (int(r["sq"]), int(r["np_"]))
           for _, r in per_part.iterrows()}
    thr_ref = ray.put(thr)

    def verdict(t: pa.Table) -> pa.Table:
        tm = ray.get(thr_ref)
        keys = t["l_partkey"].to_numpy()
        qc = t["qc"].to_numpy()
        sq = np.array([tm[int(k)][0] for k in keys], np.int64)
        np_ = np.array([tm[int(k)][1] for k in keys], np.int64)
        ok = 5 * qc * np_ < sq
        return pa.table({
            "n": pa.array([int(ok.sum())], pa.int64()),
            "cents": pa.array([int(t["pcents"].to_numpy()[ok].sum())],
                              pa.int64()),
        })

    agg = li.map_batches(verdict, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="c")) \
        or {}
    out = pd.DataFrame({
        "brand": [brand],
        "n_qualifying": np.int64(int(agg.get("n") or 0)),
        "avg_yearly_cents": np.int64(int(agg.get("c") or 0) // 7),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SMALL_LOT_REVENUE_Q17 = """
WITH b AS (
  SELECT p_partkey FROM part
  WHERE p_brand = (SELECT min(p_brand) FROM part)
), l AS (
  SELECT l_partkey,
         CAST(floor(l_quantity*100 + 0.5) AS BIGINT) AS qc,
         CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS pcents
  FROM lineitem JOIN b ON p_partkey = l_partkey
), s AS (
  SELECT l_partkey, sum(qc) AS sq, count(*) AS np_ FROM l GROUP BY 1
)
SELECT (SELECT min(p_brand) FROM part) AS brand,
       CAST(count(*) AS BIGINT) AS n_qualifying,
       CAST(coalesce(sum(pcents), 0) // 7 AS BIGINT) AS avg_yearly_cents
FROM l JOIN s USING (l_partkey) WHERE 5 * qc * np_ < sq
"""


# ---------------------------------------------------------------------------
# large_order_customers_q18
# ---------------------------------------------------------------------------


def large_order_customers_q18(sf_dir: str):
    """Top large-volume orders (TPC-H Q18 shape): orders whose total
    quantity exceeds 2× the average order quantity (data-derived — the
    integer HAVING sq·n_orders > 2·Σsq), joined back to order and
    customer attributes; top 100 by (o_totalprice desc, o_orderkey).

    Scale shape: per-order quantity via ONE orderkey-bucketed fold; the
    qualifying tail is output-sized, so it broadcasts as a filter onto
    the orders stream and then onto customers — the big tables are never
    shuffled on a join key."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def q(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "qc": pa.array(_cents(t["l_quantity"].to_numpy()), pa.int64()),
        })

    po = _bucketed_agg(li.map_batches(q, batch_format="pyarrow"),
                       ["l_orderkey"], {"sq": ("qc", "sum")}).materialize()
    tot = po.aggregate(Sum("sq", alias_name="tot"),
                       Count(alias_name="n")) or {}
    tot_sq, n_orders = int(tot.get("tot") or 0), int(tot.get("n") or 0)

    def qual(t: pa.Table) -> pa.Table:
        sq = t["sq"].to_numpy()
        m = sq * n_orders > 2 * tot_sq
        return pa.table({
            "l_orderkey": pa.array(t["l_orderkey"].to_numpy()[m], pa.int64()),
            "sum_qty_c": pa.array(sq[m], pa.int64()),
        })

    big = po.map_batches(qual, batch_format="pyarrow").to_pandas()
    okeys_ref = ray.put(set(big["l_orderkey"].astype("int64")))

    def pick_orders(t: pa.Table) -> pa.Table:
        keys = ray.get(okeys_ref)
        m = np.array([k in keys for k in t["o_orderkey"].to_numpy()])
        return pa.table({
            "o_orderkey": pa.array(t["o_orderkey"].to_numpy()[m], pa.int64()),
            "o_custkey": pa.array(t["o_custkey"].to_numpy()[m], pa.int64()),
            "o_day": pa.array(
                (pc.cast(t["o_orderdate"], pa.int64()).to_numpy()[m]
                 // _DAY_US), pa.int64()),
            "total_cents": pa.array(
                _cents(t["o_totalprice"].to_numpy())[m], pa.int64()),
        })

    ords = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                            "o_orderdate", "o_totalprice"]) \
        .map_batches(pick_orders, batch_format="pyarrow").to_pandas()
    top = ords.merge(big, left_on="o_orderkey", right_on="l_orderkey") \
        .sort_values(["total_cents", "o_orderkey"],
                     ascending=[False, True]).head(_Q18_TOP)
    ckeys_ref = ray.put(set(top["o_custkey"].astype("int64")))

    def pick_cust(t: pa.Table) -> pa.Table:
        keys = ray.get(ckeys_ref)
        m = np.array([k in keys for k in t["c_custkey"].to_numpy()])
        return pa.table({
            "c_custkey": pa.array(t["c_custkey"].to_numpy()[m], pa.int64()),
            "c_name": pa.array(np.asarray(t["c_name"].to_pylist(),
                                          dtype=object)[m].tolist()),
        })

    names = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]) \
        .map_batches(pick_cust, batch_format="pyarrow").to_pandas()
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey") \
        .sort_values(["total_cents", "o_orderkey"],
                     ascending=[False, True]).reset_index(drop=True)
    out = out[["c_custkey", "c_name", "o_orderkey", "o_day",
               "total_cents", "sum_qty_c"]]
    for c in ("c_custkey", "o_orderkey", "o_day", "total_cents",
              "sum_qty_c"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LARGE_ORDER_CUSTOMERS_Q18 = f"""
WITH po AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS sq
  FROM lineitem GROUP BY 1
), t AS (SELECT sum(sq) AS tot, count(*) AS n FROM po),
big AS (
  SELECT l_orderkey, sq FROM po
  WHERE sq * (SELECT n FROM t) > 2 * (SELECT tot FROM t)
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(epoch_us(o_orderdate) // {_DAY_US} AS BIGINT) AS o_day,
       CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents,
       CAST(sq AS BIGINT) AS sum_qty_c
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_cents DESC, o_orderkey LIMIT {_Q18_TOP}
"""


# ---------------------------------------------------------------------------
# low_engagement_q22
# ---------------------------------------------------------------------------


def low_engagement_q22(sf_dir: str):
    """Above-average-balance, low-engagement customers per nation (TPC-H
    Q22 shape): customers whose balance-cents beats the positive-balance
    average (bc·n_pos > Σ_pos, integer-exact) and who placed fewer than
    5 orders, rolled up to (c_nationkey, n_cust, bal_cents).

    Scale shape: per-customer order counts via ONE custkey-bucketed
    fold; the customer stream LEFT-joins those counts with a
    hash-partitioned ``Dataset.join`` (both sides row-sized — the
    both-sides-large strategy); the scalar average is a broadcast pair
    of ints; the rollup is a bounded nation groupby."""
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            "bc": pa.array(_cents(t["c_acctbal"].to_numpy()), pa.int64()),
        })

    cb = cust.map_batches(bal, batch_format="pyarrow").materialize()

    def pos_part(t: pa.Table) -> pa.Table:
        b = t["bc"].to_numpy()
        p = b[b > 0]
        return pa.table({"s": pa.array([int(p.sum())], pa.int64()),
                         "n": pa.array([len(p)], pa.int64())})

    pos = cb.map_batches(pos_part, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Count(alias_name="_"),
                   Sum("n", alias_name="n")) or {}
    s_pos, n_pos = int(pos.get("s") or 0), int(pos.get("n") or 0)

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    oc = _bucketed_agg(orders, ["o_custkey"],
                       {"n_ord": ("o_custkey", "count")})
    j = cb.join(oc, join_type="left_outer", on=("c_custkey",),
                right_on=("o_custkey",), num_partitions=8)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        n_ord = df["n_ord"].fillna(0).astype("int64")
        bc = df["bc"].astype("int64")
        m = (n_ord < _Q22_MAX_ORDERS) & (bc * n_pos > s_pos)
        return pd.DataFrame({
            "c_nationkey": df["c_nationkey"][m].astype("int64"),
            "bc": bc[m],
        })

    out = (
        j.map_batches(_pd_arrow(keep), batch_format="pandas")
        .groupby("c_nationkey").aggregate(
            Count(alias_name="n_cust"), Sum("bc", alias_name="bal_cents"))
        .to_pandas().sort_values("c_nationkey").reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LOW_ENGAGEMENT_Q22 = f"""
WITH pos AS (
  SELECT sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS s,
         count(*) AS n
  FROM customer WHERE floor(c_acctbal*100 + 0.5) > 0
), oc AS (
  SELECT o_custkey, count(*) AS n_ord FROM orders GROUP BY 1
), cand AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bc,
         coalesce(oc.n_ord, 0) AS n_ord
  FROM customer LEFT JOIN oc ON o_custkey = c_custkey
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(bc) AS BIGINT) AS bal_cents
FROM cand
WHERE n_ord < {_Q22_MAX_ORDERS} AND bc * (SELECT n FROM pos) > (SELECT s FROM pos)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


DSSOPS_REGISTRY = {
    "custdist_q13": (custdist_q13, SQL_CUSTDIST_Q13),
    "small_lot_revenue_q17": (small_lot_revenue_q17,
                              SQL_SMALL_LOT_REVENUE_Q17),
    "large_order_customers_q18": (large_order_customers_q18,
                                  SQL_LARGE_ORDER_CUSTOMERS_Q18),
    "low_engagement_q22": (low_engagement_q22, SQL_LOW_ENGAGEMENT_Q22),
}
