"""Classic analytical join shapes (round 4, batch 65): the three TPC-H
join patterns the surface didn't yet pin — Q3 (selective dim filter → fact
hash-join → row-sized rollup → global top-k), Q10 (filtered fact → hash-join
→ per-customer rollup → top-k with dim attach), Q9 (two broadcast dims +
one bounded rollup). Adapted to this schema: no o_shippriority /
ps_supplycost / l_commitdate, so Q3 carries o_orderpriority, Q9 prices cost
from part.p_retailprice and buckets by ship year (avoids a second fact
join), and Q10 windows on a fixed half-year.

Scale shape notes (each is the point of the op):
- q3_shipping_priority: the BUILDING customer keyset is ~1/5 of customers —
  broadcast here, with the measured broadcast↔join cutover documented at
  the call site (same rule as stages/dedup.PAIR_BROADCAST_MAX); the
  fact⋈orders edge is a real hash join (Dataset.join), never a broadcast,
  because both sides scale with the fact. Revenue per order is a ROW-SIZED
  key domain → _bucketed_agg, then a distributed sort + limit(10): only ten
  rows reach the driver.
- q10_returned_items: quarter-filtered fact → hash join → _bucketed_agg per
  customer → distributed top-20 by revenue; customer/nation names attach to
  the TWENTY winners via a keys-pruned parquet read, not a join of the full
  dim.
- q9_profit_by_nation_year: part (LIKE-filtered) and supplier→nation are
  broadcast maps built once per actor from ray.put refs; the output domain
  (nation × year) is bounded, so the built-in groupby().aggregate is the
  right finisher. Profit arithmetic is integer end-to-end: per-row revenue
  cents and per-part retail cents are floored BEFORE any multiplication, so
  Ray and DuckDB agree bit-for-bit.

All arithmetic follows the house idiom: floor(x * 100 + 0.5) per ROW (not
per aggregate), CAST(... AS DOUBLE) semantics shared with the oracle, every
output column int64 (the driver hash discipline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_US = 1_000_000


def _cents(ep, disc):
    """floor(ep * (1 - disc) * 100 + 0.5) as int64 — the bit-exact per-row
    revenue quantization shared with every oracle."""
    rev = pc.multiply(ep, pc.subtract(pa.scalar(1.0), disc))
    return pc.cast(pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)), pa.int64())


# -- Q3: shipping priority ----------------------------------------------------

_Q3_CUT_US = 883_612_800_000_000  # 1998-01-01 in epoch microseconds


def q3_shipping_priority(sf_dir: str):
    """Q3 shape: orders from one market segment placed before the cutoff,
    revenue from their lines shipped after it, top 10 orders by revenue.

    The segment keyset broadcasts (1/5 of customers — on a 100-TB run this
    crosses the broadcast budget around ~10^8 keys and the filter becomes a
    semi-join on the orders side; the op keeps the broadcast path because
    the keyset is the SMALL side by construction here). lineitem⋈orders is
    a hash join on the order key; per-order revenue is a row-sized rollup →
    _bucketed_agg; sort+limit(10) stays distributed."""
    import pyarrow.parquet as pq

    keys = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filters=pc.field("c_mktsegment") == "BUILDING")
    keyset_ref = ray.put(set(keys["c_custkey"].to_pylist()))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"])

    def ofilt(t: pa.Table) -> pa.Table:
        ks = ray.get(keyset_ref)
        od = pc.cast(t["o_orderdate"], pa.int64())
        m_date = pc.less(od, pa.scalar(_Q3_CUT_US, pa.int64()))
        in_seg = pa.array([k in ks for k in t["o_custkey"].to_pylist()],
                          pa.bool_())
        keep = pc.and_(m_date, in_seg)
        return pa.table({
            "o_orderkey": pc.filter(t["o_orderkey"], keep),
            "od_us": pc.filter(od, keep),
            "o_orderpriority": pc.filter(t["o_orderpriority"], keep),
        })

    ofil = orders.map_batches(ofilt, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def lfilt(t: pa.Table) -> pa.Table:
        keep = pc.greater(pc.cast(t["l_shipdate"], pa.int64()),
                          pa.scalar(_Q3_CUT_US, pa.int64()))
        return pa.table({
            "l_orderkey": pc.filter(t["l_orderkey"], keep),
            "cents": pc.filter(_cents(t["l_extendedprice"], t["l_discount"]),
                               keep),
        })

    lfil = li.map_batches(lfilt, batch_format="pyarrow")
    j = lfil.join(ofil, join_type="inner", on=("l_orderkey",),
                  right_on=("o_orderkey",), num_partitions=8)
    agg = _bucketed_agg(j, ["l_orderkey", "od_us", "o_orderpriority"],
                        {"revenue_cents": ("cents", "sum")})
    top = agg.sort(["revenue_cents", "l_orderkey"],
                   descending=[True, False]).limit(10)
    out = top.to_pandas()
    for c in ("l_orderkey", "od_us", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out[["l_orderkey", "od_us", "o_orderpriority", "revenue_cents"]],
        preserve_index=False).replace_schema_metadata(None)


SQL_Q3_SHIPPING_PRIORITY = """
SELECT l_orderkey, epoch_us(o_orderdate) AS od_us, o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


# -- Q10: returned items ------------------------------------------------------

_Q10_LO_US = 915_148_800_000_000   # 1999-01-01
_Q10_HI_US = 930_787_200_000_000   # 1999-07-01


def q10_returned_items(sf_dir: str):
    """Q10 shape: revenue lost to returns per customer over one half-year,
    top 20 customers with name/nation attached. The fact side is filtered
    (returnflag R + ship window) before the hash join; per-customer revenue
    is row-sized → _bucketed_agg; the dim attach happens AFTER limit(20) via
    a keys-pruned read — the full customer table never moves."""
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_shipdate",
                        "l_extendedprice", "l_discount"])

    def lfilt(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        keep = pc.and_(
            pc.equal(t["l_returnflag"], "R"),
            pc.and_(pc.greater_equal(ship, pa.scalar(_Q10_LO_US, pa.int64())),
                    pc.less(ship, pa.scalar(_Q10_HI_US, pa.int64()))))
        return pa.table({
            "l_orderkey": pc.filter(t["l_orderkey"], keep),
            "cents": pc.filter(_cents(t["l_extendedprice"], t["l_discount"]),
                               keep),
        })

    lfil = li.map_batches(lfilt, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = lfil.join(orders, join_type="inner", on=("l_orderkey",),
                  right_on=("o_orderkey",), num_partitions=8)
    agg = _bucketed_agg(j, ["o_custkey"], {"revenue_cents": ("cents", "sum")})
    top = agg.sort(["revenue_cents", "o_custkey"],
                   descending=[True, False]).limit(20).to_pandas()

    import pyarrow.parquet as pq

    want = set(int(k) for k in top["o_custkey"])
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
        filters=pc.field("c_custkey").isin(list(want)))
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    cdf = cust.to_pandas().merge(nat.to_pandas(), left_on="c_nationkey",
                                 right_on="n_nationkey")
    cdf["acctbal_cents"] = np.floor(
        cdf["c_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    out = top.merge(cdf[["c_custkey", "c_name", "n_name", "acctbal_cents"]],
                    left_on="o_custkey", right_on="c_custkey")
    out = out.rename(columns={"o_custkey": "custkey"})[
        ["custkey", "c_name", "n_name", "acctbal_cents", "revenue_cents"]]
    out = out.sort_values(["revenue_cents", "custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    for c in ("custkey", "acctbal_cents", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_Q10_RETURNED_ITEMS = """
SELECT o_custkey AS custkey, c_name, n_name,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate <  TIMESTAMP '1999-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_cents DESC, custkey
LIMIT 20
"""


# -- Q9: product profit by nation × ship year ---------------------------------


def q9_profit_by_nation_year(sf_dir: str):
    """Q9 shape: profit (revenue minus retail-priced cost) for parts whose
    name matches, rolled up by supplier nation × ship year. Both dims
    broadcast as ray.put maps fetched once per task (part→retail_cents,
    supplier→nation name); the output domain is bounded (nations × years) so
    the built-in groupby aggregate finishes. Cost arithmetic floors the
    retail price to cents per PART before multiplying by the integer
    quantity — exact integers both engines."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_retailprice"])
    mask = pc.match_substring(part["p_name"], "red")
    part = part.filter(mask)
    retail_cents = dict(zip(
        part["p_partkey"].to_pylist(),
        np.floor(np.asarray(part["p_retailprice"].to_numpy(
            zero_copy_only=False)) * 100.0 + 0.5).astype(np.int64).tolist()))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    snat = dict(zip(sup["s_suppkey"],
                    sup.merge(nat, left_on="s_nationkey",
                              right_on="n_nationkey")["n_name"]))
    part_ref, snat_ref = ray.put(retail_cents), ray.put(snat)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate",
                        "l_extendedprice", "l_discount"])

    def profit(df: pd.DataFrame) -> pd.DataFrame:
        pmap, smap = ray.get(part_ref), ray.get(snat_ref)
        cost = df["l_partkey"].map(pmap)
        keep = cost.notna()
        d = df[keep]
        cost = cost[keep].astype(np.int64)
        rev = np.floor(d["l_extendedprice"].to_numpy()
                       * (1.0 - d["l_discount"].to_numpy()) * 100.0
                       + 0.5).astype(np.int64)
        qty = d["l_quantity"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "n_name": d["l_suppkey"].map(smap),
            "yr": d["l_shipdate"].astype("datetime64[us]").dt.year
                    .astype(np.int64),
            "profit_cents": rev - cost.to_numpy() * qty,
        })

    out = (
        li.map_batches(_pd_arrow(profit), batch_format="pandas")
        .groupby(["n_name", "yr"])
        .aggregate(Sum("profit_cents", alias_name="profit_cents"),
                   Count(alias_name="n_lines"))
        .to_pandas()
        .sort_values(["n_name", "yr"]).reset_index(drop=True)
    )
    for c in ("yr", "profit_cents", "n_lines"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_Q9_PROFIT = """
SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS yr,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)
                - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


TPCHX_REGISTRY = {
    "q3_shipping_priority": (q3_shipping_priority, SQL_Q3_SHIPPING_PRIORITY),
    "q10_returned_items": (q10_returned_items, SQL_Q10_RETURNED_ITEMS),
    "q9_profit_by_nation_year": (q9_profit_by_nation_year, SQL_Q9_PROFIT),
}
