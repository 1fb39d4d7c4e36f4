"""Classic analytical shapes, second set (round 4, batch 83): Q6, Q14,
Q16, Q19 — the predicate-heavy TPC-H patterns the schema supports
directly. Each pins a different engine discipline:

- q6_forecast_revenue: the canonical triple-range scan (date year,
  discount band, quantity cap) — one filter + one global sum; the revenue
  quantization is per-ROW floor-cents (not per-aggregate), so both
  engines agree bit-for-bit.
- q14_promo_share: promo revenue share per month — two conditional sums
  in ONE pass (map-side indicator columns, the A4 pivot discipline), the
  share as integer ppm of exact cents.
- q16_parts_supplier_cnt: distinct suppliers per (brand, type, size)
  with exclusion predicates — the two-level exact-distinct shape (fine
  grain via _bucketed_agg on the row-sized (brand,type,size,supp) domain,
  bounded re-count above).
- q19_disjunctive_revenue: the OR-of-conjunctions predicate (three
  brand × size-band × quantity-band arms) — pushdown-hostile by design;
  evaluated vectorized per batch, one pass, revenue + row count per arm.

Scale shape: every op is filter→fold with at most one row-sized bucketed
fold (Q16); no sorts, no joins wider than the broadcast part map (Q19
attaches brand/size via ray.put, the Q9 discipline).
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

_Y1996_LO = 820_454_400_000_000   # 1996-01-01 epoch us
_Y1997_LO = 852_076_800_000_000   # 1997-01-01


def _cents_np(ep, disc):
    return np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)


def q6_forecast_revenue(sf_dir: str):
    li = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        us = df["l_shipdate"].astype("datetime64[us]").astype("int64")
        disc = df["l_discount"].to_numpy()
        keep = ((us >= _Y1996_LO) & (us < _Y1997_LO)
                & (disc >= 0.05) & (disc <= 0.07)
                & (df["l_quantity"].to_numpy() < 24))
        d = df[keep]
        rev = np.floor(d["l_extendedprice"].to_numpy()
                       * d["l_discount"].to_numpy() * 100.0
                       + 0.5).astype(np.int64)
        return pd.DataFrame({"n": [int(keep.sum())],
                             "rev_cents": [int(rev.sum())]})

    out = (
        li.map_batches(_pd_arrow(fold), batch_format="pandas")
        .aggregate(Sum("n", alias_name="n_rows"),
                   Sum("rev_cents", alias_name="revenue_cents"))
    ) or {}
    res = pd.DataFrame([{
        "n_rows": int(out.get("n_rows") or 0),
        "revenue_cents": int(out.get("revenue_cents") or 0),
    }]).astype("int64")
    return pa.Table.from_pandas(res, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_Q6 = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                              AS BIGINT)), 0) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q14_promo_share(sf_dir: str):
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo = set(part.filter(
        pc.equal(part["p_type"], "PROMO"))["p_partkey"].to_pylist())
    pref = ray.put(promo)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        pset = ray.get(pref)
        us = df["l_shipdate"].astype("datetime64[us]")
        month = (us.dt.year * 100 + us.dt.month).to_numpy(np.int64)
        rev = _cents_np(df["l_extendedprice"].to_numpy(),
                        df["l_discount"].to_numpy())
        is_promo = df["l_partkey"].map(lambda k: k in pset).to_numpy()
        return pd.DataFrame({
            "month": month,
            "rev": rev,
            "promo_rev": np.where(is_promo, rev, 0),
        })

    agg = (
        li.map_batches(_pd_arrow(fold), batch_format="pandas")
        .groupby("month")
        .aggregate(Sum("rev", alias_name="rev_cents"),
                   Sum("promo_rev", alias_name="promo_cents"))
        .to_pandas().sort_values("month").reset_index(drop=True)
    )
    agg["promo_ppm"] = [
        int(p) * 1_000_000 // int(r) if int(r) else 0
        for p, r in zip(agg["promo_cents"], agg["rev_cents"])]
    for c in agg.columns:
        agg[c] = agg[c].astype("int64")
    return pa.Table.from_pandas(agg, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_Q14 = """
WITH f AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS month,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev,
         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT month,
       CAST(sum(rev) AS BIGINT) AS rev_cents,
       CAST(sum(CASE WHEN is_promo = 1 THEN rev ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(CASE WHEN sum(rev) = 0 THEN 0
                 ELSE sum(CASE WHEN is_promo = 1 THEN rev ELSE 0 END)
                      * 1000000 // sum(rev) END AS BIGINT) AS promo_ppm
FROM f GROUP BY 1
"""


def q16_parts_supplier_cnt(sf_dir: str):
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
    # exclusions: one brand and one size out, TPC-H Q16 style
    keep = pc.and_(pc.not_equal(part["p_brand"], "Brand#1"),
                   pc.not_equal(part["p_size"], 1))
    part = part.filter(keep)
    pmap = {int(k): (str(b), str(t), int(s)) for k, b, t, s in zip(
        part["p_partkey"].to_pylist(), part["p_brand"].to_pylist(),
        part["p_type"].to_pylist(), part["p_size"].to_pylist())}
    pref = ray.put(pmap)

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(pref)
        rows = [(*m[int(p)], int(s)) for p, s in zip(df["l_partkey"],
                                                     df["l_suppkey"])
                if int(p) in m]
        return pd.DataFrame(rows, columns=["brand", "type", "size", "supp"]) \
            if rows else pd.DataFrame({
                "brand": pd.Series([], dtype="object"),
                "type": pd.Series([], dtype="object"),
                "size": pd.Series([], dtype="int64"),
                "supp": pd.Series([], dtype="int64")})

    fine = _bucketed_agg(
        li.map_batches(_pd_arrow(attach), batch_format="pandas"),
        ["brand", "type", "size", "supp"], {"n": ("supp", "count")})
    out = (
        fine.groupby(["brand", "type", "size"])
        .aggregate(Count(alias_name="supplier_cnt"))
        .to_pandas().sort_values(["brand", "type", "size"])
        .reset_index(drop=True)
    )
    for c in ("size", "supplier_cnt"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_Q16 = """
SELECT p_brand AS brand, p_type AS type, CAST(p_size AS BIGINT) AS size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size <> 1
GROUP BY 1, 2, 3
"""


def q19_disjunctive_revenue(sf_dir: str):
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pmap = {int(k): (str(b), int(s)) for k, b, s in zip(
        part["p_partkey"].to_pylist(), part["p_brand"].to_pylist(),
        part["p_size"].to_pylist())}
    pref = ray.put(pmap)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(pref)
        info = [m[int(p)] for p in df["l_partkey"]]
        brand = np.array([b for b, _ in info])
        size = np.array([s for _, s in info], np.int64)
        qty = df["l_quantity"].to_numpy()
        arm1 = (brand == "Brand#1") & (size <= 5) & (qty >= 1) & (qty <= 11)
        arm2 = (brand == "Brand#2") & (size <= 10) & (qty >= 10) & (qty <= 20)
        arm3 = (brand == "Brand#3") & (size <= 15) & (qty >= 20) & (qty <= 30)
        rev = _cents_np(df["l_extendedprice"].to_numpy(),
                        df["l_discount"].to_numpy())
        return pd.DataFrame({
            "arm": ["arm1", "arm2", "arm3"],
            "n": [int(arm1.sum()), int(arm2.sum()), int(arm3.sum())],
            "rev": [int(rev[arm1].sum()), int(rev[arm2].sum()),
                    int(rev[arm3].sum())],
        })

    out = (
        li.map_batches(_pd_arrow(fold), batch_format="pandas")
        .groupby("arm")
        .aggregate(Sum("n", alias_name="n_rows"),
                   Sum("rev", alias_name="revenue_cents"))
        .to_pandas().sort_values("arm").reset_index(drop=True)
    )
    for c in ("n_rows", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_Q19 = """
WITH j AS (
  SELECT p_brand AS brand, p_size AS size, l_quantity AS qty,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
), arms AS (
  SELECT 'arm1' AS arm, n, r FROM (
    SELECT count(*) AS n, coalesce(sum(rev), 0) AS r FROM j
    WHERE brand = 'Brand#1' AND size <= 5 AND qty BETWEEN 1 AND 11)
  UNION ALL
  SELECT 'arm2', n, r FROM (
    SELECT count(*) AS n, coalesce(sum(rev), 0) AS r FROM j
    WHERE brand = 'Brand#2' AND size <= 10 AND qty BETWEEN 10 AND 20)
  UNION ALL
  SELECT 'arm3', n, r FROM (
    SELECT count(*) AS n, coalesce(sum(rev), 0) AS r FROM j
    WHERE brand = 'Brand#3' AND size <= 15 AND qty BETWEEN 20 AND 30)
)
SELECT arm, CAST(n AS BIGINT) AS n_rows, CAST(r AS BIGINT) AS revenue_cents
FROM arms
"""


TPCHX2_REGISTRY = {
    "q6_forecast_revenue": (q6_forecast_revenue, SQL_Q6),
    "q14_promo_share": (q14_promo_share, SQL_Q14),
    "q16_parts_supplier_cnt": (q16_parts_supplier_cnt, SQL_Q16),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, SQL_Q19),
}
