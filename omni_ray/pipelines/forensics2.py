"""Operator batch 57 — second-order forensics, dead stock and relative
dispersion.

Reference anchors: none in the reference; these add:

- benford2_audit: the SECOND-digit Benford census of purchase cents —
  expected shares p(d) = Σ_{d1=1..9} log10(1 + 1/(10·d1 + d)) as shared
  integer-ppm literals; the second digit is the harder test to fake and
  the standard follow-up when the first-digit screen passes.
- dead_stock_census: per part brand, parts with NO lineitem in the
  second shipdate half — the dead-stock share behind every inventory
  writedown.
- value_cv_by_priority: coefficient of variation of order totals per
  priority — cv_milli = 1000·isqrt(n·Σx² − (Σx)²) // Σx (exact integer
  sqrt, the shared one-step-corrected convention); relative dispersion
  comparable across priorities with different scales.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .queries import _pd_arrow, _read

# second-digit Benford expected shares in ppm, d = 0..9 — shared literals
_BENFORD2_PPM = [
    round(sum(math.log10(1 + 1 / (10 * d1 + d)) for d1 in range(1, 10))
          * 1_000_000)
    for d in range(10)]


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# benford2_audit
# ---------------------------------------------------------------------------


def benford2_audit(sf_dir: str):
    """Second-digit Benford: for purchase cents with ≥ 2 digits, the
    observed count of each second digit 0..9 vs the shared expected-ppm
    literals, with the signed gap.

    Scale shape: vectorized digit extraction; one bounded 10-key
    groupby."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def digits(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        c = _cents(t["value"].to_numpy())
        c = c[c >= 10]
        while (c >= 100).any():
            c = np.where(c >= 100, c // 10, c)
        return pa.table({"digit": pa.array(c % 10, pa.int64())})

    obs = (
        ev.map_batches(digits, batch_format="pyarrow")
        .groupby("digit").aggregate(Count(alias_name="obs"))
        .to_pandas()
    )
    total = int(obs["obs"].sum())
    spine = pd.DataFrame({"digit": np.arange(10, dtype=np.int64)})
    out = spine.merge(obs, on="digit", how="left").fillna(0)
    out["obs"] = out["obs"].astype("int64")
    out["obs_ppm"] = out["obs"] * 1_000_000 // total if total else 0
    out["exp_ppm"] = np.array(_BENFORD2_PPM, np.int64)
    out["gap_ppm"] = out["obs_ppm"] - out["exp_ppm"]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


def _benford2_sql() -> str:
    exp_vals = ", ".join(f"({d}, {p})"
                         for d, p in enumerate(_BENFORD2_PPM))
    return f"""
WITH exp(digit, exp_ppm) AS (VALUES {exp_vals}),
c AS (
  SELECT CAST(substr(CAST(CAST(floor(value*100 + 0.5) AS BIGINT)
                          AS VARCHAR), 2, 1) AS BIGINT) AS digit
  FROM events
  WHERE event_type = 'purchase' AND floor(value*100 + 0.5) >= 10
), o AS (
  SELECT digit, count(*) AS obs FROM c GROUP BY digit
), n AS (SELECT count(*) AS t FROM c)
SELECT CAST(exp.digit AS BIGINT) AS digit,
       CAST(coalesce(o.obs, 0) AS BIGINT) AS obs,
       CAST(coalesce(o.obs, 0) * 1000000 // (SELECT t FROM n)
            AS BIGINT) AS obs_ppm,
       CAST(exp_ppm AS BIGINT) AS exp_ppm,
       CAST(coalesce(o.obs, 0) * 1000000 // (SELECT t FROM n) - exp_ppm
            AS BIGINT) AS gap_ppm
FROM exp LEFT JOIN o USING (digit) ORDER BY exp.digit
"""


SQL_BENFORD2_AUDIT = _benford2_sql()


# ---------------------------------------------------------------------------
# dead_stock_census
# ---------------------------------------------------------------------------


def dead_stock_census(sf_dir: str):
    """Dead stock per brand: parts with no lineitem shipping in the
    SECOND half of the shipdate range (mid = (lo+hi)//2, dead ⟺ last
    shipment ≤ mid; parts with no lineitems at all also count). Per
    brand: parts, dead parts, dead ppm.

    Scale shape: the part→brand dimension broadcasts; per-part last
    shipdate via ONE partkey-bucketed max fold; the census is a bounded
    brand groupby against the broadcast brand part-counts."""
    import pyarrow.parquet as pq
    import ray

    part_tbl = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_brand"])
    pmap = dict(zip(part_tbl.column("p_partkey").to_pylist(),
                    part_tbl.column("p_brand").to_pylist()))
    brand_total = pd.Series(list(pmap.values())).value_counts()
    ref = ray.put(pmap)

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_shipdate"])
    agg = li.aggregate(Min("l_shipdate"), Max("l_shipdate")) or {}
    lo = int(pd.Timestamp(agg["min(l_shipdate)"]).value // 1000)
    hi = int(pd.Timestamp(agg["max(l_shipdate)"]).value // 1000)
    mid = (lo + hi) // 2

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
        return pa.table({
            "k": t["l_partkey"],
            "late": pa.array((us > mid).astype(np.int64), pa.int64()),
        })

    from .queries import _bucketed_agg
    per_part = _bucketed_agg(li.map_batches(prep, batch_format="pyarrow"),
                             ["k"], {"late": ("late", "max")})

    def census(t: pa.Table) -> pa.Table:
        mp = ray.get(ref)
        keys = t["k"].to_numpy()
        late = np.asarray(t["late"].to_numpy(), np.int64)
        brands = [mp[int(k)] for k in keys]
        df = pd.DataFrame({"brand": brands, "alive": late})
        g = df.groupby("brand", sort=False).agg(
            sold=("alive", "size"), alive=("alive", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    sold = (
        per_part.map_batches(census, batch_format="pyarrow")
        .groupby("brand").aggregate(Sum("sold", alias_name="sold"),
                                    Sum("alive", alias_name="alive"))
        .to_pandas().set_index("brand")
    )
    rows = []
    for brand in sorted(brand_total.index):
        total = int(brand_total[brand])
        alive = int(sold["alive"].get(brand, 0))
        dead = total - alive
        rows.append((brand, total, dead,
                     dead * 1_000_000 // total if total else 0))
    out = pd.DataFrame(rows, columns=["brand", "n_parts", "n_dead",
                                      "dead_ppm"])
    for c in ("n_parts", "n_dead", "dead_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DEAD_STOCK_CENSUS = """
WITH lims AS (
  SELECT (epoch_us(min(l_shipdate)) + epoch_us(max(l_shipdate))) // 2
           AS mid
  FROM lineitem
), alive AS (
  SELECT DISTINCT l_partkey FROM lineitem
  WHERE epoch_us(l_shipdate) > (SELECT mid FROM lims)
), census AS (
  SELECT p_brand AS brand, count(*) AS n_parts,
         sum(CASE WHEN alive.l_partkey IS NULL THEN 1 ELSE 0 END)
           AS n_dead
  FROM part LEFT JOIN alive ON alive.l_partkey = p_partkey
  GROUP BY 1
)
SELECT brand, CAST(n_parts AS BIGINT) AS n_parts,
       CAST(n_dead AS BIGINT) AS n_dead,
       CAST(n_dead * 1000000 // n_parts AS BIGINT) AS dead_ppm
FROM census ORDER BY brand
"""


# ---------------------------------------------------------------------------
# value_cv_by_priority
# ---------------------------------------------------------------------------


def value_cv_by_priority(sf_dir: str):
    """Relative dispersion of order totals per priority: cv_milli =
    1000·isqrt(n·Σx² − (Σx)²) // Σx over total-price cents (population
    convention, exact isqrt) — comparable across priorities whatever
    their scale.

    Scale shape: one bounded priority groupby over per-block moment
    partials."""
    orders = _read(sf_dir, "orders", columns=["o_orderpriority",
                                              "o_totalprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["o_totalprice"].to_numpy())
        p = pd.DataFrame({"prio": df["o_orderpriority"].to_numpy(),
                          "n": 1, "s": c,
                          "ss": c.astype(object) * c.astype(object)})
        g = p.groupby("prio", sort=False).sum().reset_index()
        g["ss"] = g["ss"].astype("int64")
        return g

    m = (
        orders.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("prio").aggregate(Sum("n", alias_name="n"),
                                   Sum("s", alias_name="s"),
                                   Sum("ss", alias_name="ss"))
        .to_pandas().sort_values("prio").reset_index(drop=True)
    )
    rows = []
    for _, r in m.iterrows():
        n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        var_sc = n * ss - s * s
        cv = 1000 * math.isqrt(var_sc) // s if s else 0
        rows.append((r["prio"], n, cv))
    out = pd.DataFrame(rows, columns=["prio", "n_orders", "cv_milli"])
    for c in ("n_orders", "cv_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_VALUE_CV_BY_PRIORITY = """
WITH m AS (
  SELECT o_orderpriority AS prio, count(*) AS n,
         sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS s,
         sum(CAST(floor(o_totalprice*100 + 0.5) AS HUGEINT)
             * CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS ss
  FROM orders GROUP BY 1
), fs AS (
  SELECT prio, n, s, n * ss - CAST(s AS HUGEINT) * s AS v,
         CAST(floor(sqrt(CAST(n * ss - CAST(s AS HUGEINT) * s
                              AS DOUBLE))) AS HUGEINT) AS f
  FROM m
), isq AS (
  SELECT prio, n, s,
         f - (CASE WHEN f * f > v THEN 1 ELSE 0 END)
           + (CASE WHEN (f + 1) * (f + 1) <= v THEN 1 ELSE 0 END) AS r
  FROM fs
)
SELECT prio, CAST(n AS BIGINT) AS n_orders,
       CAST(CASE WHEN s = 0 THEN 0 ELSE 1000 * r // s END AS BIGINT)
         AS cv_milli
FROM isq ORDER BY prio
"""


FORENSICS2_REGISTRY = {
    "benford2_audit": (benford2_audit, SQL_BENFORD2_AUDIT),
    "dead_stock_census": (dead_stock_census, SQL_DEAD_STOCK_CENSUS),
    "value_cv_by_priority": (value_cv_by_priority, SQL_VALUE_CV_BY_PRIORITY),
}
