"""Operator batch 41 — financial reconciliation, syndication detection,
sample-bias QA and order aging.

Reference anchors: the reference stores order-like rows without ever
cross-checking them; these add:

- order_reconciliation: double-entry audit — each order's stored total
  vs the sum of its lineitem prices, banded by the ratio in permille
  (the mismatch census an accounting close starts from).
- lead_para_dup_census: syndication detection — documents sharing their
  LEAD 6-word fingerprint across ≥ 2 sources (wire-service copy spread),
  censused by source-spread band.
- sample_bias_audit: QA of the house systematic sample (every 10th doc
  by doc_id): per source, sampled count vs the proportional expectation
  in milli-docs, with the signed gap — the stratification-bias read.
- order_aging_by_priority: per order priority, the exact median and p90
  age in days (vs the newest order) from bounded day-value histograms —
  the open-order aging report.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Sum

from .engineops import _DAY_US
from .queries import _bucketed_agg, _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")

_SAMPLE_EVERY = 10
_LEAD_WORDS = 6


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# order_reconciliation
# ---------------------------------------------------------------------------


def order_reconciliation(sf_dir: str):
    """Double-entry audit: per order, ratio = Σ(lineitem price cents)·
    1000 // total_cents, banded (band = min(ratio // 250, 8) — quarter-
    permille-of-4x bands); census of (band, n_orders, sum of absolute
    cent gaps). Orders with no lineitems band as -1.

    Scale shape: per-order line sums via ONE orderkey-bucketed fold; the
    orders stream joins those sums by a second bucketed co-fold; the
    census is a bounded band groupby."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey",
                                            "l_extendedprice"])

    def lprep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["l_orderkey"],
            "lc": pa.array(_cents(t["l_extendedprice"].to_numpy()),
                           pa.int64()),
        })

    lsum = _bucketed_agg(li.map_batches(lprep, batch_format="pyarrow"),
                         ["k"], {"lc": ("lc", "sum")})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def oprep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["o_orderkey"],
            "oc": pa.array(_cents(t["o_totalprice"].to_numpy()), pa.int64()),
            "lc": pa.array(np.zeros(t.num_rows, np.int64)),
        })

    def lrows(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["k"],
            "oc": pa.array(np.zeros(t.num_rows, np.int64)),
            "lc": t["lc"],
        })

    both = orders.map_batches(oprep, batch_format="pyarrow") \
        .union(lsum.map_batches(lrows, batch_format="pyarrow"))
    merged = _bucketed_agg(both, ["k"], {"oc": ("oc", "sum"),
                                         "lc": ("lc", "sum")})

    def bandit(t: pa.Table) -> pa.Table:
        oc = np.asarray(t["oc"].to_numpy(), np.int64)
        lc = np.asarray(t["lc"].to_numpy(), np.int64)
        m = oc > 0  # only true orders (lineitems without orders excluded)
        oc, lc = oc[m], lc[m]
        ratio = lc * 1000 // oc
        band = np.where(lc == 0, -1, np.minimum(ratio // 250, 8))
        return pa.table({
            "band": pa.array(band, pa.int64()),
            "one": pa.array(np.ones(len(band), np.int64)),
            "gap": pa.array(np.abs(lc - oc), pa.int64()),
        })

    out = (
        merged.map_batches(bandit, batch_format="pyarrow")
        .groupby("band").aggregate(Sum("one", alias_name="n_orders"),
                                   Sum("gap", alias_name="abs_gap_cents"))
        .to_pandas().sort_values("band").reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ORDER_RECONCILIATION = """
WITH ls AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS lc
  FROM lineitem GROUP BY 1
), j AS (
  SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS oc,
         coalesce(ls.lc, 0) AS lc
  FROM orders LEFT JOIN ls ON l_orderkey = o_orderkey
), banded AS (
  SELECT CASE WHEN lc = 0 THEN -1
              ELSE least(lc * 1000 // oc // 250, 8) END AS band,
         abs(lc - oc) AS gap
  FROM j
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(gap) AS BIGINT) AS abs_gap_cents
FROM banded GROUP BY band ORDER BY band
"""


# ---------------------------------------------------------------------------
# lead_para_dup_census
# ---------------------------------------------------------------------------


def lead_para_dup_census(sf_dir: str):
    """Syndication detection: the md5 fingerprint of each document's
    LEAD 6 words; fingerprints carried by ≥ 2 distinct sources, censused
    by source-spread (2, 3, 4+ sources). Docs under 6 words are
    ineligible.

    Scale shape: (fingerprint, source) pairs dedup block-locally and
    fold through ONE fingerprint-bucketed shuffle; the census is
    bounded."""
    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def leads(df: pd.DataFrame) -> pd.DataFrame:
        fp_l, src_l = [], []
        for src, tx in zip(df["source"], df["text"]):
            ws = _WORD_RE.findall((tx or "").lower())
            if len(ws) < _LEAD_WORDS:
                continue
            fp_l.append(int(hashlib.md5(
                " ".join(ws[:_LEAD_WORDS]).encode()).hexdigest()[:15], 16))
            src_l.append(src)
        p = pd.DataFrame({"fp": pd.array(fp_l, "int64"),
                          "source": src_l}).drop_duplicates()
        p["_kb"] = (p["fp"].to_numpy(np.int64) & 255).astype(np.int64)
        return p

    def census(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["fp", "source"])
        spread = d.groupby("fp", sort=False)["source"].nunique()
        spread = spread[spread >= 2]
        band = np.minimum(spread.to_numpy(np.int64), 4)
        b, c = np.unique(band, return_counts=True)
        return pd.DataFrame({"spread_band": b,
                             "n_fps": c.astype(np.int64)})

    got = (
        ds.map_batches(_pd_arrow(leads), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(census), batch_format="pandas")
        .groupby("spread_band").sum("n_fps")
        .to_pandas()
    )
    got.columns = ["spread_band", "n_fps"]
    spine = pd.DataFrame({"spread_band": np.array([2, 3, 4], np.int64)})
    out = spine.merge(got, on="spread_band", how="left").fillna(0)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LEAD_PARA_DUP_CENSUS = f"""
WITH w AS (
  SELECT source,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), fp AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(ws[1] || ' ' || ws[2] || ' ' || ws[3] ||
               ' ' || ws[4] || ' ' || ws[5] || ' ' || ws[6]), 1, 15))
              AS BIGINT) AS fp,
         source
  FROM w WHERE len(ws) >= {_LEAD_WORDS}
), spread AS (
  SELECT fp, count(DISTINCT source) AS s FROM fp GROUP BY 1
  HAVING count(DISTINCT source) >= 2
), banded AS (
  SELECT least(s, 4) AS spread_band, count(*) AS n_fps
  FROM spread GROUP BY 1
), spine AS (SELECT unnest([2, 3, 4]) AS spread_band)
SELECT CAST(sp.spread_band AS BIGINT) AS spread_band,
       CAST(coalesce(b.n_fps, 0) AS BIGINT) AS n_fps
FROM spine sp LEFT JOIN banded b USING (spread_band)
ORDER BY sp.spread_band
"""


# ---------------------------------------------------------------------------
# sample_bias_audit
# ---------------------------------------------------------------------------


def sample_bias_audit(sf_dir: str):
    """Stratification QA of the house systematic sample (docs with
    doc_id % 10 = 0): per source, the sampled count, the proportional
    expectation in MILLI-docs (n_src·n_sampled·1000 // n_total) and the
    signed gap in milli — how far the cheap sample drifts from each
    stratum's true share.

    Scale shape: two bounded source groupbys (population and sample);
    the comparison runs on the bounded source table."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"]) \
        .materialize()
    pop = (ds.groupby("source").aggregate(Count(alias_name="n_src"))
           .to_pandas())

    def pick(t: pa.Table) -> pa.Table:
        m = np.asarray(t["doc_id"].to_numpy(), np.int64) \
            % _SAMPLE_EVERY == 0
        return pa.table({"source": t["source"].filter(pa.array(m))})

    samp = (ds.map_batches(pick, batch_format="pyarrow")
            .groupby("source").aggregate(Count(alias_name="n_samp"))
            .to_pandas())
    out = pop.merge(samp, on="source", how="left").fillna(0)
    n_total = int(out["n_src"].sum())
    n_sampled = int(out["n_samp"].sum())
    out["n_samp"] = out["n_samp"].astype("int64")
    out["expected_milli"] = (out["n_src"].astype("int64") * n_sampled
                             * 1000 // n_total)
    out["gap_milli"] = out["n_samp"] * 1000 - out["expected_milli"]
    out = out.sort_values("source").reset_index(drop=True)
    for c in ("n_src", "n_samp", "expected_milli", "gap_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SAMPLE_BIAS_AUDIT = f"""
WITH pop AS (
  SELECT source, count(*) AS n_src FROM documents GROUP BY 1
), samp AS (
  SELECT source, count(*) AS n_samp FROM documents
  WHERE doc_id % {_SAMPLE_EVERY} = 0 GROUP BY 1
), tot AS (
  SELECT (SELECT sum(n_src) FROM pop) AS n_total,
         (SELECT coalesce(sum(n_samp), 0) FROM samp) AS n_sampled
)
SELECT p.source, CAST(p.n_src AS BIGINT) AS n_src,
       CAST(coalesce(s.n_samp, 0) AS BIGINT) AS n_samp,
       CAST(p.n_src * (SELECT n_sampled FROM tot) * 1000
            // (SELECT n_total FROM tot) AS BIGINT) AS expected_milli,
       CAST(coalesce(s.n_samp, 0) * 1000
            - p.n_src * (SELECT n_sampled FROM tot) * 1000
              // (SELECT n_total FROM tot) AS BIGINT) AS gap_milli
FROM pop p LEFT JOIN samp s USING (source) ORDER BY p.source
"""


# ---------------------------------------------------------------------------
# order_aging_by_priority
# ---------------------------------------------------------------------------


def order_aging_by_priority(sf_dir: str):
    """Order aging per priority: age = newest-order day − order day; per
    o_orderpriority the count, exact type-1 median age and p90 age from
    the bounded (priority, age-day) histogram.

    Scale shape: one global max, one bounded (priority, age) groupby,
    rank picks from the bounded histogram — the CDF trick, no sort."""
    orders = _read(sf_dir, "orders", columns=["o_orderdate",
                                              "o_orderpriority"])
    agg = orders.aggregate(Max("o_orderdate")) or {}
    hi = int(pd.Timestamp(agg["max(o_orderdate)"]).value // 1000) // _DAY_US

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.int64()).to_numpy() // _DAY_US
        return pa.table({
            "prio": t["o_orderpriority"],
            "age": pa.array(hi - d, pa.int64()),
        })

    hist = (
        orders.map_batches(prep, batch_format="pyarrow")
        .groupby(["prio", "age"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    rows = []
    for prio, g in hist.groupby("prio"):
        g = g.sort_values("age")
        v = g["age"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        med = int(v[np.searchsorted(cum, (n + 1) // 2, side="left")])
        p90 = int(v[np.searchsorted(cum, (9 * n + 9) // 10, side="left")])
        rows.append((prio, n, med, p90))
    out = pd.DataFrame(rows, columns=["prio", "n_orders", "median_age_d",
                                      "p90_age_d"]) \
        .sort_values("prio").reset_index(drop=True)
    for c in ("n_orders", "median_age_d", "p90_age_d"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ORDER_AGING_BY_PRIORITY = f"""
WITH hi AS (
  SELECT epoch_us(max(o_orderdate)) // {_DAY_US} AS h FROM orders
), a AS (
  SELECT o_orderpriority AS prio,
         (SELECT h FROM hi) - epoch_us(o_orderdate) // {_DAY_US} AS age
  FROM orders
), ranked AS (
  SELECT prio, age,
         row_number() OVER (PARTITION BY prio ORDER BY age) AS rn,
         count(*) OVER (PARTITION BY prio) AS n
  FROM a
)
SELECT prio, CAST(max(n) AS BIGINT) AS n_orders,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN age END) AS BIGINT)
         AS median_age_d,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN age END) AS BIGINT)
         AS p90_age_d
FROM ranked GROUP BY prio ORDER BY prio
"""


AUDITOPS_REGISTRY = {
    "order_reconciliation": (order_reconciliation, SQL_ORDER_RECONCILIATION),
    "lead_para_dup_census": (lead_para_dup_census, SQL_LEAD_PARA_DUP_CENSUS),
    "sample_bias_audit": (sample_bias_audit, SQL_SAMPLE_BIAS_AUDIT),
    "order_aging_by_priority": (order_aging_by_priority,
                                SQL_ORDER_AGING_BY_PRIORITY),
}
