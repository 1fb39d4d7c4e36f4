"""Operator batch 45 — bit-pattern cardinality sketches, cache capacity
planning, join-size estimation error and checksum validity.

Reference anchors: none in the reference; these add:

- fm_distinct_audit: the Flajolet–Martin bit-pattern distinct sketch —
  8 salted md5 counters, each tracking the maximum trailing-zero run;
  est = 2^(ΣR // 8) (the documented integer convention) vs the exact
  bucketed distinct count. The historical ancestor of the suite's
  HLL/KMV estimators, with its characteristic power-of-two coarseness.
- static_cache_hit_audit: optimal STATIC cache planning — the hit rate
  of pinning the top-16/64/256 users by event frequency (the upper
  bound for any static placement; an LRU simulation is inherently
  sequential, this is the distributable planning read).
- join_estimate_audit: the planner-estimation error demo — the
  256-hash-bucket histogram product estimate of |orders ⋈ customer| vs
  the exact equi-join size; bucket products over-estimate whenever
  distinct values share buckets.
- luhn_validity_rate: the Luhn mod-10 checksum pass rate of user_ids —
  the card-number-style validity screen, digit arithmetic only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_FM_COUNTERS = 8
_CACHE_SIZES = (16, 64, 256)
_JE_BUCKETS = 256


# ---------------------------------------------------------------------------
# fm_distinct_audit
# ---------------------------------------------------------------------------


def fm_distinct_audit(sf_dir: str):
    """Flajolet–Martin distinct estimate of the user_id stream: for each
    of 8 salted 60-bit md5 hashes, R_c = 1 + the maximum trailing-zero
    run observed; est = 2^(ΣR // 8); reported against the exact distinct
    count with the signed error in ppm.

    Scale shape: per-block partial maxima fold through one bounded
    aggregate (max is merge-associative); the exact side is the usual
    bucketed distinct fold."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        uids = np.unique(np.asarray(t["user_id"].to_numpy(), np.int64))
        cols = {}
        for c in range(_FM_COUNTERS):
            best = 0
            for u in uids:
                h = int(hashlib.md5(f"{c}:{u}".encode()).hexdigest()[:15],
                        16)
                tz = (h & -h).bit_length() - 1 if h else 60
                best = max(best, tz + 1)
            cols[f"r{c}"] = [best]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .aggregate(*[Max(f"r{c}", alias_name=f"r{c}")
                     for c in range(_FM_COUNTERS)]) or {}
    rs = [int(agg.get(f"r{c}") or 0) for c in range(_FM_COUNTERS)]
    est = 2 ** (sum(rs) // _FM_COUNTERS)

    def dist(t: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(t["user_id"].to_numpy(), np.int64))
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "_db": pa.array(u & 255, pa.int64())})

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g["user_id"].nunique())]})

    exact = int((
        ev.map_batches(dist, batch_format="pyarrow")
        .groupby("_db").map_groups(_pd_arrow(cnt), batch_format="pandas")
        .aggregate(Sum("n", alias_name="n")) or {}).get("n") or 0)
    out = pd.DataFrame({
        "exact_distinct": [np.int64(exact)],
        "sum_r": np.int64(sum(rs)),
        "est_distinct": np.int64(est),
        "err_ppm": np.int64((est - exact) * 1_000_000 // exact
                            if exact else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _fm_sql() -> str:
    # trailing zeros of h: h & -h isolates the lowest set bit; its
    # bit_length-1 = the run. DuckDB: use log-free bit tricks via
    # a CASE cascade over the 60-bit hash with (h & -h).
    rs = ",\n         ".join(
        f"max(CASE WHEN h{c} = 0 THEN 60 ELSE "
        f"CAST(floor(log2(h{c} & -h{c}) + 0.5) AS BIGINT) END) + 1 AS r{c}"
        for c in range(_FM_COUNTERS))
    hs = ",\n         ".join(
        f"CAST(('0x' || substr(md5('{c}:' || CAST(user_id AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) AS h{c}"
        for c in range(_FM_COUNTERS))
    sumr = " + ".join(f"r{c}" for c in range(_FM_COUNTERS))
    return f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
h AS (
  SELECT {hs}
  FROM u
), r AS (
  SELECT {rs}
  FROM h
), est AS (
  SELECT ({sumr}) AS sum_r,
         CAST(1 AS BIGINT) << (({sumr}) // {_FM_COUNTERS}) AS e
  FROM r
), ex AS (SELECT count(*) AS exact FROM u)
SELECT CAST((SELECT exact FROM ex) AS BIGINT) AS exact_distinct,
       CAST(sum_r AS BIGINT) AS sum_r,
       CAST(e AS BIGINT) AS est_distinct,
       CAST((e - (SELECT exact FROM ex)) * 1000000
            // (SELECT exact FROM ex) AS BIGINT) AS err_ppm
FROM est
"""


SQL_FM_DISTINCT_AUDIT = _fm_sql()


# ---------------------------------------------------------------------------
# static_cache_hit_audit
# ---------------------------------------------------------------------------


def static_cache_hit_audit(sf_dir: str):
    """Optimal static cache planning: hit rate (ppm of events) when the
    top-16/64/256 users by event frequency are pinned (ties by smaller
    user_id) — the upper bound for any static placement; a capacity
    curve for the cache-sizing decision.

    Scale shape: per-user frequencies via ONE user-bucketed fold with
    per-bucket top-256 prune; the hit mass per capacity is a driver fold
    over ≤ buckets×256 survivors."""
    ev = _read(sf_dir, "events", columns=["user_id"])
    freq = _bucketed_agg(ev, ["user_id"], {"f": ("user_id", "count")})

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["f", "user_id"],
                              ascending=[False, True]).head(
            max(_CACHE_SIZES))

    top = (
        freq.map_batches(_pd_arrow(prune), batch_format="pandas")
        .to_pandas()
        .sort_values(["f", "user_id"], ascending=[False, True])
        .head(max(_CACHE_SIZES))
    )
    total = ev.count()
    rows = []
    for k in _CACHE_SIZES:
        mass = int(top.head(k)["f"].sum())
        rows.append((k, mass, mass * 1_000_000 // total if total else 0))
    out = pd.DataFrame(rows, columns=["capacity", "hit_events",
                                      "hit_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _cache_sql() -> str:
    arms = " UNION ALL ".join(f"SELECT {k} AS capacity" for k
                              in _CACHE_SIZES)
    return f"""
WITH freq AS (
  SELECT user_id, count(*) AS f FROM events GROUP BY 1
), ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, user_id) AS rn FROM freq
), caps AS ({arms}),
tot AS (SELECT count(*) AS n FROM events)
SELECT CAST(c.capacity AS BIGINT) AS capacity,
       CAST((SELECT coalesce(sum(f), 0) FROM ranked
             WHERE rn <= c.capacity) AS BIGINT) AS hit_events,
       CAST((SELECT coalesce(sum(f), 0) FROM ranked
             WHERE rn <= c.capacity) * 1000000
            // (SELECT n FROM tot) AS BIGINT) AS hit_ppm
FROM caps c ORDER BY c.capacity
"""


SQL_STATIC_CACHE_HIT_AUDIT = _cache_sql()


# ---------------------------------------------------------------------------
# join_estimate_audit
# ---------------------------------------------------------------------------


def join_estimate_audit(sf_dir: str):
    """Planner-estimation error demo: |orders ⋈ customer on custkey|
    estimated from 256-hash-bucket histograms (Σ over buckets of
    count_a·count_b) vs the exact equi-join size (Σ over VALUES of
    a_v·b_v). Bucket products over-estimate whenever distinct keys share
    a bucket — the error every histogram-based planner carries.

    Scale shape: two bounded bucket histograms for the estimate; the
    exact size via ONE custkey-bucketed co-fold of per-side counts —
    the join itself is never materialized."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def hist(ds, col):
        def prep(t: pa.Table) -> pa.Table:
            v = np.asarray(t[col].to_numpy(), np.int64) % _JE_BUCKETS
            b, c = np.unique(v, return_counts=True)
            return pa.table({"b": pa.array(b, pa.int64()),
                             "c": pa.array(c.astype(np.int64), pa.int64())})

        h = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("b").sum("c").to_pandas())
        h.columns = ["b", "c"]
        arr = np.zeros(_JE_BUCKETS, np.int64)
        arr[h["b"].to_numpy(np.int64)] = h["c"].to_numpy(np.int64)
        return arr

    ha, hb = hist(orders, "o_custkey"), hist(cust, "c_custkey")
    est = int((ha.astype(object) * hb.astype(object)).sum())

    def oprep(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["o_custkey"],
                         "a": pa.array(np.ones(t.num_rows, np.int64)),
                         "b2": pa.array(np.zeros(t.num_rows, np.int64))})

    def cprep(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["c_custkey"],
                         "a": pa.array(np.zeros(t.num_rows, np.int64)),
                         "b2": pa.array(np.ones(t.num_rows, np.int64))})

    both = orders.map_batches(oprep, batch_format="pyarrow") \
        .union(cust.map_batches(cprep, batch_format="pyarrow"))
    per_key = _bucketed_agg(both, ["k"], {"a": ("a", "sum"),
                                          "b2": ("b2", "sum")})

    def prod(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(), np.int64).astype(object)
        b = np.asarray(t["b2"].to_numpy(), np.int64).astype(object)
        return pa.table({"x": pa.array([int((a * b).sum())], pa.int64())})

    exact = int((per_key.map_batches(prod, batch_format="pyarrow")
                 .aggregate(Sum("x", alias_name="x")) or {})
                .get("x") or 0)
    out = pd.DataFrame({
        "exact_join_rows": [np.int64(exact)],
        "bucket_estimate": np.int64(est),
        "over_ppm": np.int64((est - exact) * 1_000_000 // exact
                             if exact else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_JOIN_ESTIMATE_AUDIT = f"""
WITH ha AS (
  SELECT o_custkey % {_JE_BUCKETS} AS b, count(*) AS c
  FROM orders GROUP BY 1
), hb AS (
  SELECT c_custkey % {_JE_BUCKETS} AS b, count(*) AS c
  FROM customer GROUP BY 1
), est AS (
  SELECT sum(CAST(ha.c AS HUGEINT) * hb.c) AS e
  FROM ha JOIN hb USING (b)
), exact AS (
  SELECT sum(CAST(a.c AS HUGEINT) * b.c) AS x
  FROM (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1) a
  JOIN (SELECT c_custkey AS k, count(*) AS c FROM customer GROUP BY 1) b
    USING (k)
)
SELECT CAST((SELECT x FROM exact) AS BIGINT) AS exact_join_rows,
       CAST((SELECT e FROM est) AS BIGINT) AS bucket_estimate,
       CAST(((SELECT e FROM est) - (SELECT x FROM exact)) * 1000000
            // (SELECT x FROM exact) AS BIGINT) AS over_ppm
"""


# ---------------------------------------------------------------------------
# luhn_validity_rate
# ---------------------------------------------------------------------------


def luhn_validity_rate(sf_dir: str):
    """Luhn mod-10 checksum pass rate over DISTINCT user_ids (decimal
    digits, rightmost undoubled — the card-number convention): ids
    checked, ids passing, rate ppm. A uniformly random id pool passes at
    ≈ 10%.

    Scale shape: per-block distinct ids validate vectorized; counts fold
    through the user-bucketed distinct machinery."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def luhn_ok(u: int) -> int:
        s, dbl = 0, False
        while u > 0:
            d = u % 10
            u //= 10
            if dbl:
                d *= 2
                if d > 9:
                    d -= 9
            s += d
            dbl = not dbl
        return 1 if s % 10 == 0 else 0

    def dist(t: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(t["user_id"].to_numpy(), np.int64))
        ok = np.array([luhn_ok(int(v)) for v in u], np.int64)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "ok": pa.array(ok, pa.int64()),
                         "_db": pa.array(u & 255, pa.int64())})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates("user_id")
        return pd.DataFrame({"n": [np.int64(len(d))],
                             "p": np.int64(int(d["ok"].sum()))})

    agg = (
        ev.map_batches(dist, batch_format="pyarrow")
        .groupby("_db").map_groups(_pd_arrow(fold), batch_format="pandas")
        .aggregate(Sum("n", alias_name="n"), Sum("p", alias_name="p"))
        or {})
    n, p = int(agg.get("n") or 0), int(agg.get("p") or 0)
    out = pd.DataFrame({
        "n_ids": [np.int64(n)], "n_pass": np.int64(p),
        "pass_ppm": np.int64(p * 1_000_000 // n if n else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LUHN_VALIDITY_RATE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
d AS (
  SELECT user_id, CAST(user_id AS VARCHAR) AS s FROM u
), digits AS (
  SELECT user_id,
         list_sum(list_transform(generate_series(1, length(s)),
           i -> CASE
             WHEN (length(s) - i) % 2 = 1 THEN
               CASE WHEN 2 * CAST(substr(s, i, 1) AS BIGINT) > 9
                    THEN 2 * CAST(substr(s, i, 1) AS BIGINT) - 9
                    ELSE 2 * CAST(substr(s, i, 1) AS BIGINT) END
             ELSE CAST(substr(s, i, 1) AS BIGINT) END)) AS checksum
  FROM d
), v AS (
  SELECT count(*) AS n,
         sum(CASE WHEN checksum % 10 = 0 THEN 1 ELSE 0 END) AS p
  FROM digits
)
SELECT CAST(n AS BIGINT) AS n_ids, CAST(p AS BIGINT) AS n_pass,
       CAST(p * 1000000 // n AS BIGINT) AS pass_ppm
FROM v
"""


ESTOPS_REGISTRY = {
    "fm_distinct_audit": (fm_distinct_audit, SQL_FM_DISTINCT_AUDIT),
    "static_cache_hit_audit": (static_cache_hit_audit,
                               SQL_STATIC_CACHE_HIT_AUDIT),
    "join_estimate_audit": (join_estimate_audit, SQL_JOIN_ESTIMATE_AUDIT),
    "luhn_validity_rate": (luhn_validity_rate, SQL_LUHN_VALIDITY_RATE),
}
