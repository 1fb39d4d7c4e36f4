"""Classic-engine operators, round 3 batch 8: gaps-and-islands streaks,
SCD2 validity intervals, MERGE (upsert+delete) snapshot apply, correlated
aggregate filter, NTILE bucketing, and interval coalescing.

These are the remaining "every SQL engine has this" shapes a user migrating
off the reference (whose read path stops at dashboard rollups,
src/web/dashboard.py) would expect from a data-processing engine, each
pinned to an exhaustive DuckDB window-function oracle and each expressed in
the repo's scale idiom:

- streak_longest_per_user: gaps-and-islands. Two-level distinct (block
  combiner) -> per-user hash bucket -> ONE vectorized pandas pass per
  bucket (cumcount island ids). Raw events never cross the shuffle twice.
- scd2_intervals: the slowly-changing-dimension type-2 history build
  (change-compress a keyed event log into [valid_from, valid_to) rows).
  Per-user bucket, sort once, shift/compare vectorized — the same shape
  as moving_sum3_per_user, no per-key Python.
- merge_upsert_snapshot: MERGE INTO semantics — a base snapshot plus a
  change log with inserts, updates and deletes, last-writer-wins by
  (seq, seq2). Block-local keep-last combiner BEFORE the key shuffle, so
  the exchange carries one row per (block, key), not the whole log.
- above_nation_avg: the correlated-subquery filter (customers whose spend
  beats their nation's average). Integer cross-multiplication
  (total*count > sum) replaces a float AVG so both engines agree
  bit-for-bit; the nation side is a bounded-domain aggregate broadcast
  back as two tiny arrays.
- ntile_day_quartiles: NTILE(4) per day — bounded partition domain, so
  groupby(day).map_groups with an arange-derived tile id (no rank loop).
- interval_coalesce: overlapping-interval union per user (the DVR/uptime
  merge): cummax-of-end island detection, vectorized per user bucket.

All arithmetic is integer (cents, epoch-us, day ordinals) end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Sum

from .queries import _read

_DAY_US = 86_400_000_000
_SESSION_US = 1_800_000_000  # 30-minute interval length (mirrored in SQL)


def _cents(col):
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


# -- streak_longest_per_user --------------------------------------------------


def streak_longest_per_user(sf_dir: str):
    """Gaps-and-islands: longest run of CONSECUTIVE active days per user,
    plus the user's total distinct active days. island = day - rank(day)
    within user — constant across a consecutive run, so a groupby size
    gives run lengths without any self-join.

    Scale shape: block-local (user, day) dedup is the combiner (each block
    emits each pair once), the hash bucket co-locates a user's days, and
    the island arithmetic is one vectorized pass per bucket. The shuffle
    carries (user, day) pairs — already reduced — never raw events."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US)
        out = pa.table({"user_id": t["user_id"], "day": day})
        # block-local distinct: the combiner
        df = out.to_pandas().drop_duplicates()
        df["_ub"] = (df["user_id"].to_numpy() & 255).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        isl = g["day"].to_numpy() - g.groupby("user_id", sort=False).cumcount().to_numpy()
        runs = (
            pd.DataFrame({"user_id": g["user_id"].to_numpy(), "isl": isl})
            .groupby(["user_id", "isl"], sort=False).size().reset_index(name="len")
        )
        uu = runs.groupby("user_id", sort=False)["len"]
        return pd.DataFrame({
            "user_id": uu.max().index.to_numpy(),
            "longest_streak": uu.max().to_numpy().astype(np.int64),
            "n_active_days": uu.sum().to_numpy().astype(np.int64),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ub").map_groups(islands, batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


SQL_STREAK_LONGEST_PER_USER = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), r AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS isl
  FROM d
), s AS (
  SELECT user_id, isl, count(*) AS len FROM r GROUP BY 1, 2
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM s GROUP BY user_id
"""


# -- scd2_intervals -----------------------------------------------------------


def scd2_intervals(sf_dir: str):
    """SCD type-2 history build: compress each user's event_type stream
    (ordered by ts, event_id) into change rows, each valid from its own
    timestamp until the NEXT change (-1 = still current). The dimension-
    table history every warehouse load needs; here the 'attribute' is
    event_type and the change log is the events table.

    Scale shape: one hash bucket co-locates a user's rows; inside the
    bucket one sort + two vectorized groupby shifts (prev for change
    detection, next for valid_to). No per-key Python, no self-join."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
            "_ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def compress(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        prev = grp["event_type"].shift(1)
        chg = g[(prev.isna() | (prev != g["event_type"])).to_numpy()].copy()
        nxt = chg.groupby("user_id", sort=False)["ts_us"].shift(-1)
        return pd.DataFrame({
            "user_id": chg["user_id"].to_numpy(),
            "event_type": chg["event_type"].to_numpy(),
            "valid_from_us": chg["ts_us"].to_numpy().astype(np.int64),
            "valid_to_us": nxt.fillna(-1).to_numpy().astype(np.int64),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ub").map_groups(compress, batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


SQL_SCD2_INTERVALS = """
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), c AS (
  SELECT user_id, event_type, ts_us, event_id
  FROM o WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, ts_us AS valid_from_us,
       CAST(coalesce(
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id),
         -1) AS BIGINT) AS valid_to_us
FROM c
"""


# -- merge_upsert_snapshot ----------------------------------------------------


def merge_upsert_snapshot(sf_dir: str):
    """MERGE INTO semantics: apply the events change log to the customer
    base snapshot. Each event upserts (key=user_id, cents=value*100) —
    except 'error' events, which DELETE the key. Base rows carry seq=-1 so
    any change wins; last writer wins by (ts_us, event_id). Keys present
    only in the log are inserts; keys with a final delete vanish.

    Scale shape: base ∪ log streams through a block-local keep-last
    combiner (sort + drop_duplicates(keep='last') per block), so the key
    shuffle moves ONE row per (block, key) — the change-log equivalent of
    a pre-aggregated groupby. The bucket pass repeats the same reduce and
    filters deletes."""
    base = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    log = _read(sf_dir, "events",
                columns=["user_id", "event_id", "ts", "event_type", "value"])

    def prep_base(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t["c_custkey"],
            "cents": _cents(t["c_acctbal"]),
            "seq": pa.array(np.full(n, -1, np.int64)),
            "seq2": pa.array(np.full(n, -1, np.int64)),
            "del_": pa.array(np.zeros(n, np.int64)),
        })

    def prep_log(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["user_id"], pa.int64()),
            "cents": _cents(t["value"]),
            "seq": pc.cast(t["ts"], pa.int64()),
            "seq2": t["event_id"],
            "del_": pc.cast(pc.equal(t["event_type"], "error"), pa.int64()),
        })

    def keep_last(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "seq", "seq2"], kind="mergesort")
        df = df.drop_duplicates("key", keep="last")
        df["_kb"] = (df["key"].to_numpy() & 255).astype(np.int64)
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "seq", "seq2"], kind="mergesort")
        g = g.drop_duplicates("key", keep="last")
        g = g[g["del_"].to_numpy() == 0]
        return pd.DataFrame({
            "key": g["key"].to_numpy(),
            "cents": g["cents"].to_numpy().astype(np.int64),
        })

    merged = (
        base.map_batches(prep_base, batch_format="pyarrow")
        .union(log.map_batches(prep_log, batch_format="pyarrow"))
        .map_batches(keep_last, batch_format="pandas")
        .groupby("_kb").map_groups(finish, batch_format="pandas")
    )
    return pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)


SQL_MERGE_UPSERT_SNAPSHOT = """
WITH base AS (
  SELECT c_custkey AS key,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         CAST(-1 AS BIGINT) AS seq, CAST(-1 AS BIGINT) AS seq2, 0 AS del_
  FROM customer
), chg AS (
  SELECT user_id AS key,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS seq, event_id AS seq2,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS del_
  FROM events
), u AS (
  SELECT * FROM base UNION ALL SELECT * FROM chg
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                               ORDER BY seq DESC, seq2 DESC) AS rn
  FROM u
)
SELECT key, cents FROM r WHERE rn = 1 AND del_ = 0
"""


# -- above_nation_avg ---------------------------------------------------------


def above_nation_avg(sf_dir: str):
    """Correlated-subquery filter: customers whose order-revenue total
    exceeds the AVERAGE total of customers in the same nation (among
    customers with orders). The comparison is the integer
    cross-multiplication total*count > nation_sum — no float average
    exists anywhere, so Ray and DuckDB agree exactly.

    Scale shape: per-customer totals via a combiner-style bucketed
    aggregate (row-sized key domain); the custkey->nationkey dimension is
    broadcast ONCE as two numpy arrays (ray.put, searchsorted lookup in
    every task — the repo's standard small-side join); the per-nation
    (sum, count) is a bounded-domain aggregate collected tiny and
    broadcast back for the filter. Zero all-to-all joins."""
    from .queries import _bucketed_agg

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "cents": _cents(t["o_totalprice"]),
        })

    totals = _bucketed_agg(
        orders.map_batches(prep, batch_format="pyarrow"),
        keys=["o_custkey"],
        spec={"total_cents": ("cents", "sum")},
    )

    cust_refs = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).to_arrow_refs()
    cust = pa.concat_tables(
        [ray.get(r).combine_chunks() for r in cust_refs]
    )
    ck = cust.column("c_custkey").to_numpy()
    order_ = np.argsort(ck, kind="stable")
    nat_ref = ray.put((ck[order_], cust.column("c_nationkey")
                       .to_numpy().astype(np.int64)[order_]))

    def add_nation(df: pd.DataFrame) -> pd.DataFrame:
        keys, nats = ray.get(nat_ref)
        pos = np.searchsorted(keys, df["o_custkey"].to_numpy())
        df = df.copy()
        df["c_nationkey"] = nats[pos]
        return df

    with_nat = totals.map_batches(add_nation, batch_format="pandas")
    per_nation = with_nat.groupby("c_nationkey").aggregate(
        Sum("total_cents", alias_name="nsum"), Count(alias_name="ncnt")
    ).to_pandas()
    nsum = dict(zip(per_nation["c_nationkey"], per_nation["nsum"]))
    ncnt = dict(zip(per_nation["c_nationkey"], per_nation["ncnt"]))
    nsum_ref = ray.put((nsum, ncnt))

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        s, c = ray.get(nsum_ref)
        nk = df["c_nationkey"].to_numpy()
        tot = df["total_cents"].to_numpy().astype(np.int64)
        keep = tot * np.array([c[k] for k in nk], np.int64) > np.array(
            [s[k] for k in nk], np.int64)
        out = df[keep]
        return pd.DataFrame({
            "c_custkey": out["o_custkey"].to_numpy(),
            "total_cents": out["total_cents"].to_numpy().astype(np.int64),
        })

    out = with_nat.map_batches(flt, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


SQL_ABOVE_NATION_AVG = """
WITH t AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders GROUP BY 1
), j AS (
  SELECT c.c_custkey, c.c_nationkey, t.total_cents
  FROM t JOIN customer c ON c.c_custkey = t.o_custkey
), n AS (
  SELECT c_nationkey, CAST(sum(total_cents) AS BIGINT) AS nsum,
         CAST(count(*) AS BIGINT) AS ncnt
  FROM j GROUP BY 1
)
SELECT j.c_custkey, j.total_cents
FROM j JOIN n USING (c_nationkey)
WHERE j.total_cents * n.ncnt > n.nsum
"""


# -- ntile_day_quartiles ------------------------------------------------------


def ntile_day_quartiles(sf_dir: str):
    """NTILE(4) per order day over price cents (ties broken by orderkey),
    rolled up to (day, quartile) -> (n, sum_cents). The equi-count
    bucketing behind quantile features and A/B splits.

    Scale shape: day is a bounded partition domain, so groupby(day)
    .map_groups is the right engine; inside the group the tile id is pure
    arange arithmetic (first n%4 tiles get the extra row — SQL NTILE
    semantics), then a tiny in-group rollup. Only (day, 4-row) rollups
    leave the group."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.divide(pc.cast(t["o_orderdate"], pa.int64()), _DAY_US),
            "cents": _cents(t["o_totalprice"]),
            "o_orderkey": t["o_orderkey"],
        })

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "o_orderkey"], kind="mergesort")
        n = len(g)
        r = np.arange(n, dtype=np.int64)
        base, rem = divmod(n, 4)
        if base == 0:
            q = r + 1
        else:
            boundary = rem * (base + 1)
            q = np.where(r < boundary, r // (base + 1),
                         rem + (r - boundary) // base) + 1
        cents = g["cents"].to_numpy()
        agg = (
            pd.DataFrame({"q": q, "cents": cents})
            .groupby("q", sort=True)["cents"].agg(["size", "sum"])
        )
        return pd.DataFrame({
            "day": np.full(len(agg), g["day"].iloc[0], np.int64),
            "q": agg.index.to_numpy().astype(np.int64),
            "n": agg["size"].to_numpy().astype(np.int64),
            "sum_cents": agg["sum"].to_numpy().astype(np.int64),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day").map_groups(tiles, batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


SQL_NTILE_DAY_QUARTILES = """
WITH c AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
), t AS (
  SELECT day, cents,
         NTILE(4) OVER (PARTITION BY day ORDER BY cents, o_orderkey) AS q
  FROM c
)
SELECT day, CAST(q AS BIGINT) AS q, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY day, q
"""


# -- interval_coalesce --------------------------------------------------------


def interval_coalesce(sf_dir: str):
    """Overlapping-interval union per user: every event opens a 30-minute
    interval; touching/overlapping intervals merge; report per user the
    merged-interval count and total covered microseconds (the uptime /
    watch-time / presence metric). A new island starts exactly when an
    interval's start exceeds the running max end of everything before it.

    Scale shape: per-user hash bucket, ONE sort, then vectorized
    cummax-shift island detection — the same gaps-and-islands engine as
    the streak operator but over continuous time. No range self-join."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        s = pc.cast(t["ts"], pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "s": s,
            "e": pc.add(s, _SESSION_US),
            "_ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def coalesce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "s"], kind="mergesort")
        cm = g.groupby("user_id", sort=False)["e"].cummax()
        pmax = cm.groupby(g["user_id"].to_numpy(), sort=False).shift(1)
        new = (pmax.isna() | (g["s"] > pmax)).to_numpy()
        isl = np.cumsum(new)
        d = pd.DataFrame({
            "user_id": g["user_id"].to_numpy(), "isl": isl,
            "s": g["s"].to_numpy(), "e": g["e"].to_numpy(),
        })
        per_isl = d.groupby(["user_id", "isl"], sort=False).agg(
            cs=("s", "min"), ce=("e", "max")).reset_index()
        per_isl["dur"] = per_isl["ce"] - per_isl["cs"]
        u = per_isl.groupby("user_id", sort=False)["dur"]
        return pd.DataFrame({
            "user_id": u.count().index.to_numpy(),
            "n_sessions": u.count().to_numpy().astype(np.int64),
            "covered_us": u.sum().to_numpy().astype(np.int64),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ub").map_groups(coalesce, batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


SQL_INTERVAL_COALESCE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
  FROM events
), m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM iv
), f AS (
  SELECT user_id, s, e,
         CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS new
  FROM m
), g AS (
  SELECT user_id, s, e,
         sum(new) OVER (PARTITION BY user_id ORDER BY s, e) AS isl
  FROM f
), c AS (
  SELECT user_id, isl, min(s) AS cs, max(e) AS ce FROM g GROUP BY 1, 2
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(ce - cs) AS BIGINT) AS covered_us
FROM c GROUP BY user_id
"""


ENGINEOPS_REGISTRY = {
    "streak_longest_per_user": (streak_longest_per_user, SQL_STREAK_LONGEST_PER_USER),
    "scd2_intervals": (scd2_intervals, SQL_SCD2_INTERVALS),
    "merge_upsert_snapshot": (merge_upsert_snapshot, SQL_MERGE_UPSERT_SNAPSHOT),
    "above_nation_avg": (above_nation_avg, SQL_ABOVE_NATION_AVG),
    "ntile_day_quartiles": (ntile_day_quartiles, SQL_NTILE_DAY_QUARTILES),
    "interval_coalesce": (interval_coalesce, SQL_INTERVAL_COALESCE),
}
