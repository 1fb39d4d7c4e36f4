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

from .queries import _read, _pd_arrow

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
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
        .groupby("_ub").map_groups(_pd_arrow(islands), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


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
        .groupby("_ub").map_groups(_pd_arrow(compress), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


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
        .map_batches(_pd_arrow(keep_last), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(finish), batch_format="pandas")
    )
    return pa.Table.from_pandas(merged.to_pandas(), preserve_index=False).replace_schema_metadata(None)


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

    with_nat = totals.map_batches(_pd_arrow(add_nation), batch_format="pandas")
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

    out = with_nat.map_batches(_pd_arrow(flt), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


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
        .groupby("day").map_groups(_pd_arrow(tiles), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


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
        .groupby("_ub").map_groups(_pd_arrow(coalesce), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


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


# -- column_profile -----------------------------------------------------------


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
                 "o_orderstatus"]


def column_profile(sf_dir: str):
    """Per-column dataset profiling (the DESCRIBE / data-quality scan every
    engine ships): null count, exact distinct count, min and max for each
    orders column, in long format. Numerics profile on their canonical
    integer form (cents, day ordinal); strings lexicographically; min/max
    are rendered as strings so one schema carries all five columns.

    Scale shape: ONE pass computes per-block partials — (col, n_null,
    min, max) rows plus block-distinct (col, value) rows (the combiner for
    the exact distinct count) — then a 5-key bounded groupby merges the
    min/max/null partials and a hash-bucketed nunique finishes the
    distinct side. The full column values never leave their blocks."""
    ds = _read(sf_dir, "orders", columns=_PROFILE_COLS)

    def canon(t: pa.Table) -> dict[str, np.ndarray]:
        return {
            "o_orderkey": t["o_orderkey"].to_numpy().astype(np.int64),
            "o_custkey": t["o_custkey"].to_numpy().astype(np.int64),
            "o_totalprice": _cents(t["o_totalprice"]).to_numpy(),
            "o_orderdate": pc.divide(
                pc.cast(t["o_orderdate"], pa.int64()), _DAY_US).to_numpy(),
            "o_orderstatus": t["o_orderstatus"].to_numpy(zero_copy_only=False),
        }

    def mm_partial(t: pa.Table) -> pa.Table:
        cols = canon(t)
        rows = []
        for name in _PROFILE_COLS:
            v = cols[name]
            n_null = int(pd.isna(v).sum())
            vv = v[~pd.isna(v)] if n_null else v
            if name == "o_orderstatus":
                mn = mx = None
                mns = str(vv.min()) if len(vv) else None
                mxs = str(vv.max()) if len(vv) else None
            else:
                mn = int(vv.min()) if len(vv) else None
                mx = int(vv.max()) if len(vv) else None
                mns = mxs = None
            rows.append((name, n_null, mn, mx, mns, mxs))
        cols_t = list(zip(*rows))
        return pa.table({
            "col_name": pa.array(cols_t[0], pa.string()),
            "n_null": pa.array(cols_t[1], pa.int64()),
            "min_i": pa.array(cols_t[2], pa.int64()),
            "max_i": pa.array(cols_t[3], pa.int64()),
            "min_s": pa.array(cols_t[4], pa.string()),
            "max_s": pa.array(cols_t[5], pa.string()),
        })

    def dv_partial(t: pa.Table) -> pa.Table:
        cols = canon(t)
        parts = []
        for name in _PROFILE_COLS:
            u = pd.Series(
                pd.unique(pd.Series(cols[name]).dropna())
            ).astype(str)
            parts.append(pd.DataFrame({"col_name": name, "v": u}))
        df = pd.concat(parts, ignore_index=True)
        df["_kb"] = (pd.util.hash_array(df["v"].to_numpy())
                     % 64).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def dv_final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col_name", "v"]).groupby(
            "col_name", sort=False).size()
        return pd.DataFrame({
            "col_name": d.index.to_numpy(),
            "nd": d.to_numpy().astype(np.int64),
        })

    from ray.data.aggregate import Max, Min, Sum

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow")
        .groupby("col_name").aggregate(
            Sum("n_null", alias_name="n_null"),
            Min("min_i", alias_name="min_i"), Max("max_i", alias_name="max_i"),
            Min("min_s", alias_name="min_s"), Max("max_s", alias_name="max_s"),
        ).to_pandas()
    )
    nd = (
        ds.map_batches(dv_partial, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(dv_final), batch_format="pandas")
        .groupby("col_name").aggregate(Sum("nd", alias_name="n_distinct"))
        .to_pandas()
    )
    out = mm.merge(nd, on="col_name")
    is_str = out["col_name"] == "o_orderstatus"
    out["min_v"] = np.where(is_str, out["min_s"],
                            out["min_i"].map(lambda x: str(int(x))
                                             if pd.notna(x) else None))
    out["max_v"] = np.where(is_str, out["max_s"],
                            out["max_i"].map(lambda x: str(int(x))
                                             if pd.notna(x) else None))
    out = out[["col_name", "n_null", "n_distinct", "min_v", "max_v"]]
    out["n_null"] = out["n_null"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False).replace_schema_metadata(None)


SQL_COLUMN_PROFILE = """
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(o_orderdate) // 86400000000 AS day, o_orderstatus
  FROM orders
)
SELECT 'o_orderkey' AS col_name, CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_v, CAST(max(o_orderkey) AS VARCHAR) AS max_v FROM c
UNION ALL
SELECT 'o_custkey', CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM c
UNION ALL
SELECT 'o_totalprice', CAST(count(*) FILTER (cents IS NULL) AS BIGINT),
       CAST(count(DISTINCT cents) AS BIGINT),
       CAST(min(cents) AS VARCHAR), CAST(max(cents) AS VARCHAR) FROM c
UNION ALL
SELECT 'o_orderdate', CAST(count(*) FILTER (day IS NULL) AS BIGINT),
       CAST(count(DISTINCT day) AS BIGINT),
       CAST(min(day) AS VARCHAR), CAST(max(day) AS VARCHAR) FROM c
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) FILTER (o_orderstatus IS NULL) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       min(o_orderstatus), max(o_orderstatus) FROM c
"""


# -- pmi_top_pairs -------------------------------------------------------------


def pmi_top_pairs(sf_dir: str, small_side_max: int = 200_000):
    """Top-50 adjacent-word pairs by pointwise mutual information
    (min count 5) — the phrase-mining / collocation detector.
    pmi = ln(c_ab * N_u^2 / (N_bi * c_a * c_b)), quantized to 1e-6 via the
    same floor(ln(int ratio)*1e6+0.5) rule unigram_logprob validated
    cross-engine.

    Scale shape, two regimes on the MATERIALIZED count table (the raw
    corpus is reduced map-side either way — Counter per block, ONE
    bucket-reduce shuffle; fusing the two counting passes into one read
    took 8.9→5.4 s at sf0.1):
    - counts ≤ ``small_side_max``: the vocabulary is output-sized, so the
      unigram lookup and PMI scoring finalize driver-side in one pandas
      merge (the duplicate_of small-output precedent) — profiling showed
      the distributed lookup's three fixed shuffles were 100% overhead at
      this size (5.4 s → ~1.5 s at sf0.1).
    - counts > ``small_side_max``: the vocabulary is row-sized and must
      NOT transit the driver: candidate bigrams explode into two
      word-keyed rows that co-locate with the unigram partition by
      word-hash bucket, merge vectorized, and re-group by pair — the
      same candidate-filtered lookup shape as ngram_jaccard's size join.
      pytest forces this path and asserts bit-identical output."""
    import re
    from collections import Counter

    from ray.data.aggregate import Sum

    from .queries import _block_topk, _bucketed_agg

    tok = re.compile(r"[^a-z0-9]+")
    ds = _read(sf_dir, "documents", columns=["text"])

    def both_partial(t: pa.Table) -> pa.Table:
        """ONE tokenization pass counts unigrams AND bigrams (bigrams are
        tagged by a non-empty w2)."""
        cu: Counter = Counter()
        cb: Counter = Counter()
        for x in t["text"].to_pylist():
            ws = [w for w in tok.split((x or "").lower()) if w]
            cu.update(ws)
            cb.update(zip(ws, ws[1:]))
        kb = list(cb.keys())
        return pa.table({
            "w1": pa.array(list(cu.keys()) + [a for a, _ in kb], pa.string()),
            "w2": pa.array([""] * len(cu) + [b for _, b in kb], pa.string()),
            "n": pa.array(list(cu.values()) + list(cb.values()), pa.int64()),
        })

    counts = _bucketed_agg(
        ds.map_batches(both_partial, batch_format="pyarrow"),
        ["w1", "w2"], {"n": ("n", "sum")},
    ).materialize()

    if counts.count() <= small_side_max:
        # vocabulary is output-sized: driver-side finalize, same math
        c = counts.to_pandas()
        is_uni = c["w2"] == ""
        udf = c[is_uni][["w1", "n"]].rename(columns={"w1": "w", "n": "c"})
        bdf = c[~is_uni].rename(columns={"n": "n_ab"})
        n_u_i, n_bi_i = int(udf["c"].sum()), int(bdf["n_ab"].sum())
        f = bdf[bdf["n_ab"] >= 5]
        m = (
            f.merge(udf.rename(columns={"w": "w1", "c": "c_a"}), on="w1")
            .merge(udf.rename(columns={"w": "w2", "c": "c_b"}), on="w2")
        )
        num = m["n_ab"].to_numpy().astype(np.float64) * n_u_i * n_u_i
        den = float(n_bi_i) * m["c_a"].to_numpy() * m["c_b"].to_numpy()
        m["pmi_q"] = np.floor(np.log(num / den) * 1_000_000 + 0.5).astype(np.int64)
        m["n_ab"] = m["n_ab"].astype(np.int64)
        m = m.sort_values(["pmi_q", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(50)
        return pa.Table.from_pandas(
            m[["w1", "w2", "n_ab", "pmi_q"]].reset_index(drop=True),
            preserve_index=False).replace_schema_metadata(None)

    def split(is_uni: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["w2"], "")
            sub = t.filter(mask if is_uni else pc.invert(mask))
            if is_uni:
                return pa.table({"w": sub["w1"], "c": sub["n"]})
            return pa.table({"w1": sub["w1"], "w2": sub["w2"],
                             "n_ab": sub["n"]})
        return f

    uni = counts.map_batches(split(True), batch_format="pyarrow")
    bi = counts.map_batches(split(False), batch_format="pyarrow")
    n_u = int(uni.aggregate(Sum("c", alias_name="s"))["s"])
    n_bi = int(bi.aggregate(Sum("n_ab", alias_name="s"))["s"])
    cand = bi.filter(expr="n_ab >= 5")

    n_wb = 64

    cols = ["w", "w1", "w2", "n_ab", "side", "c", "_wb"]

    def explode_words(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat([
            pd.DataFrame({"w": df["w1"], "w1": df["w1"], "w2": df["w2"],
                          "n_ab": df["n_ab"].astype(np.int64),
                          "side": np.int64(1)}),
            pd.DataFrame({"w": df["w2"], "w1": df["w1"], "w2": df["w2"],
                          "n_ab": df["n_ab"].astype(np.int64),
                          "side": np.int64(2)}),
        ])
        out["c"] = np.int64(0)
        out["_wb"] = (pd.util.hash_array(out["w"].to_numpy())
                      % n_wb).astype(np.int64)
        return out[cols]

    def tag_uni(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "w": df["w"], "w1": "", "w2": "",
            "n_ab": np.int64(0), "side": np.int64(0),
            "c": df["c"].astype(np.int64),
        })
        out["_wb"] = (pd.util.hash_array(out["w"].to_numpy())
                      % n_wb).astype(np.int64)
        return out[cols]

    def lookup(g: pd.DataFrame) -> pd.DataFrame:
        lut = g[g["side"] == 0][["w", "c"]]
        need = g[g["side"] > 0][["w", "w1", "w2", "n_ab", "side"]]
        m = need.merge(lut, on="w", how="left")
        m["_pb"] = (pd.util.hash_array(m["w1"].to_numpy())
                    % n_wb).astype(np.int64)
        return m[["w1", "w2", "n_ab", "side", "c", "_pb"]]

    def score(g: pd.DataFrame) -> pd.DataFrame:
        ca = g[g["side"] == 1][["w1", "w2", "n_ab", "c"]].rename(
            columns={"c": "c_a"})
        cb = g[g["side"] == 2][["w1", "w2", "c"]].rename(columns={"c": "c_b"})
        m = ca.merge(cb, on=["w1", "w2"])
        num = m["n_ab"].to_numpy().astype(np.float64) * n_u * n_u
        den = float(n_bi) * m["c_a"].to_numpy() * m["c_b"].to_numpy()
        m["pmi_q"] = np.floor(
            np.log(num / den) * 1_000_000 + 0.5).astype(np.int64)
        m["n_ab"] = m["n_ab"].astype(np.int64)
        return m[["w1", "w2", "n_ab", "pmi_q"]]

    # word-bucketed unigram lookup (side 0 = counts, 1/2 = pair slots)
    uni_tagged = uni.map_batches(_pd_arrow(tag_uni), batch_format="pandas")
    need = cand.map_batches(_pd_arrow(explode_words), batch_format="pandas")
    joined = uni_tagged.union(need).groupby("_wb").map_groups(
        _pd_arrow(lookup), batch_format="pandas")
    scored = joined.groupby("_pb").map_groups(_pd_arrow(score), batch_format="pandas")

    keys, desc = ["pmi_q", "w1", "w2"], [True, False, False]
    out = (
        scored.map_batches(_block_topk(keys, desc, 50), batch_format="pyarrow")
        .sort(keys, descending=desc).limit(50)
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_PMI_TOP_PAIRS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS ws
  FROM documents
), w AS (
  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS i FROM toks
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1
), nu AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_u FROM uni
), bi AS (
  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS n_ab
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1 GROUP BY 1, 2
), nb AS (
  SELECT CAST(sum(n_ab) AS BIGINT) AS n_bi FROM bi
)
SELECT f.w1, f.w2, f.n_ab,
       CAST(floor(ln((f.n_ab::DOUBLE * nu.n_u * nu.n_u)
                     / (nb.n_bi::DOUBLE * u1.c * u2.c)) * 1000000 + 0.5)
            AS BIGINT) AS pmi_q
FROM bi f
CROSS JOIN nu CROSS JOIN nb
JOIN uni u1 ON u1.w = f.w1
JOIN uni u2 ON u2.w = f.w2
WHERE f.n_ab >= 5
ORDER BY pmi_q DESC, w1, w2 LIMIT 50
"""


# -- user_path_signature -------------------------------------------------------


def user_path_signature(sf_dir: str):
    """Ordered string_agg: each user's journey signature — the event_type
    sequence of their FIRST 8 events (by ts, event_id), comma-joined. The
    behavioral-clustering / funnel-shape feature.

    Scale shape: per-user hash bucket, one sort, head(8) per user via
    cumcount mask (vectorized), then the join is a per-key reduce over at
    most 8 tiny strings — bounded work per key by construction."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
            "_ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def sig(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        g = g[g.groupby("user_id", sort=False).cumcount() < 8]
        agg = g.groupby("user_id", sort=False)["event_type"].agg(
            path_sig=",".join, n_used="size")
        return pd.DataFrame({
            "user_id": agg.index.to_numpy(),
            "path_sig": agg["path_sig"].to_numpy(),
            "n_used": agg["n_used"].to_numpy().astype(np.int64),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ub").map_groups(_pd_arrow(sig), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_USER_PATH_SIGNATURE = """
WITH o AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
)
SELECT user_id, string_agg(event_type, ',' ORDER BY rn) AS path_sig,
       CAST(count(*) AS BIGINT) AS n_used
FROM o WHERE rn <= 8 GROUP BY user_id
"""


# -- zscore_by_type ------------------------------------------------------------


def zscore_by_type(sf_dir: str):
    """Per-group feature standardization: each event's value z-scored
    against its event_type population (the feature-scaling pass before
    model training). Integer-exact across engines: the numerator and the
    sqrt argument are built from integer aggregates, so
    z = (x*n - s) / sqrt(n*ssq - s^2) is the same IEEE double in Ray and
    DuckDB (products are cast to double FIRST, in the same order, so even
    the >2^63 regime matches).

    Scale shape: bounded-domain groupby for (n, s, ssq) per type, a tiny
    broadcast map back, ONE vectorized scoring pass. Zero row shuffles."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        x = _cents(t["value"])
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "x": x,
            "xx": pc.multiply(x, x),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    stats = prepped.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("x", alias_name="s"),
        Sum("xx", alias_name="ssq"),
    ).to_pandas()
    lut = {
        r.event_type: (int(r.n), int(r.s), int(r.ssq))
        for r in stats.itertuples()
    }
    lut_ref = ray.put(lut)

    def zscore(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(lut_ref)
        tr = df["event_type"].map(m)
        n = np.array([t[0] for t in tr], np.float64)
        s = np.array([t[1] for t in tr], np.float64)
        ssq = np.array([t[2] for t in tr], np.float64)
        x = df["x"].to_numpy().astype(np.float64)
        var_n2 = n * ssq - s * s
        z = np.where(var_n2 > 0, (x * n - s) / np.sqrt(np.maximum(var_n2, 1)), 0.0)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "z_q": np.floor(z * 1_000_000 + 0.5).astype(np.int64),
        })

    out = prepped.map_batches(_pd_arrow(zscore), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_ZSCORE_BY_TYPE = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
), a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS ssq
  FROM c GROUP BY 1
)
SELECT c.event_id,
       CAST(CASE WHEN a.n::DOUBLE * a.ssq - a.s::DOUBLE * a.s <= 0 THEN 0
            ELSE floor((c.x::DOUBLE * a.n - a.s)
                       / sqrt(a.n::DOUBLE * a.ssq - a.s::DOUBLE * a.s)
                       * 1000000 + 0.5) END AS BIGINT) AS z_q
FROM c JOIN a USING (event_type)
"""


# -- cume_dist_day -------------------------------------------------------------


def cume_dist_day(sf_dir: str):
    """CUME_DIST within day: for each event, the fraction of same-day
    events with value <= its value, as the exact integer
    c_le * 1e6 // n_day (integer floor division on both engines — no
    float percentile anywhere). The within-partition percentile feature.

    Scale shape: day is a bounded partition domain -> groupby(day)
    .map_groups; inside the group ONE sort + searchsorted gives every
    row's tie-inclusive rank simultaneously. No per-row window scan."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            "cents": _cents(t["value"]),
        })

    def cume(g: pd.DataFrame) -> pd.DataFrame:
        cents = g["cents"].to_numpy()
        srt = np.sort(cents, kind="mergesort")
        c_le = np.searchsorted(srt, cents, side="right").astype(np.int64)
        n = len(g)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "cd_q": c_le * 1_000_000 // n,
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day").map_groups(_pd_arrow(cume), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_CUME_DIST_DAY = """
WITH c AS (
  SELECT event_id, epoch_us(ts) // 86400000000 AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT event_id,
         count(*) OVER (PARTITION BY day ORDER BY cents
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c_le,
         count(*) OVER (PARTITION BY day) AS n
  FROM c
)
SELECT event_id, CAST(c_le * 1000000 // n AS BIGINT) AS cd_q FROM w
"""


# -- local_supplier_revenue (TPC-H Q5 family) ---------------------------------


def local_supplier_revenue(sf_dir: str):
    """Chain join across the dimension hierarchy (TPC-H Q5 family):
    revenue from lineitems whose CUSTOMER and SUPPLIER share a nation,
    rolled up per nation name. Exercises the one join planning decision
    the other relational ops don't: a BIG-BIG equi-join (lineitem ⋈ orders
    on orderkey, both fact-sized) combined with broadcast dimension
    attachment (supplier, customer, nation maps via ray.put +
    searchsorted) and a bounded-domain final rollup.

    Scale shape: the big-big join is a hash-partitioned Dataset.join on
    the shared orderkey; every dimension lookup rides the map side; the
    c_nation = s_nation filter drops rows BEFORE the final 25-key
    groupby. The fact table crosses the wire exactly once."""
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def dim_map(table: str, key: str, val: str):
        refs = _read(sf_dir, table, columns=[key, val]).to_arrow_refs()
        t = pa.concat_tables([ray.get(r).combine_chunks() for r in refs])
        k = t.column(key).to_numpy().astype(np.int64)
        v = t.column(val).to_numpy(zero_copy_only=False)
        o = np.argsort(k, kind="stable")
        return ray.put((k[o], v[o]))

    supp_ref = dim_map("supplier", "s_suppkey", "s_nationkey")
    cust_ref = dim_map("customer", "c_custkey", "c_nationkey")
    nat_ref = dim_map("nation", "n_nationkey", "n_name")

    def li_prep(t: pa.Table) -> pa.Table:
        sk, sv = ray.get(supp_ref)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        s_nat = sv[np.searchsorted(
            sk, t["l_suppkey"].to_numpy())].astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "s_nat": pa.array(s_nat, pa.int64()),
            "cents": _cents(rev),
        })

    def o_prep(t: pa.Table) -> pa.Table:
        ck, cv = ray.get(cust_ref)
        c_nat = cv[np.searchsorted(
            ck, t["o_custkey"].to_numpy())].astype(np.int64)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "c_nat": pa.array(c_nat, pa.int64()),
        })

    j = li.map_batches(li_prep, batch_format="pyarrow").join(
        orders.map_batches(o_prep, batch_format="pyarrow"),
        join_type="inner", on=("l_orderkey",), right_on=("o_orderkey",),
        num_partitions=8,
    )

    from ray.data.aggregate import Sum

    local = j.filter(expr="s_nat == c_nat")
    per_nat = local.groupby("s_nat").aggregate(
        Sum("cents", alias_name="revenue_q")).to_pandas()
    nk, nv = ray.get(nat_ref)
    per_nat["n_name"] = nv[np.searchsorted(nk, per_nat["s_nat"].to_numpy())]
    per_nat["revenue_q"] = per_nat["revenue_q"].astype(np.int64)
    return pa.Table.from_pandas(per_nat[["n_name", "revenue_q"]],
                                preserve_index=False).replace_schema_metadata(None)


SQL_LOCAL_SUPPLIER_REVENUE = """
SELECT n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_q
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY n.n_name
"""


# -- kmv_week_overlap ----------------------------------------------------------

_KMV_MULT2 = 2654435761
_KMV_MOD2 = 4294967296
_KMV_K2 = 64


def kmv_week_overlap(sf_dir: str):
    """Sketch SET OPERATIONS: estimated Jaccard overlap between the user
    sets of even-index and odd-index weeks, from two KMV sketches — the
    retention/audience-overlap estimator that never shuffles the full id
    sets. Uses the same integer multiplicative hash as kmv_distinct_users;
    the union trick scores |A∩B| on the k smallest hashes of A∪B, so both
    engines compute the identical integer ppm.

    Scale shape: each block reduces to ≤ k distinct hashes PER SIDE
    map-side; only sketch-sized rows reach the driver, which folds two
    64-value arrays — the legitimate driver-side finalize for an O(k)
    sketch."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def bottom_k(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        day = pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US).to_numpy()
        side = ((day // 7) % 2).astype(np.int64)
        h = ((u * _KMV_MULT2) % _KMV_MOD2).astype(np.int64)
        outs, outh = [], []
        for s in (0, 1):
            hh = np.unique(h[side == s])[:_KMV_K2]
            outs.append(np.full(len(hh), s, np.int64))
            outh.append(hh)
        return pa.table({
            "side": pa.array(np.concatenate(outs), pa.int64()),
            "h": pa.array(np.concatenate(outh), pa.int64()),
        })

    rows = ds.map_batches(bottom_k, batch_format="pyarrow").to_pandas()
    ka = np.sort(rows[rows["side"] == 0]["h"].unique())[:_KMV_K2]
    kb = np.sort(rows[rows["side"] == 1]["h"].unique())[:_KMV_K2]
    un = np.sort(np.union1d(ka, kb))[:_KMV_K2]
    k_eff = len(un)
    n_both = int((np.isin(un, ka) & np.isin(un, kb)).sum()) if k_eff else 0
    ppm = n_both * 1_000_000 // k_eff if k_eff else 0
    return pa.table({
        "k_eff": pa.array([k_eff], pa.int64()),
        "n_both": pa.array([n_both], pa.int64()),
        "jaccard_ppm": pa.array([ppm], pa.int64()),
    })


SQL_KMV_WEEK_OVERLAP = """
WITH e AS (
  SELECT user_id, ((epoch_us(ts) // 86400000000) // 7) % 2 AS side
  FROM events
), h AS (
  SELECT DISTINCT side,
         CAST(CAST(user_id AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT)
           AS h
  FROM e
), ka AS (SELECT h FROM h WHERE side = 0 ORDER BY h LIMIT 64),
kb AS (SELECT h FROM h WHERE side = 1 ORDER BY h LIMIT 64),
un AS (
  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT 64
), b AS (
  SELECT count(*) AS n_both FROM un
  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
), k AS (SELECT count(*) AS k_eff FROM un)
SELECT CAST(k.k_eff AS BIGINT) AS k_eff,
       CAST(b.n_both AS BIGINT) AS n_both,
       CAST(CASE WHEN k.k_eff = 0 THEN 0
            ELSE b.n_both * 1000000 // k.k_eff END AS BIGINT) AS jaccard_ppm
FROM b, k
"""


# -- table_checksum ------------------------------------------------------------

_CK_MOD = 2305843009213693951  # 2^61 - 1


def table_checksum(sf_dir: str):
    """Order-independent table fingerprints (the anti-entropy check used to
    validate replication / migration / rewrite equivalence): per table, the
    row count plus XOR and modular-SUM folds of a 60-bit slice of each
    row's md5 over its canonical string. Any row lost, duplicated or
    altered flips the digests; row order and partitioning cannot.

    Scale shape: each block folds to ONE partial row (count, xor, sum);
    the driver combines block partials — O(blocks) state, zero shuffle.
    The md5-per-row Python loop is the operation itself (the same cost the
    reference pays hashing content), isolated in the map stage."""
    import hashlib

    def partials(ds, fmt) -> pa.Table:
        def fold(t: pa.Table) -> pa.Table:
            cols = fmt(t)
            n = len(cols[0])
            hs = np.empty(n, np.int64)
            it = zip(*[c for c in cols])
            for i, parts in enumerate(it):
                s = "|".join(parts)
                hs[i] = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            x = int(np.bitwise_xor.reduce(hs)) if n else 0
            sm = int(hs.astype(object).sum()) % _CK_MOD if n else 0
            return pa.table({
                "n": pa.array([n], pa.int64()),
                "x": pa.array([x], pa.int64()),
                "s": pa.array([sm], pa.int64()),
            })

        p = ds.map_batches(fold, batch_format="pyarrow").to_pandas()
        return (int(p["n"].sum()),
                int(np.bitwise_xor.reduce(p["x"].to_numpy())) if len(p) else 0,
                int(p["s"].astype(object).sum()) % _CK_MOD)

    def orders_fmt(t: pa.Table):
        return (
            [str(x) for x in t["o_orderkey"].to_pylist()],
            [str(x) for x in t["o_custkey"].to_pylist()],
            [str(x) for x in _cents(t["o_totalprice"]).to_pylist()],
            [str(x) for x in pc.divide(
                pc.cast(t["o_orderdate"], pa.int64()), _DAY_US).to_pylist()],
            t["o_orderstatus"].to_pylist(),
        )

    def customer_fmt(t: pa.Table):
        return (
            [str(x) for x in t["c_custkey"].to_pylist()],
            [str(x) for x in _cents(t["c_acctbal"]).to_pylist()],
            t["c_mktsegment"].to_pylist(),
        )

    rows = []
    n, x, s = partials(
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_totalprice",
                       "o_orderdate", "o_orderstatus"]), orders_fmt)
    rows.append(("orders", n, x, s))
    n, x, s = partials(
        _read(sf_dir, "customer",
              columns=["c_custkey", "c_acctbal", "c_mktsegment"]),
        customer_fmt)
    rows.append(("customer", n, x, s))
    cols = list(zip(*rows))
    return pa.table({
        "table_name": pa.array(cols[0], pa.string()),
        "n_rows": pa.array(cols[1], pa.int64()),
        "xor60": pa.array(cols[2], pa.int64()),
        "sum_mod": pa.array(cols[3], pa.int64()),
    })


SQL_TABLE_CHECKSUM = """
WITH oh AS (
  SELECT CAST(('0x' || substr(md5(
           CAST(o_orderkey AS VARCHAR) || '|' ||
           CAST(o_custkey AS VARCHAR) || '|' ||
           CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
           || '|' ||
           CAST(epoch_us(o_orderdate) // 86400000000 AS VARCHAR) || '|' ||
           o_orderstatus), 1, 15)) AS BIGINT) AS h
  FROM orders
), ch AS (
  SELECT CAST(('0x' || substr(md5(
           CAST(c_custkey AS VARCHAR) || '|' ||
           CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR)
           || '|' || c_mktsegment), 1, 15)) AS BIGINT) AS h
  FROM customer
)
SELECT 'orders' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS xor60,
       CAST(sum(h) % 2305843009213693951 AS BIGINT) AS sum_mod
FROM oh
UNION ALL
SELECT 'customer', CAST(count(*) AS BIGINT), CAST(bit_xor(h) AS BIGINT),
       CAST(sum(h) % 2305843009213693951 AS BIGINT)
FROM ch
"""


# -- time_weighted_avg ---------------------------------------------------------


def time_weighted_avg(sf_dir: str):
    """Time-weighted average value per user — the step-function integral
    (each event's value holds until the next event): sum(cents_i * dt_i)
    // sum(dt_i) over a user's consecutive event gaps, exact integer
    division on both engines. The billing/metering/telemetry aggregate
    plain AVG gets wrong whenever sampling is irregular.

    Scale shape: per-user hash bucket, one sort, one vectorized
    groupby-shift for the next-timestamp, integer products summed per
    user. Users with a single event have no dwell time and drop out, same
    as the SQL's WHERE nxt IS NOT NULL."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "cents": _cents(t["value"]),
            "_ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def twa(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        nxt = g.groupby("user_id", sort=False)["ts_us"].shift(-1)
        keep = nxt.notna().to_numpy()
        dt = (nxt.to_numpy()[keep] - g["ts_us"].to_numpy()[keep]).astype(np.int64)
        d = pd.DataFrame({
            "user_id": g["user_id"].to_numpy()[keep],
            "num": g["cents"].to_numpy()[keep] * dt,
            "dt": dt,
        })
        agg = d.groupby("user_id", sort=False).sum()
        return pd.DataFrame({
            "user_id": agg.index.to_numpy(),
            "twa_q": (agg["num"].to_numpy() // agg["dt"].to_numpy())
                .astype(np.int64),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ub").map_groups(_pd_arrow(twa), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_TIME_WEIGHTED_AVG = """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT user_id, cents, ts_us,
         lead(ts_us) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) AS nxt
  FROM o
)
SELECT user_id,
       CAST(sum(cents * (nxt - ts_us)) // sum(nxt - ts_us) AS BIGINT) AS twa_q
FROM w WHERE nxt IS NOT NULL GROUP BY user_id
"""


# -- peak_concurrency ----------------------------------------------------------


def peak_concurrency(sf_dir: str):
    """Sweep-line peak concurrency per day: every event opens a 30-minute
    presence interval; the answer is the max of the GLOBAL running sum of
    +1/-1 boundary deltas, reported per day — the capacity-planning
    number (max simultaneous sessions) no groupby can produce.

    Scale shape: a distributed PREFIX SUM, the additive twin of
    late_events' prefix-max scan: deltas partition by day (bounded,
    time-ordered), each partition sorts locally and computes its own
    prefix run and total, the driver folds the ~31 per-day totals into
    base offsets, and peak_d = base_d + local_max_d. No global sort, no
    serial scan; ends sort before starts at the same instant so touching
    intervals never double-count."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def deltas(t: pa.Table) -> pa.Table:
        s = pc.cast(t["ts"], pa.int64()).to_numpy()
        e = s + _SESSION_US
        tt = np.concatenate([s, e])
        dd = np.concatenate([np.ones(len(s), np.int64),
                             np.full(len(e), -1, np.int64)])
        return pa.table({
            "t": pa.array(tt, pa.int64()),
            "delta": pa.array(dd, pa.int64()),
            "day": pa.array(tt // _DAY_US, pa.int64()),
        })

    def local_scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "delta"], kind="mergesort")
        run = np.cumsum(g["delta"].to_numpy())
        return pd.DataFrame({
            "day": [int(g["day"].iloc[0])],
            "total": [int(run[-1])],
            "max_prefix": [int(run.max())],
        })

    parts = (
        ds.map_batches(deltas, batch_format="pyarrow")
        .groupby("day").map_groups(_pd_arrow(local_scan), batch_format="pandas")
        .to_pandas()
        .sort_values("day")
    )
    base = np.concatenate([[0], np.cumsum(parts["total"].to_numpy())[:-1]])
    return pa.table({
        "day": pa.array(parts["day"].to_numpy(), pa.int64()),
        "peak": pa.array(base + parts["max_prefix"].to_numpy(), pa.int64()),
    })


SQL_PEAK_CONCURRENCY = """
WITH iv AS (
  SELECT epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e FROM events
), d AS (
  SELECT s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT e, -1 FROM iv
), r AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM d
)
SELECT t // 86400000000 AS day, CAST(max(run) AS BIGINT) AS peak
FROM r GROUP BY 1
"""


# -- densified_daily_counts ----------------------------------------------------


def densified_daily_counts(sf_dir: str):
    """Gap filling / densification: the dense (day × event_type) matrix with
    explicit ZERO rows for combinations that never occurred — what every
    charting/forecast consumer needs and a plain groupby cannot produce.

    Scale shape: the sparse counts come from one bounded-domain groupby;
    the dense frame is generated (days span × type list, both bounded
    metadata — never a data shuffle) and the sparse counts are broadcast
    into it. At 100 TB the dense frame is still |days| × |types| rows."""
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            "event_type": t["event_type"],
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    sparse = prepped.groupby(["day", "event_type"]).aggregate(
        Count(alias_name="n")).to_pandas()
    span = prepped.aggregate(Min("day", alias_name="lo"),
                             Max("day", alias_name="hi"))
    days = np.arange(int(span["lo"]), int(span["hi"]) + 1, dtype=np.int64)
    types = np.sort(sparse["event_type"].unique())
    dense = pd.MultiIndex.from_product(
        [days, types], names=["day", "event_type"]).to_frame(index=False)
    out = dense.merge(sparse, on=["day", "event_type"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


SQL_DENSIFIED_DAILY_COUNTS = """
WITH c AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events
), span AS (
  SELECT min(day) AS lo, max(day) AS hi FROM c
), days AS (
  SELECT lo + unnest(range(hi - lo + 1)) AS day FROM span
), types AS (
  SELECT DISTINCT event_type FROM c
), sparse AS (
  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1, 2
)
SELECT d.day, t.event_type, CAST(coalesce(s.n, 0) AS BIGINT) AS n
FROM days d CROSS JOIN types t
LEFT JOIN sparse s ON s.day = d.day AND s.event_type = t.event_type
"""


# -- unpivot_ohlc ---------------------------------------------------------------


def unpivot_ohlc(sf_dir: str):
    """UNPIVOT (wide → long): per-day order-price open/high/low/close cents
    melt into (day, metric, value) rows — the inverse of daily_type_matrix's
    pivot and the standard hand-off shape for charting layers.

    Scale shape: the wide source is the bounded daily_ohlc aggregate; the
    melt is a constant 4× map-side explode. No shuffle beyond the
    aggregate that built the wide table."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.divide(pc.cast(t["o_orderdate"], pa.int64()), _DAY_US),
            "cents": _cents(t["o_totalprice"]),
            "o_orderkey": t["o_orderkey"],
        })

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderkey"], kind="mergesort")
        return pd.DataFrame({
            "day": [int(g["day"].iloc[0])],
            "open": [int(g["cents"].iloc[0])],
            "high": [int(g["cents"].max())],
            "low": [int(g["cents"].min())],
            "close": [int(g["cents"].iloc[-1])],
        })

    wide = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day").map_groups(_pd_arrow(per_day), batch_format="pandas")
    )

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=["day"], value_vars=["open", "high", "low", "close"],
                      var_name="metric", value_name="value")
        out["value"] = out["value"].astype(np.int64)
        return out

    out = wide.map_batches(_pd_arrow(melt), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_UNPIVOT_OHLC = """
WITH c AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
), wide AS (
  SELECT day,
         first(cents ORDER BY o_orderkey) AS open,
         max(cents) AS high, min(cents) AS low,
         last(cents ORDER BY o_orderkey) AS close
  FROM c GROUP BY day
)
SELECT day, metric, CAST(value AS BIGINT) AS value
FROM wide UNPIVOT (value FOR metric IN (open, high, low, close))
"""


# -- revenue_share_ppm -----------------------------------------------------------


def revenue_share_ppm(sf_dir: str):
    """Percent-of-total (ratio-to-report): each nation's share of global
    order revenue in exact integer ppm (share = nation_cents * 1e6 //
    total_cents). The reporting verb behind every 'share of' dashboard.

    Scale shape: per-customer totals never materialize — one bounded
    nation-domain groupby after a broadcast custkey→nation lookup, then a
    driver-side ppm division over 25 rows."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust_refs = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).to_arrow_refs()
    cust = pa.concat_tables([ray.get(r).combine_chunks() for r in cust_refs])
    ck = cust.column("c_custkey").to_numpy()
    o = np.argsort(ck, kind="stable")
    nat_ref = ray.put((ck[o],
                       cust.column("c_nationkey").to_numpy().astype(np.int64)[o]))

    def prep(t: pa.Table) -> pa.Table:
        keys, nats = ray.get(nat_ref)
        nk = nats[np.searchsorted(keys, t["o_custkey"].to_numpy())]
        return pa.table({
            "c_nationkey": pa.array(nk, pa.int64()),
            "cents": _cents(t["o_totalprice"]),
        })

    per_nat = (
        orders.map_batches(prep, batch_format="pyarrow")
        .groupby("c_nationkey").aggregate(Sum("cents", alias_name="rev"))
        .to_pandas()
    )
    total = int(per_nat["rev"].sum())
    per_nat["revenue_q"] = per_nat["rev"].astype(np.int64)
    per_nat["share_ppm"] = (
        per_nat["rev"].to_numpy().astype(np.int64) * 1_000_000 // total
    )
    return pa.Table.from_pandas(
        per_nat[["c_nationkey", "revenue_q", "share_ppm"]],
        preserve_index=False).replace_schema_metadata(None)


SQL_REVENUE_SHARE_PPM = """
WITH r AS (
  SELECT c.c_nationkey,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS revenue_q
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT c_nationkey, revenue_q,
       CAST(revenue_q * 1000000 // (SELECT sum(revenue_q) FROM r) AS BIGINT)
         AS share_ppm
FROM r
"""


# -- bounce_rate_daily -----------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000  # sessionize's 30-min gap rule (queries.py)


def _with_session_ids(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket session assignment, identical to queries.
    sessionize's rule (new session when the in-user gap EXCEEDS 30 min):
    sort by (user, ts, event_id); a row opens a session iff it is the
    user's first row or gap > _GAP_US; global cumsum gives bucket-unique
    session ids because every user's first row opens one."""
    g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    prev = g.groupby("user_id", sort=False)["ts_us"].shift(1)
    new = (prev.isna() | ((g["ts_us"] - prev) > _GAP_US)).to_numpy()
    g = g.copy()
    g["sid"] = np.cumsum(new)
    return g


def bounce_rate_daily(sf_dir: str):
    """Per-day session bounce rate: sessions (30-min gap, per user) with
    EXACTLY one event over total sessions starting that day, in exact
    integer ppm — the engagement KPI that needs sessionization, a
    session-grain aggregate, and a calendar rollup in one query.

    Scale shape: session assignment is the per-user-bucket vectorized
    shift/cumsum pass; sessions reduce inside the bucket (one row per
    session), and only (day, n_sessions, n_bounces) partials — a bounded
    domain — cross the second shuffle."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "_ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = _with_session_ids(g)
        sess = g.groupby("sid", sort=False)["ts_us"].agg(["size", "min"])
        day = (sess["min"] // _DAY_US).to_numpy()
        one = (sess["size"] == 1).to_numpy().astype(np.int64)
        d = pd.DataFrame({"day": day, "n_sessions": 1, "n_bounces": one})
        return d.groupby("day", as_index=False).sum()

    from ray.data.aggregate import Sum

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ub").map_groups(_pd_arrow(per_bucket), batch_format="pandas")
        .groupby("day").aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("n_bounces", alias_name="n_bounces"),
        ).to_pandas()
    )
    daily["n_sessions"] = daily["n_sessions"].astype(np.int64)
    daily["n_bounces"] = daily["n_bounces"].astype(np.int64)
    daily["bounce_ppm"] = (
        daily["n_bounces"].to_numpy() * 1_000_000
        // daily["n_sessions"].to_numpy()
    )
    return pa.Table.from_pandas(daily, preserve_index=False).replace_schema_metadata(None)


SQL_BOUNCE_RATE_DAILY = """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), d AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) IS NULL
                OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id)
                   > 1800000000
              THEN 1 ELSE 0 END AS new
  FROM o
), s AS (
  SELECT user_id, ts_us,
         sum(new) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id) AS sid
  FROM d
), g AS (
  SELECT user_id, sid, count(*) AS n,
         min(ts_us) // 86400000000 AS day
  FROM s GROUP BY 1, 2
)
SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (n = 1) AS BIGINT) AS n_bounces,
       CAST(count(*) FILTER (n = 1) * 1000000 // count(*) AS BIGINT)
         AS bounce_ppm
FROM g GROUP BY day
"""


# -- session_type_lift -----------------------------------------------------------


def session_type_lift(sf_dir: str):
    """Market-basket lift over sessions: for every event-type pair, how
    much more often they share a 30-min session than independence
    predicts — lift_ppm = n_ab * S * 1e6 // (n_a * n_b), all integer.
    The co-occurrence / recommendation primitive applied to behavior.

    Scale shape: session ids per user bucket (vectorized), DISTINCT
    (session, type) reduces in-bucket, and the pair explode is a tiny
    self-merge per session (≤ 5 types → ≤ 10 pairs); only bounded
    (type, type) counts cross the final shuffle."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
            "_ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = _with_session_ids(g)
        st = g[["sid", "event_type"]].drop_duplicates()
        m = st.merge(st, on="sid")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = (
            m.groupby(["event_type_x", "event_type_y"], as_index=False)
            .size().rename(columns={"event_type_x": "t1",
                                    "event_type_y": "t2", "size": "n_ab"})
        )
        na = st.groupby("event_type", as_index=False).size().rename(
            columns={"event_type": "t1", "size": "n_ab"})
        na["t2"] = ""
        tot = pd.DataFrame({"t1": ["\x00total"], "t2": [""],
                            "n_ab": [st["sid"].nunique()]})
        return pd.concat([pairs, na[["t1", "t2", "n_ab"]], tot],
                         ignore_index=True)

    from ray.data.aggregate import Sum

    folded = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ub").map_groups(_pd_arrow(per_bucket), batch_format="pandas")
        .groupby(["t1", "t2"]).aggregate(Sum("n_ab", alias_name="n"))
        .to_pandas()
    )
    total = int(folded[folded["t1"] == "\x00total"]["n"].iloc[0])
    na = dict(zip(folded[(folded["t2"] == "") & (folded["t1"] != "\x00total")]["t1"],
                  folded[(folded["t2"] == "") & (folded["t1"] != "\x00total")]["n"]))
    pairs = folded[folded["t2"] != ""].copy()
    pairs["n_ab"] = pairs["n"].astype(np.int64)
    pairs["lift_ppm"] = [
        int(r.n_ab) * total * 1_000_000 // (int(na[r.t1]) * int(na[r.t2]))
        for r in pairs.itertuples()
    ]
    out = pairs[["t1", "t2", "n_ab", "lift_ppm"]].reset_index(drop=True)
    out["lift_ppm"] = out["lift_ppm"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


SQL_SESSION_TYPE_LIFT = """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
), d AS (
  SELECT user_id, event_id, ts_us, event_type,
         CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) IS NULL
                OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id)
                   > 1800000000
              THEN 1 ELSE 0 END AS new
  FROM o
), s AS (
  SELECT user_id, event_type,
         sum(new) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id) AS sid
  FROM d
), st AS (
  SELECT DISTINCT user_id, sid, event_type FROM s
), na AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS s_total
  FROM (SELECT DISTINCT user_id, sid FROM st)
), pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.sid = b.sid
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.t1, p.t2, p.n_ab,
       CAST(p.n_ab * tot.s_total * 1000000 // (na1.n * na2.n) AS BIGINT)
         AS lift_ppm
FROM pairs p
CROSS JOIN tot
JOIN na na1 ON na1.event_type = p.t1
JOIN na na2 ON na2.event_type = p.t2
"""


# -- engagement_report (composed pipeline) --------------------------------------


def engagement_report(sf_dir: str):
    """Composed end-to-end analytics pipeline (the events-side twin of
    training_corpus_pipeline): per day — sessions, bounces, bounce ppm,
    distinct active users, and peak concurrent 30-min presences — built by
    composing the already-oracled session, count-distinct, and sweep-line
    engines, verified as ONE driver-hashed result against ONE SQL twin so
    the composition itself (day alignment, join, integer rules) is what's
    being checked.

    Scale shape: three independent bounded-output pipelines (each
    documented at its own operator) merged driver-side on ≤|days| rows."""
    from .corpusops import daily_active_users

    bounce = bounce_rate_daily(sf_dir).to_pandas()
    dau = daily_active_users(sf_dir).to_pandas()
    peak = peak_concurrency(sf_dir).to_pandas()
    out = (
        bounce.merge(dau, on="day")
        .merge(peak, on="day")
        .sort_values("day").reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


SQL_ENGAGEMENT_REPORT = """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), d AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) IS NULL
                OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id)
                   > 1800000000
              THEN 1 ELSE 0 END AS new
  FROM o
), s AS (
  SELECT user_id, ts_us,
         sum(new) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id) AS sid
  FROM d
), g AS (
  SELECT user_id, sid, count(*) AS n,
         min(ts_us) // 86400000000 AS day
  FROM s GROUP BY 1, 2
), bounce AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(count(*) FILTER (n = 1) AS BIGINT) AS n_bounces,
         CAST(count(*) FILTER (n = 1) * 1000000 // count(*) AS BIGINT)
           AS bounce_ppm
  FROM g GROUP BY day
), dau AS (
  SELECT ts_us // 86400000000 AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM o GROUP BY 1
), deltas AS (
  SELECT ts_us AS t, 1 AS delta FROM o
  UNION ALL
  SELECT ts_us + 1800000000, -1 FROM o
), runs AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM deltas
), pk AS (
  SELECT t // 86400000000 AS day, CAST(max(run) AS BIGINT) AS peak
  FROM runs GROUP BY 1
)
SELECT b.day, b.n_sessions, b.n_bounces, b.bounce_ppm, dau.n_users, pk.peak
FROM bounce b
JOIN dau ON dau.day = b.day
JOIN pk ON pk.day = b.day
"""


ENGINEOPS_REGISTRY = {
    "streak_longest_per_user": (streak_longest_per_user, SQL_STREAK_LONGEST_PER_USER),
    "scd2_intervals": (scd2_intervals, SQL_SCD2_INTERVALS),
    "merge_upsert_snapshot": (merge_upsert_snapshot, SQL_MERGE_UPSERT_SNAPSHOT),
    "above_nation_avg": (above_nation_avg, SQL_ABOVE_NATION_AVG),
    "ntile_day_quartiles": (ntile_day_quartiles, SQL_NTILE_DAY_QUARTILES),
    "interval_coalesce": (interval_coalesce, SQL_INTERVAL_COALESCE),
    "column_profile": (column_profile, SQL_COLUMN_PROFILE),
    "pmi_top_pairs": (pmi_top_pairs, SQL_PMI_TOP_PAIRS),
    "user_path_signature": (user_path_signature, SQL_USER_PATH_SIGNATURE),
    "zscore_by_type": (zscore_by_type, SQL_ZSCORE_BY_TYPE),
    "cume_dist_day": (cume_dist_day, SQL_CUME_DIST_DAY),
    "local_supplier_revenue": (local_supplier_revenue, SQL_LOCAL_SUPPLIER_REVENUE),
    "kmv_week_overlap": (kmv_week_overlap, SQL_KMV_WEEK_OVERLAP),
    "table_checksum": (table_checksum, SQL_TABLE_CHECKSUM),
    "time_weighted_avg": (time_weighted_avg, SQL_TIME_WEIGHTED_AVG),
    "peak_concurrency": (peak_concurrency, SQL_PEAK_CONCURRENCY),
    "densified_daily_counts": (densified_daily_counts, SQL_DENSIFIED_DAILY_COUNTS),
    "unpivot_ohlc": (unpivot_ohlc, SQL_UNPIVOT_OHLC),
    "revenue_share_ppm": (revenue_share_ppm, SQL_REVENUE_SHARE_PPM),
    "bounce_rate_daily": (bounce_rate_daily, SQL_BOUNCE_RATE_DAILY),
    "session_type_lift": (session_type_lift, SQL_SESSION_TYPE_LIFT),
    "engagement_report": (engagement_report, SQL_ENGAGEMENT_REPORT),
}
