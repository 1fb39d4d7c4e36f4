"""Scale-shape join/statistics operators, round 3 batch 5: double-bloom
anti-join, integer-exact correlation moments, TTL recrawl dedup, and a
salted hot-key join.

Each operator exists to pin a specific 100-TB technique to an oracle-backed
query, so the technique itself (not just the answer) is regression-tested:

- bloom_antijoin: the broadcast-Bloom prefilter — probe rows that the Bloom
  filter proves absent NEVER enter the anti-join shuffle; only the maybe-set
  (true positives + the small false-positive tail) is verified exactly. A
  second Bloom built over the maybe-set prunes the build side symmetrically,
  so the cogroup shuffle carries two already-tiny sides. The result is
  EXACT (Bloom "no" is definitive; every "maybe" is re-checked), hence
  SQL-oracle-safe.
- corr_moments: distributed Pearson correlation from integer moment sums
  (n, Σx, Σy, Σx², Σy², Σxy) with in-block combining — the shuffle moves a
  handful of partial rows per block, never data rows. The final r is
  derived from the exact integer moments by the bit-identical IEEE double
  expression in both engines.
- ttl_dedup: first event per (user, type, TTL-window) — the recrawl-TTL
  primitive (don't refetch a URL seen within the window). Aggregate + join
  shape instead of per-key map_groups (measured 3× faster at 60k tiny
  groups, see BASELINE.md boilerplate note): min-ts per key, join back,
  min event_id breaks sub-window ties.
- salted_segment_revenue: the hot-key-salting pattern as a runnable,
  oracle-checked operator: the small dim side is replicated once per salt,
  the fact side picks a deterministic salt per row, and the join key is
  (key, salt) — a single skewed key now lands on _SALTS shuffle partitions
  instead of one.

Reference anchors: the reference's visited-set anti-join and blocked-domain
lookup (src/crawler/web_crawler.py) are broadcast-set lookups; bloom_antijoin
is the bounded-memory version of the same check for key domains too large to
broadcast exactly. All arithmetic is integer end-to-end (cents, ppm) so Ray
and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..stages.dedup import _fetch_broadcast
from .queries import _read, _pd_arrow

# -- double-bloom anti-join ---------------------------------------------------

# 2^16-bit bitmap (8 KiB) with 2 hash probes: for the build-side key
# cardinalities this repo sees (≤ ~10^4 distinct) the false-positive rate is
# < (n*k/m)^k ≈ 0.1% — the maybe-set is true-positives + a per-mille tail.
# At 10^10 build keys you size m = ~1.2 GiB for 1% fp and ship the bitmap
# via ray.put exactly as here; the operator shape does not change.
_BLOOM_BITS = 1 << 16
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_positions(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two splitmix64-style avalanche hashes, vectorized over int64 keys."""
    x = keys.astype(np.uint64)
    h = (x + _C1) * _C1
    h ^= h >> np.uint64(29)
    h *= _C2
    h ^= h >> np.uint64(32)
    mask = np.uint64(_BLOOM_BITS - 1)
    return (h & mask).astype(np.int64), ((h >> np.uint64(17)) & mask).astype(np.int64)


def _bitmap_of(keys: np.ndarray) -> np.ndarray:
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for pos in _bloom_positions(keys):
        np.bitwise_or.at(
            bits, pos // 8,
            np.left_shift(np.uint8(1), (pos % 8).astype(np.uint8)),
        )
    return bits


def _bloom_member(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    out = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys):
        hit = ((bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1) == 1
        out &= hit.astype(bool)
    return out


def _collect_bloom(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """OR-reduce per-block 8 KiB bitmaps: the only thing that ever reaches
    the driver is one bitmap per block, never keys."""

    def block_bloom(t: pa.Table) -> pa.Table:
        k = np.unique(t.column(col).to_numpy())
        return pa.table({"bm": pa.array([_bitmap_of(k).tobytes()], pa.binary())})

    parts = ds.map_batches(block_bloom, batch_format="pyarrow").take_all()
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for row in parts:
        bits |= np.frombuffer(row["bm"], dtype=np.uint8)
    return bits


# Build-side predicate for the demo query: "parts with no shipment in
# 1995-H1" — epoch-µs bounds mirrored literally in the SQL oracle.
_SHIP_LO = 788_918_400_000_000  # 1995-01-01
_SHIP_HI = 804_556_800_000_000  # 1995-07-01


def bloom_antijoin(sf_dir: str):
    """Parts with NO lineitem shipped in 1995-H1 — NOT EXISTS evaluated as
    a Bloom-prefiltered exact anti-join. Probe rows the build-side Bloom
    proves absent are emitted directly (zero shuffle); only the maybe-set
    enters the cogroup check, against a build side pre-pruned by a second
    Bloom over the maybe keys. Exact by construction — both oracles below
    see identical rows."""
    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_shipdate"])

    def build_keys(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy()
        k = t.column("l_partkey").to_numpy()
        k = np.unique(k[(us >= _SHIP_LO) & (us < _SHIP_HI)])
        return pa.table({"key": pa.array(k, pa.int64())})

    # per-block distinct keys of the filtered build side (map-side combiner)
    bkeys = li.map_batches(build_keys, batch_format="pyarrow").materialize()
    b1_ref = ray.put(_collect_bloom(bkeys, "key"))

    def probe(t: pa.Table) -> pa.Table:
        bits = _fetch_broadcast(b1_ref)
        k = t.column("p_partkey").to_numpy()
        return t.append_column("maybe", pa.array(_bloom_member(bits, k)))

    probed = part.map_batches(probe, batch_format="pyarrow").materialize()

    def split(want: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t.column("maybe")
            return t.filter(m if want else pc.invert(m)).drop_columns(["maybe"])

        return probed.map_batches(f, batch_format="pyarrow")

    direct, maybe = split(False), split(True)

    # second bloom: prune the build side down to ~the maybe-key domain
    b2_ref = ray.put(_collect_bloom(maybe, "p_partkey"))

    def prune_build(t: pa.Table) -> pa.Table:
        bits = _fetch_broadcast(b2_ref)
        k = t.column("key").to_numpy()
        k = k[_bloom_member(bits, k)]
        n = len(k)
        return pa.table({
            "key": pa.array(k, pa.int64()),
            "p_name": pa.nulls(n, pa.string()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
        })

    def tag_probe(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t.column("p_partkey"),
            "p_name": t.column("p_name"),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    both = maybe.map_batches(tag_probe, batch_format="pyarrow").union(
        bkeys.map_batches(prune_build, batch_format="pyarrow")
    )

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        if (g["side"] == 1).any():
            g = g.iloc[0:0]
        out = g[g["side"] == 0][["key", "p_name"]]
        return out.rename(columns={"key": "p_partkey"})

    survivors = both.groupby("key").map_groups(_pd_arrow(keep), batch_format="pandas")
    out = pd.concat(
        [direct.to_pandas(), survivors.to_pandas()], ignore_index=True
    )
    out["p_partkey"] = out["p_partkey"].astype("int64")
    return out


SQL_BLOOM_ANTIJOIN = """
SELECT p_partkey, p_name FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p_partkey
    AND epoch_us(l_shipdate) >= 788918400000000
    AND epoch_us(l_shipdate) < 804556800000000
)
"""


# -- distributed Pearson correlation from integer moments ----------------------


def corr_moments(sf_dir: str):
    """Per-(returnflag, linestatus) Pearson correlation of quantity vs
    discount, computed from exact integer moment sums. One map pass combines
    moments inside each block (per-block rows: one per group, not per data
    row), one groupby over the 4-value group domain sums partials, and the
    final r_ppm = floor(1e6·num/√(den1·den2)) is the same IEEE-double
    expression in both engines applied to identical integers — so even the
    float step is bit-stable. Moments stay in int64 through sf100 (bounds
    in module docstring)."""
    li = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pylist(),
            "l_linestatus": t.column("l_linestatus").to_pylist(),
        })
        x = t.column("l_quantity").to_numpy().astype(np.int64)
        y = np.rint(t.column("l_discount").to_numpy() * 100).astype(np.int64)
        df["n"] = 1
        df["sx"], df["sy"] = x, y
        df["sxx"], df["syy"], df["sxy"] = x * x, y * y, x * y
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    summed = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
    )
    n = summed["n"].to_numpy()
    sx, sy = summed["sx"].to_numpy(), summed["sy"].to_numpy()
    num = n * summed["sxy"].to_numpy() - sx * sy
    den1 = n * summed["sxx"].to_numpy() - sx * sx
    den2 = n * summed["syy"].to_numpy() - sy * sy
    r_ppm = np.array([
        (math.floor(1_000_000.0 * nu / math.sqrt(float(d1) * float(d2)))
         if d1 > 0 and d2 > 0 else None)
        for nu, d1, d2 in zip(num.tolist(), den1.tolist(), den2.tolist())
    ], dtype=object)
    out = summed[["l_returnflag", "l_linestatus", "n"]].copy()
    out["num"], out["den1"], out["den2"] = num, den1, den2
    out["r_ppm"] = pd.array(r_ppm, dtype="Int64")
    return out


SQL_CORR_MOMENTS = """
WITH q AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT l_returnflag, l_linestatus, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
  FROM q GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, n,
       CAST(n*sxy - sx*sy AS BIGINT) AS num,
       CAST(n*sxx - sx*sx AS BIGINT) AS den1,
       CAST(n*syy - sy*sy AS BIGINT) AS den2,
       CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
         CAST(floor(1000000.0 * (n*sxy - sx*sy)
              / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                     * CAST(n*syy - sy*sy AS DOUBLE))) AS BIGINT)
       END AS r_ppm
FROM m
"""


# -- TTL recrawl dedup ---------------------------------------------------------

_TTL_US = 604_800_000_000  # 7-day TTL window (epoch-µs), literal in the SQL


def ttl_dedup(sf_dir: str):
    """First event per (user, event_type, 7-day TTL window) — the recrawl-
    TTL primitive: a key seen within the window is not fetched again; the
    survivor is the window's earliest event (ties on identical timestamps
    broken by min event_id).

    Shape: per-block keep-first pre-reduce (vectorized drop_duplicates) so
    the shuffle moves ≤ one row per key per block, then Min(ts) per key,
    an inner join back on the key, and Min(event_id) over the ts-matching
    rows — the aggregate+join shape that beat per-key map_groups 3× at 60k
    tiny groups (BASELINE.md)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def reduce_block(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(),
            "event_type": t.column("event_type").to_pylist(),
            "ts_us": pc.cast(t.column("ts"), pa.int64()).to_numpy(),
            "event_id": t.column("event_id").to_numpy(),
        })
        df["w"] = df["ts_us"] // _TTL_US
        df = df.sort_values(["ts_us", "event_id"], kind="mergesort")
        df = df.drop_duplicates(["user_id", "event_type", "w"], keep="first")
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    reduced = ev.map_batches(reduce_block, batch_format="pyarrow").materialize()
    firsts = reduced.groupby(["user_id", "event_type", "w"]).aggregate(
        Min("ts_us", alias_name="first_ts")
    )
    j = reduced.join(
        firsts, "inner", num_partitions=8,
        on=("user_id", "event_type", "w"),
        right_on=("user_id", "event_type", "w"),
    )
    out = (
        j.map_batches(
            lambda t: t.filter(pc.equal(t["ts_us"], t["first_ts"])),
            batch_format="pyarrow",
        )
        .groupby(["user_id", "event_type", "w"])
        .aggregate(Min("event_id", alias_name="first_event_id"))
        .to_pandas()
    )
    for c in ("user_id", "w", "first_event_id"):
        out[c] = out[c].astype("int64")
    return out


SQL_TTL_DEDUP = f"""
WITH e AS (
  SELECT user_id, event_type,
         epoch_us(ts) // {_TTL_US} AS w,
         epoch_us(ts) AS ts_us, event_id
  FROM events
), m AS (
  SELECT user_id, event_type, w, min(ts_us) AS first_ts
  FROM e GROUP BY 1, 2, 3
)
SELECT e.user_id, e.event_type, e.w, min(e.event_id) AS first_event_id
FROM e JOIN m USING (user_id, event_type, w)
WHERE e.ts_us = m.first_ts
GROUP BY 1, 2, 3
"""


# -- salted hot-key join --------------------------------------------------------

_SALTS = 8


def salted_segment_revenue(sf_dir: str):
    """Revenue (event value, cents) per customer market segment — a
    fact⋈dim join where every dim key is hot (150 users absorb the whole
    events stream). The dim side is replicated once per salt and the fact
    side picks salt = event_id % _SALTS, so the join key (key, salt)
    spreads each hot key over _SALTS partitions; the post-join rollup is a
    4-row groupby. Oracle is the plain unsalted join — salting must be
    invisible in the result."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def fact(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        return pa.table({
            "key": t.column("user_id"),
            "salt": pa.array(eid % _SALTS, pa.int64()),
            "cents": pa.array(
                np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
            ),
        })

    def dim(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy()
        seg = t.column("c_mktsegment").to_pylist()
        return pa.table({
            "key": pa.array(np.repeat(k, _SALTS), pa.int64()),
            "salt": pa.array(np.tile(np.arange(_SALTS, dtype=np.int64), len(k))),
            "c_mktsegment": pa.array(np.repeat(np.asarray(seg, object), _SALTS)),
        })

    j = ev.map_batches(fact, batch_format="pyarrow").join(
        cust.map_batches(dim, batch_format="pyarrow"),
        "inner", num_partitions=8,
        on=("key", "salt"), right_on=("key", "salt"),
    )
    out = (
        j.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_events"),
                   Sum("cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    for c in ("n_events", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out


SQL_SALTED_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1
"""


# -- deterministic weighted sampling -------------------------------------------

_WS_K = 100


def weighted_sample(sf_dir: str):
    """Deterministic weighted corpus sample (training-data mixing): each
    document gets priority = md5_64(doc_id) // weight — a longer document
    (higher weight) gets a proportionally smaller priority, i.e. a higher
    chance to land in the global bottom-K (the integer-exact cousin of
    A-ES exponential-jump sampling; stable under re-runs and growth).

    Shape: priorities are computed map-side and each block pre-reduces to
    its local bottom-K, so the global sort sees ≤ K·blocks rows, never the
    corpus. The same rule is reproduced verbatim in SQL (md5 hex prefix →
    UBIGINT), so the sample is bit-identical in both engines."""
    from .mlqueries import _docs

    ds = _docs(sf_dir)

    def prio(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        pr, ws = [], []
        for i, x in zip(ids, texts):
            w = 1 + len((x or "").encode()) // 200
            # 60-bit hash (15 hex chars): priority fits BIGINT at w=1,
            # so neither engine ever range-errors before the LIMIT
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            pr.append(h // w)
            ws.append(w)
        df = pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "weight": np.asarray(ws, dtype=np.int64),
            "priority": np.asarray(pr, dtype=np.int64),
        })
        # per-block bottom-K pre-reduction: the global sort never sees more
        # than K rows per block
        df = df.nsmallest(_WS_K, ["priority", "doc_id"])
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    out = (
        ds.map_batches(prio, batch_format="pyarrow")
        .sort(["priority", "doc_id"]).limit(_WS_K).to_pandas()
    )
    out["priority"] = out["priority"].astype("int64")
    return out


SQL_WEIGHTED_SAMPLE = f"""
WITH w AS (
  SELECT doc_id,
         1 + octet_length(encode(coalesce(text, ''))) // 200 AS weight,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
              // (1 + octet_length(encode(coalesce(text, ''))) // 200)
              AS BIGINT) AS priority
  FROM documents
)
SELECT doc_id, weight, priority FROM w
ORDER BY priority, doc_id LIMIT {_WS_K}
"""


# -- integer-exact daily anomaly detection --------------------------------------


def daily_anomalies(sf_dir: str):
    """Days where an event type's count deviates from that type's own mean
    by more than 2 population standard deviations — the monitoring/alerting
    read path (reference src/alerts/alert_engine.py evaluates thresholds
    over daily aggregates) as a pure integer rule:
        (cnt·nd − tot)² > 4·(nd·ssq − tot²)
    which is |cnt − μ| > 2σ with both sides multiplied by nd², so no float
    ever appears and both engines agree exactly.

    Shape: one groupby to daily counts, one groupby over the (tiny) type
    domain for the moments, one broadcast-size hash join back — the per-day
    table never moves twice."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def day_of(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "day": pc.divide(pc.cast(t.column("ts"), pa.int64()),
                             86_400_000_000),
        })

    daily = (
        ev.map_batches(day_of, batch_format="pyarrow")
        .groupby(["event_type", "day"]).aggregate(Count(alias_name="cnt"))
        .materialize()
    )

    def moments(t: pa.Table) -> pa.Table:
        c = t.column("cnt").to_numpy().astype(np.int64)
        df = pd.DataFrame({"event_type": t.column("event_type").to_pylist()})
        df["nd"], df["tot"], df["ssq"] = 1, c, c * c
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(), preserve_index=False
        ).replace_schema_metadata(None)

    m = (
        daily.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("nd", alias_name="nd"), Sum("tot", alias_name="tot"),
                   Sum("ssq", alias_name="ssq"))
        .to_pandas()
    )
    m_ref = ray.put({
        r.event_type: (int(r.nd), int(r.tot), int(r.ssq))
        for r in m.itertuples()
    })

    def flag(t: pa.Table) -> pa.Table:
        mm = _fetch_broadcast(m_ref)
        et = t.column("event_type").to_pylist()
        cnt = t.column("cnt").to_numpy().astype(np.int64)
        nd = np.array([mm[e][0] for e in et], dtype=np.int64)
        tot = np.array([mm[e][1] for e in et], dtype=np.int64)
        ssq = np.array([mm[e][2] for e in et], dtype=np.int64)
        dev = cnt * nd - tot
        keep = dev * dev > 4 * (nd * ssq - tot * tot)
        return pa.table({
            "event_type": pa.array(np.asarray(et, object)[keep]),
            "day": t.column("day").filter(pa.array(keep)),
            "cnt": pa.array(cnt[keep]),
        })

    out = daily.map_batches(flag, batch_format="pyarrow").to_pandas()
    for c in ("day", "cnt"):
        out[c] = out[c].astype("int64")
    return out


SQL_DAILY_ANOMALIES = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, count(*) AS nd, sum(cnt) AS tot, sum(cnt*cnt) AS ssq
  FROM c GROUP BY 1
)
SELECT c.event_type, c.day, c.cnt
FROM c JOIN m USING (event_type)
WHERE (c.cnt*m.nd - m.tot)*(c.cnt*m.nd - m.tot) > 4*(m.nd*m.ssq - m.tot*m.tot)
"""


# -- ordered string-agg digest ---------------------------------------------------


def event_digest(sf_dir: str):
    """Per-day digest string: the top-3 event types by count, comma-joined
    in rank order (ties by type name) plus their combined count — ordered
    list aggregation (string_agg ... ORDER BY), the shape behind
    'assemble a per-key summary document'. Day count is calendar-bounded,
    so the per-day group step is provably tiny; the wide work is the one
    daily-counts groupby."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def day_of(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "day": pc.divide(pc.cast(t.column("ts"), pa.int64()),
                             86_400_000_000),
        })

    daily = (
        ev.map_batches(day_of, batch_format="pyarrow")
        .groupby(["event_type", "day"]).aggregate(Count(alias_name="cnt"))
    )

    def digest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "event_type"], ascending=[False, True],
                          kind="mergesort").head(3)
        return pd.DataFrame({
            "day": [int(g["day"].iloc[0])],
            "digest": [",".join(g["event_type"])],
            "top3_cnt": [int(g["cnt"].sum())],
        })

    out = daily.groupby("day").map_groups(_pd_arrow(digest), batch_format="pandas").to_pandas()
    for c in ("day", "top3_cnt"):
        out[c] = out[c].astype("int64")
    return out


SQL_EVENT_DIGEST = """
WITH c AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
), r AS (
  SELECT day, event_type, cnt,
         row_number() OVER (PARTITION BY day ORDER BY cnt DESC, event_type) AS rnk
  FROM c
)
SELECT day, string_agg(event_type, ',' ORDER BY rnk) AS digest,
       CAST(sum(cnt) AS BIGINT) AS top3_cnt
FROM r WHERE rnk <= 3 GROUP BY day
"""


# -- relational division ----------------------------------------------------------


def users_every_day(sf_dir: str):
    """Relational division: users active on EVERY day of the span ('for
    all' containment — the operator classic inventories miss). Stage 1
    distinct-reduces to (user, day) pairs map-side before ONE groupby;
    stage 2 compares each user's day count to the global day count, which
    arrives as a broadcast scalar from a Dataset aggregate (no driver
    materialization of the pair set)."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(),
            "day": pc.cast(t.column("ts"), pa.int64()).to_numpy()
                   // 86_400_000_000,
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    p = ev.map_batches(pairs, batch_format="pyarrow").materialize()
    n_days = p.map_batches(
        lambda t: pa.table({"day": pc.unique(t.column("day"))}),
        batch_format="pyarrow",
    ).groupby("day").aggregate(Count(alias_name="c")).count()

    # distinct (user, day) then per-user day count == global day count
    per_user = (
        p.groupby(["user_id", "day"]).aggregate(Count(alias_name="_c"))
        .groupby("user_id").aggregate(Count(alias_name="n_days"))
    )

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("n_days"), n_days))

    out = per_user.map_batches(keep, batch_format="pyarrow").to_pandas()
    if out.empty:  # empty Dataset.to_pandas() drops the schema entirely
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "n_days": pd.Series([], dtype="int64")})
    for c in ("user_id", "n_days"):
        out[c] = out[c].astype("int64")
    return out


SQL_USERS_EVERY_DAY = """
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
)
SELECT user_id, count(*) AS n_days
FROM p GROUP BY 1
HAVING count(*) = (SELECT count(DISTINCT epoch_us(ts) // 86400000000) FROM events)
"""


# -- full-outer-join classification -------------------------------------------


def full_outer_activity(sf_dir: str):
    """Full-outer-join coverage classification: every key in customer ∪
    events classified as both / customer_only / event_only, with class
    counts. The cogroup generalization of the anti-join: both sides reduce
    to distinct keys map-side, hash-bucket by key, and ONE vectorized
    pandas outer-merge (indicator=True) per bucket does the classification
    — no per-key Python groups, no Ray outer-join operator needed."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    ev = _read(sf_dir, "events", columns=["user_id"])

    def side(col: str, tag: int):
        def f(t: pa.Table) -> pa.Table:
            k = pc.cast(pc.unique(t[col]), pa.int64())
            return pa.table({
                "k": k,
                "side": pa.array(np.full(len(k), tag, dtype=np.int8)),
                "kb": pc.bit_wise_and(k, 255),
            })
        return f

    both = cust.map_batches(side("c_custkey", 0), batch_format="pyarrow").union(
        ev.map_batches(side("user_id", 1), batch_format="pyarrow")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        c = g.loc[g["side"] == 0, ["k"]].drop_duplicates()
        e = g.loc[g["side"] == 1, ["k"]].drop_duplicates()
        m = c.merge(e, on="k", how="outer", indicator=True)
        cls = m["_merge"].astype(str).map({
            "left_only": "customer_only", "right_only": "event_only",
            "both": "both",
        })
        out = cls.value_counts().rename_axis("cls").reset_index(name="n")
        out["cls"] = out["cls"].astype(str)
        return out[out["n"] > 0].reset_index(drop=True)

    out = (
        both.groupby("kb").map_groups(_pd_arrow(classify), batch_format="pandas")
        .groupby("cls").aggregate(Sum("n", alias_name="n_keys"))
    )
    df = out.to_pandas()
    df["cls"] = df["cls"].astype(str)
    df["n_keys"] = df["n_keys"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


SQL_FULL_OUTER_ACTIVITY = """
WITH c AS (SELECT DISTINCT c_custkey AS k FROM customer),
e AS (SELECT DISTINCT user_id AS k FROM events),
j AS (
  SELECT CASE WHEN c.k IS NULL THEN 'event_only'
              WHEN e.k IS NULL THEN 'customer_only'
              ELSE 'both' END AS cls
  FROM c FULL OUTER JOIN e ON c.k = e.k
)
SELECT cls, CAST(count(*) AS BIGINT) AS n_keys FROM j GROUP BY 1
"""


# -- CUBE rollup ---------------------------------------------------------------


def cube_revenue(sf_dir: str):
    """GROUP BY CUBE (returnflag, linestatus) over quantized lineitem
    revenue: all four grouping sets, rolled-up dims marked 'ALL'. The
    distributed CUBE discipline: aggregate the FINEST grain once (one
    shuffle over the bounded 6-cell domain), then derive the coarser sets
    from that tiny table on the driver — never 4 passes over the fact."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                        "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({
            "rf": t["l_returnflag"],
            "ls": t["l_linestatus"],
            "cents": pc.cast(pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)),
                             pa.int64()),
        })

    fine = (
        li.map_batches(cents, batch_format="pyarrow")
        .groupby(["rf", "ls"])
        .aggregate(Sum("cents", alias_name="rev_cents"),
                   Count(alias_name="n_rows"))
        .to_pandas()
    )
    by_rf = fine.groupby("rf", as_index=False)[["rev_cents", "n_rows"]].sum()
    by_rf["ls"] = "ALL"
    by_ls = fine.groupby("ls", as_index=False)[["rev_cents", "n_rows"]].sum()
    by_ls["rf"] = "ALL"
    total = pd.DataFrame({
        "rf": ["ALL"], "ls": ["ALL"],
        "rev_cents": [fine["rev_cents"].sum()],
        "n_rows": [fine["n_rows"].sum()],
    })
    out = pd.concat([fine, by_rf, by_ls, total], ignore_index=True)[
        ["rf", "ls", "rev_cents", "n_rows"]]
    for c in ("rev_cents", "n_rows"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


SQL_CUBE_REVENUE = """
WITH c AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem
)
SELECT CASE WHEN GROUPING(rf) = 1 THEN 'ALL' ELSE rf END AS rf,
       CASE WHEN GROUPING(ls) = 1 THEN 'ALL' ELSE ls END AS ls,
       CAST(sum(cents) AS BIGINT) AS rev_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM c GROUP BY CUBE (rf, ls)
"""


# -- join-key skew profile -----------------------------------------------------


def key_skew_profile(sf_dir: str):
    """Join-key skew diagnostic: the distribution of lineitem fan-out per
    orderkey as (lines_per_order, n_orders) — the profile a planner reads
    before choosing broadcast vs salt vs plain hash join. Per-key counts
    run in the bucketed-combiner shape (orderkey domain is row-sized); the
    histogram groupby runs on the bounded fan-out domain."""
    from .queries import _bucketed_agg

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "one": pa.array(np.ones(len(t), dtype=np.int64)),
        })

    per_key = _bucketed_agg(
        li.map_batches(one, batch_format="pyarrow"),
        ["l_orderkey"], {"lines_per_order": ("one", "sum")},
    )
    out = (
        per_key.groupby("lines_per_order")
        .aggregate(Count(alias_name="n_orders"))
    )
    df = out.to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


SQL_KEY_SKEW_PROFILE = """
WITH c AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS lines_per_order
  FROM lineitem GROUP BY 1
)
SELECT lines_per_order, CAST(count(*) AS BIGINT) AS n_orders
FROM c GROUP BY 1
"""


# -- referential-integrity audit -----------------------------------------------


def fk_violations(sf_dir: str):
    """Referential-integrity audit across two foreign-key edges in one
    query: lineitem.l_orderkey → orders.o_orderkey and events.user_id →
    customer.c_custkey; per edge, total child rows and violating rows.

    Shape: each parent key set reduces to a sorted int64 array and ships
    once via ray.put (orders is ~1.2 MB per million keys; past broadcast
    size the bloom_antijoin prefilter is the drop-in replacement — same
    verify shape); the child side streams through one vectorized
    searchsorted membership map per block and reduces to per-block count
    partials. Zero shuffles."""
    from ..stages.dedup import _fetch_broadcast

    def parent_keys(table: str, col: str) -> np.ndarray:
        t = _read(sf_dir, table, columns=[col]).to_pandas()
        return np.sort(t[col].to_numpy().astype(np.int64))

    edges = [
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey",
         parent_keys("orders", "o_orderkey")),
        ("events.user->customer", "events", "user_id",
         parent_keys("customer", "c_custkey")),
    ]
    rows = []
    for name, child, ccol, pkeys in edges:
        ref = ray.put(pkeys)

        def check(t: pa.Table, _ref=ref, _c=ccol) -> pa.Table:
            pk = _fetch_broadcast(_ref)
            v = t[_c].to_numpy().astype(np.int64)
            pos = np.minimum(np.searchsorted(pk, v), len(pk) - 1)
            bad = pk[pos] != v
            return pa.table({
                "n_rows": pa.array([len(v)], pa.int64()),
                "n_violations": pa.array([int(bad.sum())], pa.int64()),
            })

        agg = (
            _read(sf_dir, child, columns=[ccol])
            .map_batches(check, batch_format="pyarrow")
            .aggregate(Sum("n_rows", alias_name="n"),
                       Sum("n_violations", alias_name="v"))
        )
        rows.append((name, int(agg["n"]), int(agg["v"])))
    return pa.table({
        "edge": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_violations": pa.array([r[2] for r in rows], pa.int64()),
    })


SQL_FK_VIOLATIONS = """
SELECT 'lineitem.orderkey->orders' AS edge,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'events.user->customer',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


RELSCALE_REGISTRY = {
    "fk_violations": (fk_violations, SQL_FK_VIOLATIONS),
    "full_outer_activity": (full_outer_activity, SQL_FULL_OUTER_ACTIVITY),
    "cube_revenue": (cube_revenue, SQL_CUBE_REVENUE),
    "key_skew_profile": (key_skew_profile, SQL_KEY_SKEW_PROFILE),
    "bloom_antijoin": (bloom_antijoin, SQL_BLOOM_ANTIJOIN),
    "corr_moments": (corr_moments, SQL_CORR_MOMENTS),
    "ttl_dedup": (ttl_dedup, SQL_TTL_DEDUP),
    "salted_segment_revenue": (salted_segment_revenue, SQL_SALTED_SEGMENT_REVENUE),
    "weighted_sample": (weighted_sample, SQL_WEIGHTED_SAMPLE),
    "daily_anomalies": (daily_anomalies, SQL_DAILY_ANOMALIES),
    "event_digest": (event_digest, SQL_EVENT_DIGEST),
    "users_every_day": (users_every_day, SQL_USERS_EVERY_DAY),
}
