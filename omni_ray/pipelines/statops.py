"""Order-statistics, stream-analytics and graph operators, round 3 batch 7:
context-window chunking, 2-D skyline (pareto), daily OHLC, triangle
counting, 7-day rolling distinct users, and winsorized robust statistics.

Each operator pins a distinct 100-TB technique to an oracle-backed query:

- chunk_documents: the RAG/pretraining context-window chunker — every doc
  explodes into fixed-size overlapping token windows, fully vectorized
  (np.repeat + arange-minus-offsets), zero shuffle, zero Python row loop.
- pareto_orders: distributed 2-D skyline. The dominance frontier of
  (price, date) only depends on the per-day max-price table — a bounded-
  domain groupby — plus a suffix max computed once on the driver and
  broadcast. No O(n^2) pair join, no global sort.
- daily_ohlc: the distributed argmin/argmax combiner — first/last/min/max
  per day computed as per-block partials (one row per block x day) reduced
  in a tiny map_groups; raw events cross the shuffle never.
- triangle_count: co-occurrence graph build (bucketed self-merge, not a
  per-order Python loop) -> oriented wedges from the lower endpoint ->
  hash-join against the edge set. The join carries wedge keys, not
  adjacency lists; hub skew is bounded by orientation (out-degree of the
  LOWER endpoint only).
- rolling_dau_7d: sliding distinct-count via dedup-then-expand: the
  (user, day) distinct pairs (already reduced) each emit 7 window rows
  map-side; two groupbys on reduced keys, never a range self-join.
- winsorized_stats: exact p05/p95 clipping without a global sort — the
  value-domain histogram CDF (same trick as global_percentile) finds the
  cut values; a broadcast clamp + integer partial sums finish the job.

Reference anchors: the reference's dashboard aggregates (src/web/dashboard.py)
stop at per-day counts; these extend the same events/documents tables with
the order-statistics and graph shapes a training-data pipeline needs.
All arithmetic is integer end-to-end (cents, token counts, epoch days) so
Ray and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..stages.dedup import _fetch_broadcast
from .queries import _read, _pd_arrow

_DAY_US = 86_400_000_000


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """floor(x*100 + 0.5) as int64 — the repo's cross-engine quantizer."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


# -- chunk_documents ----------------------------------------------------------

CHUNK_SIZE = 256  # tokens per training/RAG chunk (mirrored in the SQL)
CHUNK_STRIDE = 224  # hop between chunk starts (overlap = 32)


def chunk_documents(sf_dir: str):
    """Context-window chunking: each document's whitespace tokens are cut
    into CHUNK_SIZE-token windows every CHUNK_STRIDE tokens (32-token
    overlap); emit (doc_id, chunk_idx, n_tokens) per window. doc_pack packs
    whole documents into sequences; this is the complementary splitter for
    documents longer than the context window.

    Shape at scale: one map pass, zero shuffle. Token counting is a
    vectorized Arrow regex kernel; the explode is np.repeat + a cumsum
    arange (no per-doc Python loop, no list-of-lists materialization).
    A 100-TB corpus streams through block by block."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        tok = pc.fill_null(
            pc.count_substring_regex(t["text"], r"\S+"), 0
        ).to_numpy().astype(np.int64)
        doc = t["doc_id"].to_numpy()
        keep = tok > 0
        tok, doc = tok[keep], doc[keep]
        n_chunks = np.where(
            tok <= CHUNK_SIZE,
            1,
            1 + (tok - CHUNK_SIZE + CHUNK_STRIDE - 1) // CHUNK_STRIDE,
        ).astype(np.int64)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            })
        # chunk_idx = global arange minus each doc's start offset
        starts = np.zeros(len(doc), dtype=np.int64)
        starts[1:] = np.cumsum(n_chunks)[:-1]
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts, n_chunks)
        tok_rep = np.repeat(tok, n_chunks)
        n_tokens = np.minimum(CHUNK_SIZE, tok_rep - idx * CHUNK_STRIDE)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc, n_chunks), pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        })

    out = ds.map_batches(explode, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_CHUNK_DOCUMENTS = r"""
WITH c AS (
  SELECT doc_id,
         CASE WHEN trim(coalesce(text, '')) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
  FROM documents
), n AS (
  SELECT doc_id, tok,
         CASE WHEN tok <= 256 THEN 1 ELSE 1 + (tok - 256 + 223) // 224 END
           AS n_chunks
  FROM c WHERE tok > 0
)
SELECT doc_id, u.i AS chunk_idx,
       LEAST(256, tok - u.i * 224) AS n_tokens
FROM n, UNNEST(range(0, n_chunks)) AS u(i)
"""


# -- pareto_orders ------------------------------------------------------------


def pareto_orders(sf_dir: str):
    """2-D skyline of orders on (price, date): an order is on the pareto
    frontier iff no other order has price >= AND date >= with one strict.
    Classic formulation is an O(n^2) NOT EXISTS; the distributed shape
    exploits dimensionality: dominance only depends on the per-day max
    price (bounded-domain groupby) and its suffix max over later days.
    keep(row) = cents == daymax(day) AND cents > max over days > day.

    Shape at scale: one groupby on epoch-day (key count = calendar span),
    a driver-side suffix scan over that tiny table, one broadcast filter
    map. No pair join, no sort of the fact table."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "day": pc.divide(pc.cast(t["o_orderdate"], pa.int64()), _DAY_US),
            "price_cents": _cents(t["o_totalprice"]),
        })

    rows = ds.map_batches(prep, batch_format="pyarrow")
    daymax = (
        rows.groupby("day").aggregate(Max("price_cents", alias_name="mx"))
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    mx = daymax["mx"].to_numpy()
    later = np.full(len(mx), -1, dtype=np.int64)
    if len(mx) > 1:
        later[:-1] = np.maximum.accumulate(mx[::-1])[::-1][1:]
    dayv = daymax["day"].to_numpy().astype(np.int64)
    frontier = ray.put((dayv, mx.astype(np.int64), later))

    def keep(t: pa.Table) -> pa.Table:
        days_sorted, mx_by_day, later_by_day = _fetch_broadcast(frontier)
        day = t["day"].to_numpy()
        cents = t["price_cents"].to_numpy()
        pos = np.searchsorted(days_sorted, day)
        ok = (cents == mx_by_day[pos]) & (cents > later_by_day[pos])
        return t.filter(pa.array(ok))

    out = rows.map_batches(keep, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_PARETO_ORDERS = """
WITH c AS (
  SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders
), dm AS (
  SELECT day, max(price_cents) AS mx FROM c GROUP BY 1
), s AS (
  SELECT day, mx,
         coalesce(max(mx) OVER (ORDER BY day DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), -1) AS later_mx
  FROM dm
)
SELECT c.o_orderkey, c.day, c.price_cents
FROM c JOIN s USING (day)
WHERE c.price_cents = s.mx AND c.price_cents > s.later_mx
"""


# -- daily_ohlc ---------------------------------------------------------------


def daily_ohlc(sf_dir: str):
    """Per-day open/high/low/close over the events value stream: open =
    value of the first event (ts, event_id order), close = last, plus
    min/max/count. The distributed argmin/argmax combiner: each block
    reduces to one partial row per (block, day) carrying the extreme keys
    AND their payloads; a tiny map_groups over partials (rows = blocks x
    days, not events) finishes. Raw events never cross the shuffle."""
    ds = _read(sf_dir, "events", columns=["ts", "event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ts_us": t["ts"].cast(pa.int64()).to_numpy(),
            "event_id": t["event_id"].to_numpy(),
            "cents": _cents(t["value"]).to_numpy(),
        })
        df["day"] = df["ts_us"] // _DAY_US
        df = df.sort_values(["day", "ts_us", "event_id"], kind="mergesort")
        g = df.groupby("day", sort=False)
        out = pd.DataFrame({
            "day": np.asarray(list(g.groups.keys()), dtype=np.int64),
            "open_ts": g["ts_us"].first().to_numpy(),
            "open_id": g["event_id"].first().to_numpy(),
            "open_cents": g["cents"].first().to_numpy(),
            "close_ts": g["ts_us"].last().to_numpy(),
            "close_id": g["event_id"].last().to_numpy(),
            "close_cents": g["cents"].last().to_numpy(),
            "low_cents": g["cents"].min().to_numpy(),
            "high_cents": g["cents"].max().to_numpy(),
            "n_events": g.size().to_numpy().astype(np.int64),
        })
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        o = g.sort_values(["open_ts", "open_id"], kind="mergesort").iloc[0]
        c = g.sort_values(["close_ts", "close_id"], kind="mergesort").iloc[-1]
        return pd.DataFrame({
            "day": [int(g["day"].iloc[0])],
            "n_events": [int(g["n_events"].sum())],
            "open_cents": [int(o["open_cents"])],
            "high_cents": [int(g["high_cents"].max())],
            "low_cents": [int(g["low_cents"].min())],
            "close_cents": [int(c["close_cents"])],
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .map_groups(_pd_arrow(combine), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_DAILY_OHLC = """
WITH c AS (
  SELECT epoch_us(ts) // 86400000000 AS day, epoch_us(ts) AS ts_us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT day, cents,
         first_value(cents) OVER
           (PARTITION BY day ORDER BY ts_us, event_id) AS open_cents,
         first_value(cents) OVER
           (PARTITION BY day ORDER BY ts_us DESC, event_id DESC) AS close_cents
  FROM c
)
SELECT day, CAST(count(*) AS BIGINT) AS n_events,
       min(open_cents) AS open_cents, max(cents) AS high_cents,
       min(cents) AS low_cents, min(close_cents) AS close_cents
FROM w GROUP BY 1
"""


# -- triangle_count -----------------------------------------------------------

_TRI_BUCKETS = 256
_KEY_BASE = 1_000_000_000  # partkeys < 1e9 at every TPC-H scale this sees


def _coorder_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct undirected edges (u < v) of the part co-occurrence graph
    (parts linked when they ship in the same order), MATERIALIZED — E rows,
    the reduced graph entity every graph operator downstream reuses.

    Per-order pair generation is a bucketed SELF-MERGE (order keys hash
    into _TRI_BUCKETS groups; inside a bucket one vectorized pandas merge
    on l_orderkey emits all pairs) — the aggregate+join shape, not 10^5
    tiny per-order groups (see BASELINE.md boilerplate lesson). The global
    dedup is a SECOND bucketed map_groups (hash of the pair key ->
    _TRI_BUCKETS groups, vectorized drop_duplicates inside), NOT a
    groupby().aggregate over the pair domain: Ray's sort-based aggregate
    finalizes per key in Python, measured 15 s vs 1.3 s for the bucketed
    dedup at 117k distinct pairs (see BASELINE.md)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def order_bucket(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "b": pc.bit_wise_and(t["l_orderkey"], _TRI_BUCKETS - 1),
        })

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
        out.columns = ["u", "v"]
        out["pb"] = (out["u"].to_numpy() * _KEY_BASE
                     + out["v"].to_numpy()) % _TRI_BUCKETS
        return out.reset_index(drop=True)

    def dedup_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[["u", "v"]].drop_duplicates().reset_index(drop=True)

    return (
        li.map_batches(order_bucket, batch_format="pyarrow")
        .groupby("b").map_groups(_pd_arrow(pairs_in_bucket), batch_format="pandas")
        .groupby("pb").map_groups(_pd_arrow(dedup_in_bucket), batch_format="pandas")
        .materialize()
    )


# beyond this many edges the sorted edge-key broadcast (8 B/edge ≈ 400 MB at
# the cap) would rival a worker heap; fall back to the wedge⋈edge hash join
_TRI_EDGE_BCAST_MAX = 50_000_000


def _tri_u_bucket(t: pa.Table) -> pa.Table:
    return t.append_column("b", pc.bit_wise_and(t["u"], _TRI_BUCKETS - 1))


def _close_wedges_broadcast(edges: ray.data.Dataset) -> tuple[int, int]:
    """Wedge census with in-bucket closure: broadcast the SORTED edge-key
    array once (`ray.put` of a numpy uint64 vector — zero-copy plasma read
    in every task), generate each u-bucket's wedges by self-merge and close
    them against the keys with a vectorized searchsorted. Only per-bucket
    (n_wedges, n_triangles) partials leave the workers — the wedge set
    (40× the edge count on this graph) is never materialized or shuffled."""
    # iter_batches, not to_arrow_refs: empty shuffle partitions upstream can
    # surface as empty PANDAS blocks that to_arrow_refs returns unconverted
    keys = np.sort(np.concatenate([
        (tbl["u"].to_numpy(zero_copy_only=False) * _KEY_BASE
         + tbl["v"].to_numpy(zero_copy_only=False))
        for tbl in edges.select_columns(["u", "v"]).iter_batches(
            batch_format="pyarrow")
        if tbl.num_rows
    ] or [np.array([], dtype=np.int64)]))
    ref = ray.put(keys)

    def close_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)  # zero-copy numpy view into the object store
        m = g.merge(g, on="u")
        m = m[m["v_x"] < m["v_y"]]
        wk = m["v_x"].to_numpy() * _KEY_BASE + m["v_y"].to_numpy()
        if ks.size and wk.size:
            pos = np.searchsorted(ks, wk)
            hit = (pos < ks.size) & (ks[np.minimum(pos, ks.size - 1)] == wk)
            n_tri = int(np.count_nonzero(hit))
        else:
            n_tri = 0
        return pd.DataFrame({"nw": [len(wk)], "nt": [n_tri]})

    parts = (
        edges.map_batches(_tri_u_bucket, batch_format="pyarrow")
        .groupby("b").map_groups(_pd_arrow(close_in_bucket), batch_format="pandas")
        .take_all()
    )
    return (sum(r["nw"] for r in parts), sum(r["nt"] for r in parts))


def _close_wedges_join(edges: ray.data.Dataset) -> tuple[int, int]:
    """Scale fallback: materialize the oriented wedge set and close it with
    a distributed hash join of wedge keys against edge keys — nothing is
    broadcast, so it holds when the edge set itself exceeds a worker heap."""

    def wedges_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="u")
        m = m[m["v_x"] < m["v_y"]]
        return pd.DataFrame({
            "wk": m["v_x"].to_numpy() * _KEY_BASE + m["v_y"].to_numpy(),
        })

    wedges = (
        edges.map_batches(_tri_u_bucket, batch_format="pyarrow")
        .groupby("b").map_groups(_pd_arrow(wedges_in_bucket), batch_format="pandas")
        .materialize()
    )
    n_wedges = wedges.count()

    def edge_keys(t: pa.Table) -> pa.Table:
        return pa.table({
            "wk": pc.add(pc.multiply(t["u"], _KEY_BASE), t["v"]),
            "_e": pa.array(np.ones(len(t), dtype=np.int8)),
        })

    # size the hash-shuffle aggregator pool to the cluster: a fixed count
    # above available CPUs starves the pool at small sessions (measured
    # deadlock at num_partitions=32 with num_cpus=4 — aggregator actors
    # held every slot while a task waited for one)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    closed = wedges.join(
        edges.map_batches(edge_keys, batch_format="pyarrow"),
        join_type="inner", on=("wk",),
        num_partitions=max(2, min(32, cpus // 4)),
    )
    return (n_wedges, closed.count())


def triangle_count(sf_dir: str):
    """Triangle census of the part co-occurrence graph: n_edges, oriented
    n_wedges, n_triangles over the _coorder_edges entity.

    Wedges come from the LOWER endpoint's out-neighborhood only
    (orientation bounds hub skew: a node's wedge count depends on its
    out-degree among higher ids, not its full degree), generated by a
    bucketed self-merge. Closure auto-switches on edge count: below
    _TRI_EDGE_BCAST_MAX the sorted edge-key array is broadcast and wedges
    close in-bucket without ever shipping (measured 20 s → ~9 s at sf0.1,
    where the 49M-wedge shuffle+join dominated); above it, the distributed
    wedge⋈edge hash join (tests pin both paths equal)."""
    edges = _coorder_edges(sf_dir)
    n_edges = edges.count()
    if n_edges <= _TRI_EDGE_BCAST_MAX:
        n_wedges, n_tri = _close_wedges_broadcast(edges)
    else:
        n_wedges, n_tri = _close_wedges_join(edges)
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
    })


SQL_TRIANGLE_COUNT = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
  (SELECT CAST(count(*) AS BIGINT)
     FROM pairs e1 JOIN pairs e2
       ON e1.u = e2.u AND e1.v < e2.v) AS n_wedges,
  (SELECT CAST(count(*) AS BIGINT)
     FROM pairs e1 JOIN pairs e2
       ON e1.u = e2.u AND e1.v < e2.v
     JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
"""


# -- rolling_dau_7d -----------------------------------------------------------


def rolling_dau_7d(sf_dir: str):
    """7-day rolling distinct active users per day: for every day with
    activity, count users active in [day-6, day]. Sliding distinct-count
    via dedup-then-expand: first reduce to distinct (user, day) pairs (one
    groupby on already-small keys), then each pair emits 7 (user, window)
    rows map-side (Arrow concat of shifted copies), dedup again, count.
    Never a range self-join; both shuffles move reduced keys only."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def day_of(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            "ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # (user, day) domain is row-sized -> bucketed vectorized distinct,
        # not groupby().aggregate (BASELINE.md bucketed-agg note)
        return g[["user_id", "day", "ub"]].drop_duplicates(
            ["user_id", "day"]).reset_index(drop=True)

    pairs = (
        ds.map_batches(day_of, batch_format="pyarrow")
        .groupby("ub").map_groups(_pd_arrow(distinct_pairs), batch_format="pandas")
        .materialize()  # |users x active-days| rows; reused for the day set
    )
    days_arr = np.sort(
        pairs.groupby("day").aggregate(Count(alias_name="_n"))
        .to_pandas()["day"].to_numpy().astype(np.int64)
    )
    days_ref = ray.put(days_arr)

    def expand(t: pa.Table) -> pa.Table:
        dsorted = _fetch_broadcast(days_ref)
        parts = []
        for shift in range(7):
            w = pc.add(t["day"], shift)
            parts.append(pa.table({
                "user_id": t["user_id"], "wday": w, "ub": t["ub"],
            }))
        both = pa.concat_tables(parts)
        w = both["wday"].to_numpy()
        pos = np.searchsorted(dsorted, w)
        pos_c = np.minimum(pos, len(dsorted) - 1)
        keep = pa.array(dsorted[pos_c] == w)
        return both.filter(keep)

    def distinct_windows(g: pd.DataFrame) -> pd.DataFrame:
        return g[["user_id", "wday"]].drop_duplicates().reset_index(drop=True)

    out = (
        pairs.map_batches(expand, batch_format="pyarrow")
        .groupby("ub").map_groups(_pd_arrow(distinct_windows), batch_format="pandas")
        .groupby("wday").aggregate(Count(alias_name="rolling_users"))
    )
    df = out.to_pandas().rename(columns={"wday": "day"})
    for c in ("day", "rolling_users"):
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


SQL_ROLLING_DAU_7D = """
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), days AS (SELECT DISTINCT day FROM p),
e AS (
  SELECT DISTINCT p.user_id, p.day + u.i AS wday
  FROM p, UNNEST(range(0, 7)) AS u(i)
)
SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS rolling_users
FROM days d JOIN e ON e.wday = d.day
GROUP BY 1
"""


# -- winsorized_stats ---------------------------------------------------------


def winsorized_stats(sf_dir: str):
    """Exact p05/p95 winsorization of the events value stream without a
    global sort: the value-domain histogram (groupby on cents — distinct
    VALUES, not rows) comes to the driver as a CDF; the cut values are the
    elements at 1-based ranks ceil(0.05 n) and ceil(0.95 n); a broadcast
    clamp map + integer partial sums produce the winsorized total and clip
    counts. Same sort-free-rank trick as global_percentile, applied to the
    robust-statistics primitive every quality-score pipeline needs."""
    ds = _read(sf_dir, "events", columns=["value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"cents": _cents(t["value"])})

    cents_ds = ds.map_batches(to_cents, batch_format="pyarrow").materialize()
    hist = (
        cents_ds.groupby("cents").aggregate(Count(alias_name="cnt"))
        .to_pandas().sort_values("cents").reset_index(drop=True)
    )
    counts = hist["cnt"].to_numpy().astype(np.int64)
    values = hist["cents"].to_numpy().astype(np.int64)
    n = int(counts.sum())
    cum = np.cumsum(counts)
    k_lo = (5 * n + 99) // 100
    k_hi = (95 * n + 99) // 100
    lo = int(values[np.searchsorted(cum, k_lo)])
    hi = int(values[np.searchsorted(cum, k_hi)])

    def clamp_partial(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy()
        return pa.table({
            "wsum": pa.array([int(np.clip(c, lo, hi).sum())], pa.int64()),
            "clip_low": pa.array([int((c < lo).sum())], pa.int64()),
            "clip_high": pa.array([int((c > hi).sum())], pa.int64()),
        })

    agg = (
        cents_ds.map_batches(clamp_partial, batch_format="pyarrow")
        .aggregate(Sum("wsum", alias_name="wsum_cents"),
                   Sum("clip_low", alias_name="n_clip_low"),
                   Sum("clip_high", alias_name="n_clip_high"))
    )
    return pa.table({
        "n_events": pa.array([n], pa.int64()),
        "lo_cents": pa.array([lo], pa.int64()),
        "hi_cents": pa.array([hi], pa.int64()),
        "wsum_cents": pa.array([int(agg["wsum_cents"])], pa.int64()),
        "n_clip_low": pa.array([int(agg["n_clip_low"])], pa.int64()),
        "n_clip_high": pa.array([int(agg["n_clip_high"])], pa.int64()),
    })


SQL_WINSORIZED_STATS = """
WITH c AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events
), stats AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c),
lo AS (SELECT r.cents AS lo FROM r CROSS JOIN stats
       WHERE r.rn = (5 * stats.n + 99) // 100),
hi AS (SELECT r.cents AS hi FROM r CROSS JOIN stats
       WHERE r.rn = (95 * stats.n + 99) // 100)
SELECT stats.n AS n_events, lo.lo AS lo_cents, hi.hi AS hi_cents,
       CAST(sum(CASE WHEN c.cents < lo.lo THEN lo.lo
                     WHEN c.cents > hi.hi THEN hi.hi
                     ELSE c.cents END) AS BIGINT) AS wsum_cents,
       CAST(sum(CASE WHEN c.cents < lo.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_low,
       CAST(sum(CASE WHEN c.cents > hi.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_high
FROM c CROSS JOIN stats CROSS JOIN lo CROSS JOIN hi
GROUP BY 1, 2, 3
"""


# -- late_events --------------------------------------------------------------

_WM_LAG_US = 60_000_000  # 1-minute lateness threshold (mirrored in SQL)


def late_events(sf_dir: str):
    """Watermark / out-of-order detection: an event is LATE when its ts
    lags the running max ts over all previously ARRIVED events by more
    than 1 minute. Per-day counts + worst lag. The synthetic events table
    is perfectly time-ordered, so arrival order is simulated with a
    deterministic +/-60 s jitter both engines compute identically in
    integer arithmetic: ak = ts_us + (event_id*2654435761) % 2^32
    % 120000001 - 60000000 (Knuth multiplicative hash; no int64 overflow
    for event_id < 4.2e9 — the jitter modulus guards the rest).

    The distributed prefix-max scan (same bucket-partials shape as
    doc_pack's prefix-sum): arrival keys fall into contiguous one-hour
    buckets; one map pass emits per-bucket max-ts partials (tiny table →
    driver exclusive prefix max → broadcast); each bucket then scans
    locally inside its group, ordered by (ak, event_id) — running max is
    np.maximum.accumulate, no global sort, no window over the full
    stream. Bucketing by ARRIVAL key keeps the scan correct: every
    earlier arrival is either in an earlier bucket (covered by the base)
    or earlier inside this one (covered by the accumulate)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy()
        eid = t["event_id"].to_numpy()
        jitter = (eid * 2654435761) % 4294967296 % 120000001 - 60000000
        ak = ts_us + jitter
        return pa.table({
            "event_id": t["event_id"],
            "ts_us": pa.array(ts_us, pa.int64()),
            "ak": pa.array(ak, pa.int64()),
            "bucket": pa.array(ak // 3_600_000_000, pa.int64()),
        })

    rows = ds.map_batches(prep, batch_format="pyarrow").materialize()
    bmax = (
        rows.groupby("bucket").aggregate(Max("ts_us", alias_name="mx"))
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    )
    buckets = bmax["bucket"].to_numpy().astype(np.int64)
    mx = bmax["mx"].to_numpy().astype(np.int64)
    base = np.full(len(mx), np.iinfo(np.int64).min, dtype=np.int64)
    if len(mx) > 1:
        base[1:] = np.maximum.accumulate(mx)[:-1]
    base_ref = ray.put((buckets, base))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        bks, bases = _fetch_broadcast(base_ref)
        g = g.sort_values(["ak", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy()
        wm = np.empty_like(ts)
        wm[0] = bases[np.searchsorted(bks, int(g["bucket"].iloc[0]))]
        if len(ts) > 1:
            wm[1:] = np.maximum.accumulate(ts)[:-1]
            wm[1:] = np.maximum(wm[1:], wm[0])
        wm = np.maximum(wm, ts)  # first-ever event: watermark = own ts
        lag = wm - ts
        late = lag > _WM_LAG_US
        day = ts // _DAY_US
        out = pd.DataFrame({"day": day, "late": late.astype(np.int64),
                            "lag": np.where(late, lag, 0)})
        p = out.groupby("day", sort=True).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_lag_us=("lag", "max")).reset_index()
        return p

    out = (
        rows.groupby("bucket").map_groups(_pd_arrow(scan), batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("n_late", alias_name="n_late"),
                   Max("max_lag_us", alias_name="max_lag_us"))
    )
    df = out.to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


SQL_LATE_EVENTS = """
WITH c AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) // 86400000000 AS day,
         epoch_us(ts) + (event_id * 2654435761) % 4294967296 % 120000001
           - 60000000 AS ak
  FROM events
), w AS (
  SELECT day, ts_us,
         greatest(coalesce(max(ts_us) OVER (ORDER BY ak, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  ts_us), ts_us) AS wm
  FROM c
)
SELECT day, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN wm - ts_us > 60000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(max(CASE WHEN wm - ts_us > 60000000 THEN wm - ts_us ELSE 0 END)
            AS BIGINT) AS max_lag_us
FROM w GROUP BY 1
"""


# -- conversion_latency -------------------------------------------------------


def conversion_latency(sf_dir: str):
    """Funnel latency: per user, seconds from first 'view' to first
    'purchase' (users whose first purchase precedes their first view don't
    convert). Reports viewer/purchaser/converted counts, the exact median
    latency (lower median, rank (n+1)//2) and the max.

    Shape at scale: the per-user pivot is ONE groupby with conditional-min
    aggregates (map-side the ts is nulled out of the wrong column; Min
    skips nulls) — no (user, type) intermediate, no join; the median comes
    from the latency value-domain CDF (bounded by converted-user count),
    never a sort."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def widen(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        is_v = pc.equal(t["event_type"], "view")
        is_p = pc.equal(t["event_type"], "purchase")
        null = pa.nulls(len(t), pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "vt": pc.if_else(is_v, ts_us, null),
            "pt": pc.if_else(is_p, ts_us, null),
        })

    per_user = (
        ds.map_batches(widen, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("vt", alias_name="vt"), Min("pt", alias_name="pt"))
        .materialize()  # one row per user — the reduced entity
    )
    def valid_counts(t: pa.Table) -> pa.Table:
        return pa.table({
            "nv": pa.array([pc.count(t["vt"]).as_py()], pa.int64()),
            "np": pa.array([pc.count(t["pt"]).as_py()], pa.int64()),
        })

    vc = (
        per_user.map_batches(valid_counts, batch_format="pyarrow")
        .aggregate(Sum("nv", alias_name="nv"), Sum("np", alias_name="np"))
    )
    n_viewers, n_purchasers = int(vc["nv"]), int(vc["np"])

    def lat(t: pa.Table) -> pa.Table:
        ok = pc.and_kleene(pc.is_valid(t["vt"]),
                           pc.greater_equal(t["pt"], t["vt"]))
        t = t.filter(pc.fill_null(ok, False))
        return pa.table({
            "lat_s": pc.divide(pc.subtract(t["pt"], t["vt"]), 1_000_000),
        })

    lats = per_user.map_batches(lat, batch_format="pyarrow")
    hist = (
        lats.groupby("lat_s").aggregate(Count(alias_name="cnt"))
        .to_pandas().sort_values("lat_s").reset_index(drop=True)
    )
    counts = hist["cnt"].to_numpy().astype(np.int64)
    values = hist["lat_s"].to_numpy().astype(np.int64)
    n = int(counts.sum())
    cum = np.cumsum(counts)
    median = int(values[np.searchsorted(cum, (n + 1) // 2)]) if n else -1
    mx = int(values[-1]) if n else -1
    return pa.table({
        "n_viewers": pa.array([n_viewers], pa.int64()),
        "n_purchasers": pa.array([n_purchasers], pa.int64()),
        "n_converted": pa.array([n], pa.int64()),
        "median_latency_s": pa.array([median], pa.int64()),
        "max_latency_s": pa.array([mx], pa.int64()),
    })


SQL_CONVERSION_LATENCY = """
WITH v AS (SELECT user_id, min(epoch_us(ts)) AS vt FROM events
           WHERE event_type = 'view' GROUP BY 1),
p AS (SELECT user_id, min(epoch_us(ts)) AS pt FROM events
      WHERE event_type = 'purchase' GROUP BY 1),
j AS (SELECT (p.pt - v.vt) // 1000000 AS lat_s
      FROM v JOIN p USING (user_id) WHERE p.pt >= v.vt),
st AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
r AS (SELECT lat_s, row_number() OVER (ORDER BY lat_s) AS rn FROM j)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewers,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchasers,
       st.n AS n_converted,
       coalesce((SELECT lat_s FROM r, st WHERE rn = (st.n + 1) // 2), -1)
         AS median_latency_s,
       coalesce((SELECT max(lat_s) FROM j), -1) AS max_latency_s
FROM st
"""


# -- source_token_gini --------------------------------------------------------


def source_token_gini(sf_dir: str):
    """Corpus-balance diagnostic: Gini coefficient of total whitespace
    tokens per source, integer-exact in parts-per-million:
    gini_ppm = floor(1e6 * (2W - (n+1)S) / (nS)) where W = sum of
    rank*tokens over sources sorted by (tokens, source). The mixing-weight
    sanity check every multi-source corpus needs.

    Shape: token counting is the vectorized Arrow regex kernel; the one
    shuffle is a groupby on source (domain = source count, not docs); the
    Gini fold happens on the driver over that tiny table."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def toks(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t["source"],
            "tok": pc.cast(pc.fill_null(
                pc.count_substring_regex(t["text"], r"\S+"), 0), pa.int64()),
        })

    per_source = (
        ds.map_batches(toks, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("tok", alias_name="toks"))
        .to_pandas().sort_values(["toks", "source"]).reset_index(drop=True)
    )
    x = per_source["toks"].to_numpy().astype(np.int64)
    n = len(x)
    s = int(x.sum())
    w = int((np.arange(1, n + 1, dtype=np.int64) * x).sum())
    gini_ppm = (1_000_000 * (2 * w - (n + 1) * s)) // (n * s)
    return pa.table({
        "n_sources": pa.array([n], pa.int64()),
        "total_tokens": pa.array([s], pa.int64()),
        "gini_ppm": pa.array([int(gini_ppm)], pa.int64()),
    })


SQL_SOURCE_TOKEN_GINI = r"""
WITH d AS (
  SELECT source,
         CASE WHEN trim(coalesce(text, '')) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
  FROM documents
), s AS (
  SELECT source, CAST(sum(tok) AS BIGINT) AS toks FROM d GROUP BY 1
), r AS (
  SELECT toks, row_number() OVER (ORDER BY toks, source) AS i FROM s
), a AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(toks) AS BIGINT) AS s,
         CAST(sum(i * toks) AS BIGINT) AS w
  FROM r
)
SELECT n AS n_sources, s AS total_tokens,
       (1000000 * (2 * w - (n + 1) * s)) // (n * s) AS gini_ppm
FROM a
"""


# -- embedding_norm_bands -----------------------------------------------------


def embedding_norm_bands(sf_dir: str):
    """Per-label embedding-norm statistics on the integer-quantized squared
    L2 norm: nsq = sum(round(e*1e4)^2) per vector (exact int64 — float sum
    order can never flip a bit). The norm-distribution health check that
    precedes any cosine-similarity stage.

    Shape: the list<float> column never unnests through a shuffle — each
    batch reshapes the flat Arrow values buffer to (rows, dim) in numpy and
    reduces to one int64 per vector; the groupby runs on label."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    def nsq(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // len(t)
        q = np.floor(flat * 10_000.0 + 0.5).astype(np.int64).reshape(len(t), dim)
        return pa.table({
            "label": pc.cast(t["label"], pa.int64()),
            "nsq": pa.array((q * q).sum(axis=1), pa.int64()),
        })

    out = (
        ds.map_batches(nsq, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Count(alias_name="n_vecs"),
                   Min("nsq", alias_name="min_nsq"),
                   Max("nsq", alias_name="max_nsq"),
                   Sum("nsq", alias_name="sum_nsq"))
    )
    df = out.to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


SQL_EMBEDDING_NORM_BANDS = """
WITH u AS (
  SELECT vec_id, label, unnest(embedding) AS e FROM embeddings
), q AS (
  SELECT vec_id, label,
         CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS qe
  FROM u
), n AS (
  SELECT vec_id, label, CAST(sum(qe * qe) AS BIGINT) AS nsq
  FROM q GROUP BY 1, 2
)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
       min(nsq) AS min_nsq, max(nsq) AS max_nsq,
       CAST(sum(nsq) AS BIGINT) AS sum_nsq
FROM n GROUP BY 1
"""


# -- ema_final_per_user -------------------------------------------------------


def ema_final_per_user(sf_dir: str):
    """Integer exponential moving average per user over the event value
    stream (alpha = 1/4 with floor division: ema_i = (3*ema_{i-1} +
    cents_i) // 4, seeded with the first value, events ordered by (ts,
    event_id)) — the sequential-recurrence-per-key pattern (fraud scores,
    session heat, rate limiters).

    A floor-division recurrence has no closed form and no associative
    combine, so the scan is genuinely sequential PER KEY; the distributed
    shape is: hash-bucket by user (all of one user's rows co-locate), ONE
    vectorized sort per bucket, then a single linear pass over the bucket
    with numpy-boundary resets — the per-row loop is irreducible, but it
    runs once per event inside parallel buckets, never on the driver."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "cents": _cents(t["value"]),
            "ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        users = g["user_id"].to_numpy()
        cents = g["cents"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = users[1:] != users[:-1]
        ema = 0
        out_u, out_n, out_e = [], [], []
        n = 0
        for i in range(len(g)):
            if first[i]:
                if i:
                    out_u.append(users[i - 1]); out_n.append(n); out_e.append(ema)
                ema = int(cents[i]); n = 1
            else:
                ema = (3 * ema + int(cents[i])) // 4; n += 1
        if len(g):
            out_u.append(users[-1]); out_n.append(n); out_e.append(ema)
        return pd.DataFrame({
            "user_id": np.asarray(out_u, dtype=np.int64),
            "n_events": np.asarray(out_n, dtype=np.int64),
            "ema_final": np.asarray(out_e, dtype=np.int64),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ub").map_groups(_pd_arrow(scan), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_EMA_FINAL_PER_USER = """
WITH RECURSIVE c AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), r AS (
  SELECT user_id, rn, cents AS ema FROM c WHERE rn = 1
  UNION ALL
  SELECT c.user_id, c.rn, (3 * r.ema + c.cents) // 4
  FROM r JOIN c ON c.user_id = r.user_id AND c.rn = r.rn + 1
), last AS (SELECT user_id, max(rn) AS mx FROM c GROUP BY 1)
SELECT r.user_id, last.mx AS n_events, r.ema AS ema_final
FROM r JOIN last ON r.user_id = last.user_id AND r.rn = last.mx
"""


# -- moving_sum3_per_user -----------------------------------------------------


def moving_sum3_per_user(sf_dir: str):
    """Bounded window frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW):
    per-user 3-event moving sum of integer cents in (ts, event_id) order —
    the rate/velocity feature window. Unlike the EMA recurrence this IS
    vectorized: rows co-locate by user hash-bucket, ONE sort per bucket,
    then a C-level pandas groupby.rolling(3).sum with min_periods=1.
    Integer cents make the rolling sum exact in any engine."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "cents": _cents(t["value"]),
            "ub": pc.bit_wise_and(t["user_id"], 255),
        })

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        w = (
            g.groupby("user_id", sort=False)["cents"]
            .rolling(3, min_periods=1).sum()
            .reset_index(drop=True)
        )
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "w3sum_cents": w.to_numpy().astype(np.int64),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ub").map_groups(_pd_arrow(roll), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_MOVING_SUM3_PER_USER = """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS w3sum_cents
FROM c
"""


# -- exact_distinct_2level ----------------------------------------------------


def exact_distinct_2level(sf_dir: str):
    """Exact COUNT(DISTINCT) at scale, two-level: block-local dedup
    (map-side combiner — each block emits its distinct keys once), hash
    buckets co-locate equal keys, per-bucket vectorized nunique, one tiny
    Sum. The exact complement to the KMV sketch (kmv_distinct_users):
    per-key state never exists, the shuffle carries block-distinct keys
    only, and the only Python loop is over 256 buckets. Counts distinct
    users and distinct (user, event_type) pairs in one pass."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def block_distinct(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(),
            "event_type": t["event_type"].to_pylist(),
        }).drop_duplicates()
        df["ub"] = df["user_id"].to_numpy() & 255
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "event_type"]].drop_duplicates()
        return pd.DataFrame({
            "n_users": [d["user_id"].nunique()],
            "n_user_types": [len(d)],
        })

    agg = (
        ds.map_batches(block_distinct, batch_format="pyarrow")
        .groupby("ub").map_groups(_pd_arrow(bucket_counts), batch_format="pandas")
        .aggregate(Sum("n_users", alias_name="n_users"),
                   Sum("n_user_types", alias_name="n_user_types"))
    )
    return pa.table({
        "n_users": pa.array([int(agg["n_users"])], pa.int64()),
        "n_user_types": pa.array([int(agg["n_user_types"])], pa.int64()),
    })


SQL_EXACT_DISTINCT_2LEVEL = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT (user_id, event_type)) AS BIGINT) AS n_user_types
FROM events
"""


STATOPS_REGISTRY = {
    "exact_distinct_2level": (exact_distinct_2level, SQL_EXACT_DISTINCT_2LEVEL),
    "moving_sum3_per_user": (moving_sum3_per_user, SQL_MOVING_SUM3_PER_USER),
    "ema_final_per_user": (ema_final_per_user, SQL_EMA_FINAL_PER_USER),
    "chunk_documents": (chunk_documents, SQL_CHUNK_DOCUMENTS),
    "pareto_orders": (pareto_orders, SQL_PARETO_ORDERS),
    "daily_ohlc": (daily_ohlc, SQL_DAILY_OHLC),
    "triangle_count": (triangle_count, SQL_TRIANGLE_COUNT),
    "rolling_dau_7d": (rolling_dau_7d, SQL_ROLLING_DAU_7D),
    "winsorized_stats": (winsorized_stats, SQL_WINSORIZED_STATS),
    "late_events": (late_events, SQL_LATE_EVENTS),
    "conversion_latency": (conversion_latency, SQL_CONVERSION_LATENCY),
    "source_token_gini": (source_token_gini, SQL_SOURCE_TOKEN_GINI),
    "embedding_norm_bands": (embedding_norm_bands, SQL_EMBEDDING_NORM_BANDS),
}
