"""Relational operator surface (SURVEY.md §2.5 A1-A9, §2.6 O1-O4, §2.7 D2/D3,
§2.4 J1) over the provided testdata tables, each with a DuckDB oracle.

Every function takes ``sf_dir`` and returns a Ray Dataset / pyarrow Table whose
column NAMES match its oracle SQL exactly (driver compares sorted-column value
hashes). Float aggregates are rounded on BOTH sides so distributed summation
order cannot flip the hash (doubles carry ~1e-15 relative error across
different reduction trees; rounding at 1e-4..1e-6 absorbs it).

Scale notes per query are in the docstrings: reads are column-pruned,
conditional counts are indicator-column Sums (map-side combinable), small
join sides are broadcast via ray.put (no shuffle), top-k is sort+limit on
already-aggregated (small) data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _clean_read_schema(path: str):
    """Metadata-free schema for a parquet file, or None if already clean.

    The driver-generated testdata tables carry b'pandas' schema-level
    metadata. pyarrow 16's hash(schema) RAISES on schema metadata, so every
    read task logs "Failed to hash the schemas (for deduplication)" and Ray
    loses its schema-unify fast path for the whole downstream chain. Handing
    the scanner the SAME schema minus metadata (one footer read on the
    driver) makes every block clean at the source — zero-copy, no casts."""
    import pyarrow.parquet as _pq

    s = _pq.read_schema(path)
    return s.remove_metadata() if s.metadata else None


def _strip_meta_batch(t: pa.Table) -> pa.Table:
    """Zero-copy schema-metadata strip; fuses with the read stage."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


_EXPR_KEYWORDS = frozenset(
    {"and", "or", "not", "is", "in", "null", "true", "false", "cast",
     "is_in", "invert", "timestamp", "us"}
)


def _filter_refs_within(filt, columns) -> bool:
    """Conservative check that a scanner filter references ONLY projected
    columns, so the subset schema can bind it. Tokenizes str(filter) after
    dropping quoted literals; any unrecognized token counts as a possible
    column ref, so overcounting only forces the safe strip-stage fallback —
    it can never pick the subset path wrongly (unless a column name itself
    collides with an expression keyword, which none of our tables have)."""
    import re

    s = re.sub(r'"[^"]*"', "", str(filt))
    toks = set(re.findall(r"[A-Za-z_]\w*", s)) - _EXPR_KEYWORDS
    return toks <= set(columns)


def _read(sf_dir: str, table: str, columns=None, filter=None, **kwargs):
    path = f"{sf_dir}/{table}.parquet"
    full = _clean_read_schema(path)
    if full is not None and "schema" not in kwargs:
        if columns is None:
            kwargs["schema"] = full
        elif filter is None or _filter_refs_within(filter, columns):
            # Ray hands the user schema unsubsetted to Table.from_batches, so
            # a projected read needs the projected schema
            kwargs["schema"] = pa.schema([full.field(c) for c in columns])
        # columns + filter referencing NON-projected columns: the filter
        # cannot bind against a subset schema — fall through to the fused
        # strip below (a filtered read has no count() metadata fast path to
        # lose anyway)
    ds = ray.data.read_parquet(path, columns=columns, filter=filter, **kwargs)
    if full is not None and "schema" not in kwargs:
        ds = ds.map_batches(_strip_meta_batch, batch_format="pyarrow")
    return ds


def _pd_arrow(fn):
    """Wrap a pandas UDF (map_batches/map_groups body) so a DataFrame return
    becomes a metadata-free Arrow table. Ray's own pandas→Arrow block
    conversion attaches b'pandas' schema-level metadata; pyarrow 16's
    hash(schema) RAISES on schema metadata, so every downstream task logs
    "Failed to hash the schemas (for deduplication)" and Ray loses its
    schema-unify fast path. Same conversion work either way — just clean."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        out = fn(*a, **k)
        if isinstance(out, pd.DataFrame):
            return pa.Table.from_pandas(
                out, preserve_index=False
            ).replace_schema_metadata(None)
        return out

    return wrapped


_BAGG_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _bucketed_agg(ds, keys: list, spec: dict, n_buckets: int = 256):
    """Per-key aggregate via hash-bucketed, combiner-style vectorized pandas
    reduces — the replacement for groupby(keys).aggregate(...) whenever the
    key DOMAIN is row-sized (terms, doc hashes, order keys). Ray's
    sort-based aggregate finalizes per key in Python: measured 15 s at 117k
    keys vs 1.3 s for the bucketed shape (BASELINE.md round-3 note);
    bounded domains (days, categories, hosts) should stay on the built-in
    aggregate.

    ``spec`` maps out_col -> (in_col, op) with op in sum/count/min/max —
    all merge-associative, so every input block pre-reduces BEFORE the
    shuffle (the combiner) and each of the ``n_buckets`` groups re-reduces
    after it: the shuffle moves one row per (block, key), and the only
    Python-level loop anywhere is over buckets, not keys."""
    first = keys[0]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        cols = {
            out: (g.size() if op == "count" else getattr(g[col], op)())
            for out, (col, op) in spec.items()
        }
        p = pd.DataFrame(cols).reset_index()
        p["_kb"] = (pd.util.hash_array(p[first].to_numpy())
                    % n_buckets).astype(np.int64)
        return p

    def final(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(keys, sort=False)
        cols = {
            out: getattr(gg[out], _BAGG_MERGE[spec[out][1]])()
            for out in spec
        }
        return pd.DataFrame(cols).reset_index()

    return (
        ds.map_batches(_pd_arrow(partial), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(final), batch_format="pandas")
    )


def _quantize(tbl: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Float aggregate → int64 via round(x*scale): cross-engine hash-stable
    (pc.round and DuckDB round can differ in the last ulp of a double; an
    integer representation cannot)."""
    for name, scale in cols.items():
        idx = tbl.column_names.index(name)
        q = pc.cast(pc.round(pc.multiply(tbl.column(name), float(scale))), pa.int64())
        tbl = tbl.set_column(idx, name, q)
    return tbl


# ---------------------------------------------------------------------------
# A1-family: grouped / global aggregates
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """Headline grouped aggregate (dashboard.py:597-618 family, TPC-H-Q1
    shape): pruned read → vectorized derived column → combiner-style groupby.
    """
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= pa.scalar(pd.Timestamp("1998-09-02"))),
    )

    def derive(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    ds = ds.map_batches(derive, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Mean("l_quantity", alias_name="avg_qty"),
        Mean("l_extendedprice", alias_name="avg_price"),
        Mean("l_discount", alias_name="avg_disc"),
        Count(alias_name="count_order"),
    )
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)
    return _quantize(
        tbl,
        {"sum_qty": 100, "sum_base_price": 100, "sum_disc_price": 10_000,
         "avg_qty": 1_000_000, "avg_price": 1_000_000, "avg_disc": 1_000_000},
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity) * 100) AS BIGINT)                         AS sum_qty,
       CAST(round(sum(l_extendedprice) * 100) AS BIGINT)                    AS sum_base_price,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS sum_disc_price,
       CAST(round(avg(l_quantity) * 1000000) AS BIGINT)                     AS avg_qty,
       CAST(round(avg(l_extendedprice) * 1000000) AS BIGINT)                AS avg_price,
       CAST(round(avg(l_discount) * 1000000) AS BIGINT)                     AS avg_disc,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def global_stats(sf_dir: str):
    """A1: COUNT/COUNT-DISTINCT/AVG/MIN/MAX + conditional count
    (dashboard.py:597-618). Distinct = two-stage groupby-count (no driver
    loop); conditional count = indicator Sum."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def ind(t: pa.Table) -> pa.Table:
        return t.append_column(
            "high", pc.cast(pc.greater_equal(t["o_totalprice"], 100000.0), pa.int64())
        )

    agg = ds.map_batches(ind, batch_format="pyarrow").aggregate(
        Count(alias_name="n_orders"),
        Mean("o_totalprice", alias_name="avg_price"),
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
        Sum("high", alias_name="n_high_value"),
    )
    n_cust = ds.groupby("o_custkey").aggregate(Count(alias_name="c")).count()
    tbl = pa.table(
        {
            "n_orders": pa.array([agg["n_orders"]], pa.int64()),
            "n_customers": pa.array([n_cust], pa.int64()),
            "avg_price": pa.array([round(agg["avg_price"] * 1_000_000)], pa.int64()),
            "min_price": pa.array([round(agg["min_price"] * 100)], pa.int64()),
            "max_price": pa.array([round(agg["max_price"] * 100)], pa.int64()),
            "n_high_value": pa.array([agg["n_high_value"]], pa.int64()),
        }
    )
    return tbl


SQL_GLOBAL_STATS = """
SELECT count(*)                               AS n_orders,
       count(DISTINCT o_custkey)              AS n_customers,
       CAST(round(avg(o_totalprice) * 1000000) AS BIGINT) AS avg_price,
       CAST(round(min(o_totalprice) * 100) AS BIGINT)     AS min_price,
       CAST(round(max(o_totalprice) * 100) AS BIGINT)     AS max_price,
       CAST(sum(CASE WHEN o_totalprice >= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value
FROM orders
"""


def per_category_rollup(sf_dir: str):
    """A2: GROUP BY category → count, avg (dashboard.py:761-766)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Mean("value", alias_name="avg_value")
    )
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None), {"avg_value": 1_000_000}
    )


SQL_PER_CATEGORY = """
SELECT event_type, count(*) AS n, CAST(round(avg(value) * 1000000) AS BIGINT) AS avg_value
FROM events GROUP BY event_type
"""


def per_domain_topk(sf_dir: str):
    """A3: per-domain rollup with conditional share, ORDER BY count DESC
    LIMIT 15 (dashboard.py:931-943)."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars", "lang"])

    def ind(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_en", pc.cast(pc.equal(t["lang"], "en"), pa.int64())
        )

    out = (
        ds.map_batches(ind, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Mean("n_chars", alias_name="avg_chars"),
            Sum("is_en", alias_name="n_en"),
        )
        .sort(["n_docs", "source"], descending=[True, False])
        .limit(15)
    )
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None), {"avg_chars": 1_000_000}
    )


SQL_PER_DOMAIN_TOPK = """
SELECT source, count(*) AS n_docs, CAST(round(avg(n_chars) * 1000000) AS BIGINT) AS avg_chars,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
FROM documents GROUP BY source
ORDER BY n_docs DESC, source LIMIT 15
"""


def daily_timeseries(sf_dir: str):
    """A5: articles-per-day series (data_exporter.py:473-486)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def day(t: pa.Table) -> pa.Table:
        d = pc.strftime(t["ts"], format="%Y-%m-%d")
        return pa.table({"day": d})

    out = ds.map_batches(day, batch_format="pyarrow").groupby("day").aggregate(
        Count(alias_name="n")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_DAILY_TIMESERIES = """
SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n FROM events GROUP BY 1
"""


def daily_type_matrix(sf_dir: str):
    """A4: (day × type) counts pivoted to one column per type
    (dashboard.py:839-874 sentiment time-series shape)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]

    def expand(t: pa.Table) -> pa.Table:
        cols = {"day": pc.strftime(t["ts"], format="%Y-%m-%d")}
        for ty in types:
            cols[f"n_{ty}"] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        return pa.table(cols)

    out = ds.map_batches(expand, batch_format="pyarrow").groupby("day").aggregate(
        *[Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in types]
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_DAILY_TYPE_MATRIX = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY 1
"""


def recent_window_count(sf_dir: str):
    """A6: COUNT over a time window — predicate pushed to the read."""
    cutoff = pd.Timestamp("2024-01-24")
    ds = _read(sf_dir, "events", columns=["ts"], filter=(pc.field("ts") >= pa.scalar(cutoff)))
    return pa.table({"n_recent": pa.array([ds.count()], pa.int64())})


SQL_RECENT_WINDOW = """
SELECT count(*) AS n_recent FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
"""


def facet_bands(sf_dir: str):
    """A9: numeric-range bucket facet (advanced_search.py:151-181)."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def band(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"]
        b = pc.if_else(
            pc.less(p, 50000.0), pa.scalar("low"),
            pc.if_else(
                pc.less(p, 100000.0), pa.scalar("mid"),
                pc.if_else(pc.less(p, 200000.0), pa.scalar("high"), pa.scalar("very_high")),
            ),
        )
        return pa.table({"band": b})

    out = ds.map_batches(band, batch_format="pyarrow").groupby("band").aggregate(
        Count(alias_name="n")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_FACET_BANDS = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 100000 THEN 'mid'
            WHEN o_totalprice < 200000 THEN 'high'
            ELSE 'very_high' END AS band,
       count(*) AS n
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# O-family: sorts / top-k / pagination
# ---------------------------------------------------------------------------


def _block_topk(keys: list, descending: list, k: int):
    """Per-block top-k pre-reduction for ORDER BY … LIMIT k: the global top k
    is contained in the union of per-block top k's, so the all-to-all sort
    that follows only moves ≤ k × n_blocks rows instead of every matching
    row — the difference between a bounded merge and a full shuffle at
    100-TB scale. Returns a map_batches-ready callable (total order via the
    unique tiebreak key keeps it deterministic)."""
    order = [(c, "descending" if d else "ascending")
             for c, d in zip(keys, descending)]

    def _take(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.sort_indices(t, sort_keys=order)[:k])

    return _take


def topk_by_value(sf_dir: str):
    """A7/O3: ORDER BY value DESC LIMIT 10, deterministic tiebreak."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    keys, desc = ["o_totalprice", "o_orderkey"], [True, False]
    out = (
        ds.map_batches(_block_topk(keys, desc, 10), batch_format="pyarrow")
        .sort(keys, descending=desc)
        .limit(10)
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_TOPK_BY_VALUE = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def filtered_listing(sf_dir: str):
    """S13/O2: filtered read (predicate pushdown) + ORDER BY ts DESC LIMIT
    (omni_storage.py:466-525)."""
    ds = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"],
        filter=((pc.field("o_orderstatus") == "O") & (pc.field("o_totalprice") > 150000.0)),
    )
    keys, desc = ["o_orderdate", "o_orderkey"], [True, False]
    out = (
        ds.map_batches(_block_topk(keys, desc, 100), batch_format="pyarrow")
        .sort(keys, descending=desc)
        .limit(100)
        .drop_columns(["o_orderstatus"])
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_FILTERED_LISTING = """
SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 150000
ORDER BY o_orderdate DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# J-family: joins
# ---------------------------------------------------------------------------


def nation_revenue(sf_dir: str):
    """J1 as broadcast join: orders ⋈ customer ⋈ nation, aggregated per
    nation. The dimension side (customer×nation lookup) is built once on the
    driver and ray.put-broadcast into the map stage — no shuffle join."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk_to_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    cust_to_nation = {
        ck: nk_to_name[nk]
        for ck, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    lookup_ref = ray.put(cust_to_nation)

    class AttachNation:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            names = [self.lookup.get(ck) for ck in t["o_custkey"].to_pylist()]
            return t.append_column("n_name", pa.array(names, pa.string()))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    out = (
        ds.map_batches(AttachNation, batch_format="pyarrow", concurrency=2)
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="revenue"))
    )
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None), {"revenue": 100}
    )


SQL_NATION_REVENUE = """
SELECT n_name, count(*) AS n_orders, CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def nation_revenue_hashjoin(sf_dir: str):
    """J1, hash-join strategy (both-sides-large path): ``Dataset.join``
    hash-partitioned on the key — the alternative to the broadcast join in
    ``nation_revenue`` for when the dimension side outgrows the object store.
    Same oracle as nation_revenue (identical result)."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    j1 = orders.join(cust, join_type="inner", on=("o_custkey",),
                     right_on=("c_custkey",), num_partitions=8)
    j2 = j1.join(nation, join_type="inner", on=("c_nationkey",),
                 right_on=("n_nationkey",), num_partitions=4)
    out = j2.groupby("n_name").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="revenue")
    )
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None), {"revenue": 100}
    )


def entities_export_join(sf_dir: str):
    """J1 exact shape (data_exporter.py:391-396): child rows joined back to
    parent attributes. Here: lineitem (child) ⋈ orders (parent) — parent side
    pruned to 2 cols and broadcast-joined via Dataset.join fallback to
    hash-bucket join. Aggregated per order status for a small result."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    import pyarrow.parquet as pq

    omap = dict(
        zip(
            *[
                pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"])
                .column(c)
                .to_pylist()
                for c in ("o_orderkey", "o_orderstatus")
            ]
        )
    )
    ref = ray.put(omap)

    class Attach:
        def __init__(self):
            self.m = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            st = [self.m.get(k) for k in t["l_orderkey"].to_pylist()]
            return t.append_column("o_orderstatus", pa.array(st, pa.string()))

    out = (
        ds.map_batches(Attach, batch_format="pyarrow", concurrency=2)
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n_items"), Sum("l_extendedprice", alias_name="total_price"))
    )
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None), {"total_price": 100}
    )


SQL_ENTITIES_EXPORT_JOIN = """
SELECT o_orderstatus, count(*) AS n_items, CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# D-family: dedup / upsert
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str):
    """D2: hash-partition + per-group first (content_hash dedup,
    content_enricher.py:254-259). md5 computed per batch, grouped on the hash."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((x or "").encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"content_hash": pa.array(hashes, pa.string()), "doc_id": t["doc_id"]})

    out = ds.map_batches(h, batch_format="pyarrow").groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keeper_id"), Count(alias_name="n_copies")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def last_event_per_user(sf_dir: str):
    """D3: upsert-as-dedup, last-write-wins per key (omni_storage.py:155-168).
    groupby(key) → per-group latest by (ts, id)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "event_type", "ts"])

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ascending=[False, False], kind="mergesort")
        return g.head(1)[["user_id", "event_id", "event_type"]].rename(
            columns={"event_id": "last_event_id", "event_type": "last_event_type"}
        )

    out = ds.groupby("user_id").map_groups(_pd_arrow(latest), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_LAST_EVENT_PER_USER = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def content_hashes(sf_dir: str):
    """M20/§2.8 hash parity: md5 + sha256 per document, bit-identical to SQL."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        texts = [(x or "").encode() for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "md5_hash": pa.array([hashlib.md5(x).hexdigest() for x in texts], pa.string()),
                "sha256_hash": pa.array([hashlib.sha256(x).hexdigest() for x in texts], pa.string()),
            }
        )

    return ds.map_batches(h, batch_format="pyarrow")


SQL_CONTENT_HASHES = """
SELECT doc_id, md5(text) AS md5_hash, sha256(text) AS sha256_hash FROM documents
"""


# ---------------------------------------------------------------------------
# streaming-shaped: windows / sessions (SURVEY.md §2.9)
# ---------------------------------------------------------------------------


def window_tumbling(sf_dir: str):
    """Tumbling 1h window per user: groupby(key, window) aggregate."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        hour = pc.strftime(pc.floor_temporal(t["ts"], unit="hour"), format="%Y-%m-%d %H:00:00")
        return pa.table({"user_id": t["user_id"], "hour": hour, "value": t["value"]})

    out = ds.map_batches(win, batch_format="pyarrow").groupby(["user_id", "hour"]).aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None), {"sum_value": 1_000_000}
    )


SQL_WINDOW_TUMBLING = """
SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       count(*) AS n, CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value
FROM events GROUP BY 1, 2
"""


def sessionize(sf_dir: str):
    """Session windows (30-min gap) per user: partition by key, sort by ts
    within partition, windowing inside map_groups (ray_guide streaming
    pattern). Ordering assumption: ts strictly orderable per user with
    event_id tiebreak."""
    gap_us = 30 * 60 * 1_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        # normalize to us explicitly — pandas may carry datetime64[us] or [ns]
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        new = (ts_us.diff().fillna(0) > gap_us).astype("int64")
        g["session_id"] = new.cumsum()
        out = (
            g.groupby("session_id")
            .agg(
                n_events=("event_id", "size"),
                start_us=("ts", lambda s: int(s.min().value // 1000)),
                end_us=("ts", lambda s: int(s.max().value // 1000)),
            )
            .reset_index()
        )
        out["user_id"] = g["user_id"].iloc[0]
        return out[["user_id", "session_id", "n_events", "start_us", "end_us"]]

    out = ds.groupby("user_id").map_groups(_pd_arrow(sess), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, event_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
FROM s GROUP BY user_id, session_id
"""

# ---------------------------------------------------------------------------
# search surface (advanced_search.py / ES multi-match analogue, O3)
# ---------------------------------------------------------------------------


def keyword_search(sf_dir: str):
    """O3/ES search analogue (dashboard.py:703-753): rank documents by term
    occurrence count (the deterministic stand-in for ES _score), DESC with
    doc_id tiebreak, top 20. Vectorized per batch via pyarrow count_substring."""
    term = "data"
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        cnt = pc.count_substring(t["text"], term)
        return pa.table({"doc_id": t["doc_id"], "score": pc.cast(cnt, pa.int64())})

    keys, desc = ["score", "doc_id"], [True, False]
    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .map_batches(lambda t: t.filter(pc.greater(t["score"], 0)), batch_format="pyarrow")
        .map_batches(_block_topk(keys, desc, 20), batch_format="pyarrow")
        .sort(keys, descending=desc)
        .limit(20)
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_KEYWORD_SEARCH = """
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'data', ''))) / length('data') AS BIGINT) AS score
FROM documents
WHERE text LIKE '%data%'
ORDER BY score DESC, doc_id LIMIT 20
"""


MFS_TERMS = ["data", "merge", "src1"]  # third term exercises the domain boost
MFS_TITLE_LEN = 60
MFS_PREVIEW_LEN = 150
# ES fuzziness:"AUTO" analogue (advanced_search.py:59) — deterministic
# SymSpell distance-1 match: word w matches term t iff
# ({w} ∪ del1(w)) ∩ ({t} ∪ del1(t)) ≠ ∅, w ≠ t, |len w − len t| ≤ 1,
# length-guarded to the AUTO edit-distance-1 band (query terms are 4–5 chars).
MFS_FUZZY_WEIGHT = 5
MFS_FUZZY_MIN_LEN, MFS_FUZZY_MAX_LEN = 3, 6
# highlight analogue (advanced_search.py:120-127,228-236): per-term 150-char
# fragment starting 40 chars before the first occurrence, matched term
# wrapped in <mark>, fragments joined by '...', truncated to 300 + '...'.
MFS_FRAG_BACK, MFS_FRAG_LEN, MFS_HL_MAX = 40, 150, 300


def _del1(s: str) -> set:
    return {s[:i] + s[i + 1:] for i in range(len(s))}


_MFS_TERM_VARS = [(t, {t} | _del1(t)) for t in MFS_TERMS]
_MFS_WEIGHT_CACHE: dict = {}  # word -> #terms fuzzy-matched (per worker process)


def _fuzzy_word_weight(w: str) -> int:
    n = _MFS_WEIGHT_CACHE.get(w)
    if n is None:
        n = 0
        if MFS_FUZZY_MIN_LEN <= len(w) <= MFS_FUZZY_MAX_LEN:
            wv = {w} | _del1(w)
            for t, tv in _MFS_TERM_VARS:
                if w != t and abs(len(w) - len(t)) <= 1 and not wv.isdisjoint(tv):
                    n += 1
        _MFS_WEIGHT_CACHE[w] = n
    return n


def _mfs_highlight(text: str) -> str:
    """Reference _generate_content_preview + ES highlight, deterministically:
    '...'-joined <mark> fragments, [:300] + '...' (advanced_search.py:226)."""
    frags = []
    for t in MFS_TERMS:
        p = text.find(t)
        if p >= 0:
            start = max(0, p - MFS_FRAG_BACK)
            frags.append(
                text[start:start + MFS_FRAG_LEN].replace(t, f"<mark>{t}</mark>")
            )
    if not frags:
        return ""
    return "...".join(frags)[:MFS_HL_MAX] + "..."


def multi_field_search(sf_dir: str):
    """ES multi-match analogue (advanced_search.py:46-62 + dashboard.py:703-
    753): multi-term OR query scored across boosted fields — title×3 (title :=
    first 60 chars, the documents table has no separate title), content×2,
    domain×1.2 — with filter conditions (lang='en', min length) pushed to the
    read, deterministic integer score (×10 so the 1.2 boost stays integral),
    a content preview (the reference's 150-char highlight fallback,
    advanced_search.py:228-236), fuzziness:"AUTO" via SymSpell deletion-
    variant distance-1 word matches (+5 per fuzzy instance), ORDER BY _score
    DESC + id tiebreak, size 20, then per-term <mark> highlight fragments
    computed ONLY for the 20 winners via a pushdown re-read (the top-k +
    id-lookup pattern — the full text never transits the sort).
    Vectorized: pyarrow count_substring per term; the fuzzy pass runs Python
    only over the batch's UNIQUE vocabulary with a per-worker cache, then
    maps word→weight back with index_in/take."""
    ds = _read(
        sf_dir, "documents",
        columns=["doc_id", "text", "source"],
        filter=((pc.field("lang") == "en") & (pc.field("n_chars") >= 100)),
    )

    def score(t: pa.Table) -> pa.Table:
        title = pc.utf8_slice_codeunits(t["text"], 0, MFS_TITLE_LEN)
        total = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        for term in MFS_TERMS:
            s = pc.add(
                pc.add(
                    pc.multiply(pc.cast(pc.count_substring(title, term), pa.int64()), 30),
                    pc.multiply(pc.cast(pc.count_substring(t["text"], term), pa.int64()), 20),
                ),
                pc.multiply(
                    pc.cast(pc.greater(pc.count_substring(t["source"], term), 0), pa.int64()),
                    12,
                ),
            )
            total = pc.add(total, s)
        # fuzzy pass: tokenize (single-space split, lowercased — mirrors the
        # oracle's string_split), score unique words once, scatter-add to docs
        words = pc.split_pattern(pc.utf8_lower(t["text"]), pattern=" ")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        uniq = pc.unique(flat)
        wmap = pa.array(
            [_fuzzy_word_weight(w) for w in uniq.to_pylist()], pa.int64()
        )
        inst = pc.take(wmap, pc.index_in(flat, value_set=uniq)).to_numpy(
            zero_copy_only=False
        )
        fuzzy = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(fuzzy, parent, inst)
        total = pc.add(total, pa.array(MFS_FUZZY_WEIGHT * fuzzy))
        out = pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "score": total,
            "preview": pc.utf8_slice_codeunits(t["text"], 0, MFS_PREVIEW_LEN),
        })
        return out.filter(pc.greater(out["score"], 0))

    keys, desc = ["score", "doc_id"], [True, False]
    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .map_batches(_block_topk(keys, desc, 20), batch_format="pyarrow")
        .sort(keys, descending=desc)
        .limit(20)
    )
    top = out.to_pandas()
    texts = (
        _read(
            sf_dir, "documents", columns=["doc_id", "text"],
            filter=pc.field("doc_id").isin(top["doc_id"].tolist()),
        )
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    top["highlight"] = [_mfs_highlight(texts[d]) for d in top["doc_id"]]
    return pa.Table.from_pandas(top, preserve_index=False).replace_schema_metadata(None)


_MFS_TVAR_VALUES = ", ".join(
    f"('{t}', '{v}')" for t, vs in _MFS_TERM_VARS for v in sorted(vs)
)
_MFS_FRAGS = ", ".join(
    f"CASE WHEN strpos(text, '{t}') > 0 THEN replace(substr(text, "
    f"greatest(1, strpos(text, '{t}') - {MFS_FRAG_BACK}), {MFS_FRAG_LEN}), "
    f"'{t}', '<mark>{t}</mark>') END AS frag{i}"
    for i, t in enumerate(MFS_TERMS)
)

SQL_MULTI_FIELD_SEARCH = f"""
WITH f AS (
  SELECT doc_id, source, text, left(text, {MFS_TITLE_LEN}) AS title
  FROM documents WHERE lang = 'en' AND n_chars >= 100
), wz AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM f
), words AS (
  SELECT doc_id, lower(unnest(parts)) AS w,
         unnest(range(1, len(parts) + 1)) AS wpos
  FROM wz
), wg AS (
  SELECT doc_id, wpos, w FROM words
  WHERE length(w) BETWEEN {MFS_FUZZY_MIN_LEN} AND {MFS_FUZZY_MAX_LEN}
), wvar AS (
  SELECT doc_id, wpos, w, w AS v FROM wg
  {' '.join(
    f"UNION ALL SELECT doc_id, wpos, w, substr(w, 1, {i - 1}) || substr(w, {i + 1}) "
    f"FROM wg WHERE length(w) >= {i}"
    for i in range(1, MFS_FUZZY_MAX_LEN + 1))}
), tvar(term, v) AS (VALUES {_MFS_TVAR_VALUES}
), fmatch AS (
  SELECT DISTINCT doc_id, wpos, term
  FROM wvar JOIN tvar USING (v)
  WHERE w <> term AND abs(length(w) - length(term)) <= 1
), fcnt AS (
  SELECT doc_id, count(*) AS fn FROM fmatch GROUP BY doc_id
), scored AS (
  SELECT f.doc_id, f.source, f.text,
         CAST(
           {' + '.join(
             f"30*(length(title)-length(replace(title,'{t}','')))/{len(t)}"
             f" + 20*(length(text)-length(replace(text,'{t}','')))/{len(t)}"
             f" + 12*(CASE WHEN source LIKE '%{t}%' THEN 1 ELSE 0 END)"
             for t in MFS_TERMS)}
           + {MFS_FUZZY_WEIGHT} * coalesce(fn, 0)
         AS BIGINT) AS score,
         left(f.text, {MFS_PREVIEW_LEN}) AS preview
  FROM f LEFT JOIN fcnt ON f.doc_id = fcnt.doc_id
), top AS (
  SELECT * FROM scored WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20
), frags AS (
  SELECT doc_id, source, score, preview, {_MFS_FRAGS} FROM top
)
SELECT doc_id, source, score, preview,
       CASE WHEN frag0 IS NULL AND frag1 IS NULL AND frag2 IS NULL THEN ''
            ELSE left(concat_ws('...', frag0, frag1, frag2), {MFS_HL_MAX}) || '...'
       END AS highlight
FROM frags ORDER BY score DESC, doc_id
"""


def search_analytics(sf_dir: str):
    """ST8 search-analytics accumulator (advanced_search.py:250-276 +
    get_popular_searches :278-287): per-query count, total result count and
    last-searched timestamp, top-10 by popularity. The search log is modeled
    on the events table (event_type = the query key, value = result count,
    ts = search time); the reference's driver dict becomes one groupby."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "search_key": t["event_type"],
            "results": t["value"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("search_key")
        .aggregate(
            Count(alias_name="n_searches"),
            Sum("results", alias_name="total_results"),
            Max("ts_us", alias_name="last_searched_us"),
        )
        .sort(["n_searches", "search_key"], descending=[True, False])
        .limit(10)
    )
    # coarse quantization (×100): the per-group sums reach ~1e6 at sf0.1, so
    # a 1e6 scale would leave less margin than float reduction-order error —
    # same rationale as q1's sum scales
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None),
        {"total_results": 100},
    )


SQL_SEARCH_ANALYTICS = """
SELECT event_type AS search_key, count(*) AS n_searches,
       CAST(round(sum(value) * 100) AS BIGINT) AS total_results,
       epoch_us(max(ts)) AS last_searched_us
FROM events GROUP BY 1
ORDER BY n_searches DESC, search_key LIMIT 10
"""


def paginate(ds, page: int, page_size: int, sort_cols, descending):
    """O2 pagination: ORDER BY ... LIMIT/OFFSET via sort + split_at_indices
    (omni_storage.py:494-495). Returns the page as a pyarrow Table. Rows
    beyond offset+limit are dropped per block BEFORE the sort — a page-k
    request moves ≤ (offset+limit) × n_blocks rows through the shuffle."""
    start = page * page_size
    pruned = ds.map_batches(
        _block_topk(sort_cols, descending, start + page_size),
        batch_format="pyarrow",
    )
    sorted_ds = pruned.sort(sort_cols, descending=descending)
    splits = sorted_ds.limit(start + page_size).split_at_indices([start])
    return pa.Table.from_pandas(splits[1].to_pandas(), preserve_index=False).replace_schema_metadata(None)


def paginated_listing(sf_dir: str):
    """Page 2 (rows 20..39) of orders by (o_orderdate DESC, o_orderkey)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    return paginate(ds, page=1, page_size=20,
                    sort_cols=["o_orderdate", "o_orderkey"], descending=[True, False])


SQL_PAGINATED_LISTING = """
SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
ORDER BY o_orderdate DESC, o_orderkey LIMIT 20 OFFSET 20
"""

def sliding_window(sf_dir: str):
    """Sliding window: 2-hour windows stepped hourly, per event_type counts.
    Each event expands to the 2 windows containing it (flat expansion inside
    map_batches — the standard stream-to-batch window explode), then a plain
    groupby. Window key = window START hour (epoch hours, int64)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def expand(t: pa.Table) -> pa.Table:
        # fully vectorized window explode: the batch concatenated with itself,
        # once at window start = hour-1 and once at hour (no Python row loop)
        hours = pc.cast(
            pc.floor(pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000)), pa.int64()
        )
        ty = t["event_type"]
        val = pc.cast(t["value"], pa.float64())
        shifted = pa.table({
            "window_start_hour": pc.subtract(hours, 1), "event_type": ty, "value": val,
        })
        current = pa.table({
            "window_start_hour": hours, "event_type": ty, "value": val,
        })
        return pa.concat_tables([shifted, current])

    out = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["window_start_hour", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None),
        {"sum_value": 1_000_000},
    )


SQL_SLIDING_WINDOW = """
WITH expanded AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) - offs AS window_start_hour,
         event_type, value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS offs)
)
SELECT window_start_hour, event_type, count(*) AS n,
       CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value
FROM expanded GROUP BY 1, 2
"""

def json_props_stats(sf_dir: str):
    """§2.8 map/json surface: dot-path extraction from the free-form props
    JSON column (the reference's json.loads round-trips + dot-path metric
    access, omni_storage.py:506-517 / alert_engine.py:142-151), aggregated
    per event_type."""
    import json as _json

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def ext(t: pa.Table) -> pa.Table:
        ks = []
        for p in t["props"].to_pylist():
            try:
                ks.append(int(_json.loads(p or "{}").get("k", 0)))
            except (ValueError, TypeError):
                ks.append(0)
        return pa.table({"event_type": t["event_type"], "k": pa.array(ks, pa.int64())})

    out = ds.map_batches(ext, batch_format="pyarrow").groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("k", alias_name="sum_k"), Mean("k", alias_name="avg_k")
    )
    return _quantize(
        pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None), {"avg_k": 1_000_000}
    )


SQL_JSON_PROPS = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(coalesce(json_extract_string(props, '$.k'), '0') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(round(avg(CAST(coalesce(json_extract_string(props, '$.k'), '0') AS BIGINT)) * 1000000) AS BIGINT) AS avg_k
FROM events GROUP BY event_type
"""


def systematic_sample(sf_dir: str):
    """O6 sampling, deterministic form: every 20th doc by id (reproducible
    across engines, unlike PRNG sampling)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def every_20th(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return t.filter(pa.array(ids % 20 == 0))

    return ds.map_batches(every_20th, batch_format="pyarrow")


SQL_SYSTEMATIC_SAMPLE = """
SELECT doc_id, n_chars FROM documents WHERE doc_id % 20 = 0
"""


# ---------------------------------------------------------------------------
# custom join surface: as-of / interval-range / anti joins, grouped quantiles
# (operators Ray Data lacks natively — composed per the brief's (a) strategy:
# map_batches + groupby().map_groups + sort, with the partitioning assumption
# each relies on documented in its docstring)
# ---------------------------------------------------------------------------


_ASOF_COLS = {
    "purchase_id": "int64",
    "user_id": "int64",
    "purchase_ts_us": "int64",
    "click_event_id": "int64",
    "click_ts_us": "int64",
}


def asof_join_attribution(sf_dir: str):
    """As-of join (attribution shape): each 'purchase' event joined to the
    same user's most recent click at-or-before the purchase time.

    Distributed shape: ONE read with a pushed-down type filter feeds ONE
    hash-partition by user (the groupby shuffle); the backward sorted merge
    (pandas merge_asof) runs inside map_groups, so per-key work is local and
    the all-to-all moves only the two filtered event streams. Partitioning
    assumption: one user's events fit in a worker (as-of joins co-partition
    by key at any scale; a single key hot enough to overflow a worker would
    need time-sliced sub-partitioning with boundary carry-over).
    Missing matches become -1 (not NULL) so the int64 hash compare is exact
    on both engines."""
    ds = _read(
        sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pc.field("event_type").isin(["purchase", "click"]),
    )

    def attrib(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        g = g.assign(ts_us=ts_us)
        left = g[g["event_type"] == "purchase"]
        if left.empty:
            return pd.DataFrame({k: pd.Series(dtype=v) for k, v in _ASOF_COLS.items()})
        right = g[g["event_type"] == "click"]
        left = left.sort_values("ts_us", kind="mergesort")
        right = right.sort_values("ts_us", kind="mergesort")
        out = pd.merge_asof(
            left[["event_id", "user_id", "ts_us"]],
            right[["event_id", "ts_us"]].rename(
                columns={"event_id": "click_event_id", "ts_us": "click_ts_us"}
            ),
            left_on="ts_us",
            right_on="click_ts_us",
            direction="backward",
            allow_exact_matches=True,
        )
        out = out.rename(columns={"event_id": "purchase_id", "ts_us": "purchase_ts_us"})
        for c in ("click_event_id", "click_ts_us"):
            out[c] = out[c].fillna(-1).astype("int64")
        return out[list(_ASOF_COLS)]

    out = ds.groupby("user_id").map_groups(_pd_arrow(attrib), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_ASOF_ATTRIBUTION = """
SELECT p.event_id AS purchase_id, p.user_id, epoch_us(p.ts) AS purchase_ts_us,
       coalesce(c.event_id, -1) AS click_event_id,
       coalesce(epoch_us(c.ts), -1) AS click_ts_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# Overlapping campaign windows over the events month: a genuine interval
# (range) join — one event can land in several windows, so this cannot be
# expressed as bucketing.
RANGE_WINDOWS = [
    ("w01", "2024-01-02", "2024-01-09"),
    ("w02", "2024-01-05", "2024-01-12"),
    ("w03", "2024-01-10", "2024-01-20"),
    ("w04", "2024-01-15", "2024-01-31"),
    ("w05", "2024-01-28", "2024-02-05"),
]


def range_join_windows(sf_dir: str):
    """Interval/range join: events x overlapping time windows
    (ts >= start AND ts < end). The window table is tiny and broadcast as a
    closure constant; each batch emits its matches per window fully
    vectorized (one filter per window, concat) — zero shuffle, the correct
    100-TB shape for a small interval side. For a LARGE interval table the
    plan flips: bucket both sides by coarse time range (equi-join key),
    then verify the exact bounds inside the bucket — same pattern as the
    dedup band buckets."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])
    wins = [
        (wid, pd.Timestamp(ws), pd.Timestamp(we)) for wid, ws, we in RANGE_WINDOWS
    ]

    def expand(t: pa.Table) -> pa.Table:
        parts = []
        for wid, ws, we in wins:
            sel = t.filter(
                pc.and_(
                    pc.greater_equal(t["ts"], pa.scalar(ws)),
                    pc.less(t["ts"], pa.scalar(we)),
                )
            )
            parts.append(
                pa.table({
                    "event_id": sel["event_id"],
                    "window_id": pa.array([wid] * sel.num_rows, pa.string()),
                })
            )
        return pa.concat_tables(parts)

    return ds.map_batches(expand, batch_format="pyarrow")


_RANGE_VALUES = ", ".join(
    f"('{wid}', TIMESTAMP '{ws} 00:00:00', TIMESTAMP '{we} 00:00:00')"
    for wid, ws, we in RANGE_WINDOWS
)

SQL_RANGE_JOIN_WINDOWS = f"""
SELECT e.event_id, w.window_id
FROM events e
JOIN (VALUES {_RANGE_VALUES}) AS w(window_id, ws, we)
  ON e.ts >= w.ws AND e.ts < w.we
"""


_RJB_WIN_US = 21_600_000_000  # 6-hour interval length (mirrored in SQL)
_RJB_COHORT = 50  # cohort equi-key modulus
_RJB_BASE = 1_000_000_000_000


def range_join_bucketed(sf_dir: str):
    """Range join where the interval side is LARGE (scales with users) —
    the plan range_join_windows' docstring promises for that regime: both
    sides key by (cohort, coarse-time-bucket) and meet in an ordinary hash
    join; exact bounds verify in the map after it. Each 6-hour interval
    expands to at most 2 six-hour buckets, each probe to exactly 1, so the
    join fan-out is bounded and an event can pair with a window only via
    the single bucket containing its ts (no post-join dedup needed).
    Semantics: every user's first event opens a 6 h window; an event joins
    every window of its 50-way cohort whose span covers it."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    ev = ds.map_batches(to_us, batch_format="pyarrow").materialize()
    firsts = _bucketed_agg(ev, ["user_id"], {"ws": ("ts_us", "min")})

    def win_rows(t: pa.Table) -> pa.Table:
        wu = t["user_id"].to_numpy()
        ws = t["ws"].to_numpy()
        we = ws + _RJB_WIN_US
        b0 = ws // _RJB_WIN_US
        b1 = (we - 1) // _RJB_WIN_US
        cohort = wu % _RJB_COHORT
        # expand to the <=2 buckets the interval touches
        jk0 = cohort * _RJB_BASE + b0
        jk1 = cohort * _RJB_BASE + b1
        second = b1 != b0
        return pa.table({
            "jk": pa.array(np.concatenate([jk0, jk1[second]]), pa.int64()),
            "wu": pa.array(np.concatenate([wu, wu[second]]), pa.int64()),
            "ws": pa.array(np.concatenate([ws, ws[second]]), pa.int64()),
            "we": pa.array(np.concatenate([we, we[second]]), pa.int64()),
        })

    wins = firsts.map_batches(win_rows, batch_format="pyarrow")

    def probe_rows(t: pa.Table) -> pa.Table:
        ts = t["ts_us"].to_numpy()
        cohort = t["user_id"].to_numpy() % _RJB_COHORT
        return pa.table({
            "jk": pa.array(cohort * _RJB_BASE + ts // _RJB_WIN_US, pa.int64()),
            "event_id": t["event_id"],
            "ts_us": pa.array(ts, pa.int64()),
        })

    probes = ev.map_batches(probe_rows, batch_format="pyarrow")
    joined = probes.join(wins, join_type="inner", on=("jk",),
                         num_partitions=8)

    def verify(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.greater_equal(t["ts_us"], t["ws"]),
                     pc.less(t["ts_us"], t["we"]))
        sel = t.filter(ok)
        return pa.table({
            "event_id": sel["event_id"],
            "window_user": sel["wu"],
        })

    out = joined.map_batches(verify, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_RANGE_JOIN_BUCKETED = """
WITH f AS (
  SELECT user_id AS wu, min(epoch_us(ts)) AS ws FROM events GROUP BY 1
), w AS (SELECT wu, ws, ws + 21600000000 AS we FROM f)
SELECT e.event_id, w.wu AS window_user
FROM events e JOIN w
  ON e.user_id % 50 = w.wu % 50
 AND epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
"""


def anti_join_customers(sf_dir: str):
    """Hash anti-join: customers with NO events (NOT EXISTS). Both sides are
    tagged and unioned into ONE groupby shuffle; a group that contains any
    probe row drops its build rows (cogroup anti-join — works at any right
    cardinality, unlike a broadcast NOT-IN set). The probe side is
    pre-shrunk per block to distinct keys (map-side combiner) so the shuffle
    moves at most one probe row per (block, key)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ev = _read(sf_dir, "events", columns=["user_id"])

    def tag_build(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = pc.cast(t["c_custkey"], pa.int64())
        return pa.table({
            "key": k,
            "c_name": t["c_name"],
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "kb": pc.bit_wise_and(k, 255),
        })

    def tag_probe(t: pa.Table) -> pa.Table:
        u = pc.cast(pc.unique(t["user_id"]), pa.int64())
        n = len(u)
        return pa.table({
            "key": u,
            "c_name": pa.nulls(n, pa.string()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "kb": pc.bit_wise_and(u, 255),
        })

    both = cust.map_batches(tag_build, batch_format="pyarrow").union(
        ev.map_batches(tag_probe, batch_format="pyarrow")
    )

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized in-bucket anti-join: one isin per bucket, not one
        # Python group per key (BASELINE.md bucketed-agg note)
        probe_keys = g.loc[g["side"] == 1, "key"].to_numpy()
        build = g[g["side"] == 0]
        out = build[~build["key"].isin(probe_keys)][["key", "c_name"]]
        return out.rename(columns={"key": "c_custkey"})

    out = both.groupby("kb").map_groups(_pd_arrow(keep), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_ANTI_JOIN_CUSTOMERS = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
"""


def segment_quantiles(sf_dir: str):
    """Grouped exact quantiles (p50/p95 of account balance per market
    segment): groupby(segment) → per-group numpy percentile with linear
    interpolation (identical to SQL quantile_cont). Partitioning
    assumption: per-key value vectors fit in a worker — right for
    low-cardinality segment keys; a high-cardinality or hot key would move
    to per-block t-digest partials merged in a second tiny groupby.
    Quantized half-up via floor(x*100 + 0.5) with the SAME formula in the
    SQL so no rounding-convention mismatch exists."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])

    def qtl(g: pd.DataFrame) -> pd.DataFrame:
        v = g["c_acctbal"].to_numpy(dtype=np.float64)
        p50, p95 = np.percentile(v, [50, 95])
        return pd.DataFrame({
            "c_mktsegment": [g["c_mktsegment"].iloc[0]],
            "n": np.array([len(v)], dtype=np.int64),
            "p50_q": np.array([np.floor(p50 * 100 + 0.5)], dtype=np.int64),
            "p95_q": np.array([np.floor(p95 * 100 + 0.5)], dtype=np.int64),
        })

    out = ds.groupby("c_mktsegment").map_groups(_pd_arrow(qtl), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_SEGMENT_QUANTILES = """
SELECT c_mktsegment, count(*) AS n,
       CAST(floor(quantile_cont(c_acctbal, 0.5) * 100 + 0.5) AS BIGINT) AS p50_q,
       CAST(floor(quantile_cont(c_acctbal, 0.95) * 100 + 0.5) AS BIGINT) AS p95_q
FROM customer GROUP BY 1
"""


def order_revenue_topk(sf_dir: str):
    """3-way join with pre-aggregation (TPC-H Q10 family): lineitem revenue
    is aggregated per order FIRST (the combiner groupby), so the hash join
    to orders moves one row per order, not one per lineitem — at 100 TB the
    difference between shuffling the fact table once vs twice. The per-order
    sum runs over integer CENTS (quantize-then-sum, order-independent and
    the repo's integer-arithmetic rule) inside 256 hash buckets with a
    vectorized pandas reduce — NOT groupby(key).aggregate, whose per-key
    Python finalize costs ~15 s at 10^5 keys (BASELINE.md bucketed-dedup
    note). The top-10 is taken with per-block pre-reduction then the
    bounded global sort, and customer names are attached LAST with a
    pruned-by-key read for just the k winners — the same small-result
    pattern as multi_field_search's highlight stage."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def disc(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            # DuckDB round() breaks ties AWAY FROM ZERO; pyarrow defaults to
            # half-to-even — cents-exact prices × (1-discount) hit exact .5
            # doubles ~3% of rows (first diverged in the sf0.1 full sweep)
            "cents": pc.cast(
                pc.round(pc.multiply(rev, 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64()),
            "gb": pc.bit_wise_and(t["l_orderkey"], 255),
        })

    def sum_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("l_orderkey", as_index=False)["cents"].sum()
        a.columns = ["l_orderkey", "revenue_q"]
        return a

    rev = (
        li.map_batches(disc, batch_format="pyarrow")
        .groupby("gb").map_groups(_pd_arrow(sum_in_bucket), batch_format="pandas")
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = orders.join(rev, join_type="inner", on=("o_orderkey",),
                    right_on=("l_orderkey",), num_partitions=8)

    keys, desc = ["revenue_q", "o_orderkey"], [True, False]
    top = (
        j.select_columns(["o_orderkey", "o_custkey", "revenue_q"])
        .map_batches(_block_topk(keys, desc, 10), batch_format="pyarrow")
        .sort(keys, descending=desc)
        .limit(10)
        .to_pandas()
    )
    names = (
        _read(
            sf_dir, "customer", columns=["c_custkey", "c_name"],
            filter=pc.field("c_custkey").isin(top["o_custkey"].tolist()),
        )
        .to_pandas()
        .set_index("c_custkey")["c_name"]
    )
    top["c_name"] = [names[k] for k in top["o_custkey"]]
    return pa.Table.from_pandas(
        top[["o_orderkey", "c_name", "revenue_q"]], preserve_index=False
    ).replace_schema_metadata(None)


SQL_ORDER_REVENUE_TOPK = """
WITH rev AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS revenue_q
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey, c.c_name, rev.revenue_q
FROM rev JOIN orders o ON rev.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY rev.revenue_q DESC, o.o_orderkey LIMIT 10
"""


def top3_orders_per_customer(sf_dir: str):
    """Per-group top-n ROWS (window row_number ≤ n): hash-partition by
    customer, per-group sort + head(3) inside map_groups. Unlike the
    aggregate rollups this keeps whole rows with an explicit rank column.
    Partitioning assumption: one customer's orders fit in a worker."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def add_cb(t: pa.Table) -> pa.Table:
        return t.append_column("_cb", pc.bit_wise_and(t["o_custkey"], 255))

    def top3_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ONE sort + C-level groupby head/cumcount per bucket, not one
        # Python group per customer (BASELINE.md bucketed-agg note)
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        g = g.groupby("o_custkey", sort=False).head(3)
        g = g.assign(
            rnk=g.groupby("o_custkey", sort=False).cumcount().to_numpy() + 1,
            price_q=np.floor(
                g["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64),
        )
        return g[["o_custkey", "o_orderkey", "rnk", "price_q"]]

    out = (
        ds.map_batches(add_cb, batch_format="pyarrow")
        .groupby("_cb").map_groups(_pd_arrow(top3_in_bucket), batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_TOP3_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_q
FROM orders
QUALIFY rnk <= 3
"""


def running_total_per_user(sf_dir: str):
    """Cumulative window aggregate (SUM OVER ROWS UNBOUNDED PRECEDING):
    hash-partition by user, ordered cumsum inside map_groups. The additions
    happen in the SAME (ts, event_id) order in both engines, so the float
    prefix sums are bit-identical before quantization."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        cum = g["value"].cumsum().to_numpy()
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "running_q": np.floor(cum * 100 + 0.5).astype(np.int64),
        })

    out = ds.groupby("user_id").map_groups(_pd_arrow(run), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_RUNNING_TOTAL_PER_USER = """
SELECT user_id, event_id,
       CAST(floor(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) * 100 + 0.5) AS BIGINT)
         AS running_q
FROM events
"""


def stratified_sample_by_lang(sf_dir: str):
    """O6 stratified sampling: deterministic every-10th document WITHIN each
    language stratum (rank-ordered by doc_id), so small strata are
    represented proportionally instead of vanishing the way a global
    systematic sample loses rare groups."""
    ds = _read(sf_dir, "documents", columns=["lang", "doc_id", "n_chars"])

    def samp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        return g.iloc[::10][["lang", "doc_id", "n_chars"]]

    out = ds.groupby("lang").map_groups(_pd_arrow(samp), batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_STRATIFIED_SAMPLE = """
SELECT lang, doc_id, n_chars FROM documents
QUALIFY (row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 10 = 0
"""


def asof_broadcast_index(sf_dir: str):
    """As-of join, broadcast strategy (the small-right-side twin of
    ``asof_join_attribution``): each lineitem ship date picks the latest
    monthly price-index row at-or-before it. The index (one row per month)
    is aggregated first, collected small, and broadcast via ray.put as two
    numpy arrays; every batch resolves its matches with ONE searchsorted —
    zero shuffle on the fact side, the right 100-TB plan whenever the
    time-versioned side fits in the object store."""
    idx = (
        _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
        .map_batches(
            lambda t: pa.table({
                "m": pc.cast(pc.floor_temporal(t["o_orderdate"], unit="month"), pa.int64()),
                # quantize to int64 cents BEFORE the sum so the mean is exact
                # integer arithmetic on both engines (float Mean differs from
                # DuckDB avg by 1 ulp at .5 boundaries)
                "cents": pc.cast(pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64()),
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }),
            batch_format="pyarrow",
        )
        .groupby("m")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("m")
    )
    months = np.ascontiguousarray(idx["m"].to_numpy(dtype=np.int64))
    cents = idx["cents"].to_numpy(dtype=np.int64)
    n = idx["n"].to_numpy(dtype=np.int64)
    # round-half-up of (cents/n)*100 as exact integer division
    idx_q = np.ascontiguousarray((cents * 200 + n) // (2 * n))
    months_ref, idx_ref = ray.put(months), ray.put(idx_q)

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_shipdate"])

    def attach(t: pa.Table) -> pa.Table:
        # stateless task: ray.get of a small numpy ref is zero-copy from the
        # local plasma store after first fetch — no actor pool to size (an
        # exact-width pool can deadlock the upstream read on small clusters)
        months_a, idx_a = ray.get(months_ref), ray.get(idx_ref)
        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
        pos = np.searchsorted(months_a, ship, side="right") - 1
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "idx_month_us": pa.array(months_a[pos]),
            "idx_q": pa.array(idx_a[pos]),
        })

    out = li.map_batches(attach, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_ASOF_BROADCAST_INDEX = """
WITH idx AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         -- the sum() promotes to HUGEINT; without the outer BIGINT cast the
         -- pandas conversion yields float64 and the driver's value hash
         -- diverges from the Ray int64 column (round-3 red row)
         CAST((sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) * 200 + count(*))
           // (2 * count(*)) AS BIGINT) AS idx_q
  FROM orders GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, epoch_us(i.m) AS idx_month_us, i.idx_q
FROM lineitem l ASOF JOIN idx i ON l.l_shipdate >= i.m
"""


REGISTRY = {
    "q1_pricing_summary": (q1_pricing_summary, SQL_Q1),
    "global_stats": (global_stats, SQL_GLOBAL_STATS),
    "per_category_rollup": (per_category_rollup, SQL_PER_CATEGORY),
    "per_domain_topk": (per_domain_topk, SQL_PER_DOMAIN_TOPK),
    "daily_timeseries": (daily_timeseries, SQL_DAILY_TIMESERIES),
    "daily_type_matrix": (daily_type_matrix, SQL_DAILY_TYPE_MATRIX),
    "recent_window_count": (recent_window_count, SQL_RECENT_WINDOW),
    "facet_bands": (facet_bands, SQL_FACET_BANDS),
    "topk_by_value": (topk_by_value, SQL_TOPK_BY_VALUE),
    "filtered_listing": (filtered_listing, SQL_FILTERED_LISTING),
    "nation_revenue": (nation_revenue, SQL_NATION_REVENUE),
    "nation_revenue_hashjoin": (nation_revenue_hashjoin, SQL_NATION_REVENUE),
    "entities_export_join": (entities_export_join, SQL_ENTITIES_EXPORT_JOIN),
    "exact_dedup": (exact_dedup, SQL_EXACT_DEDUP),
    "last_event_per_user": (last_event_per_user, SQL_LAST_EVENT_PER_USER),
    "content_hashes": (content_hashes, SQL_CONTENT_HASHES),
    "window_tumbling": (window_tumbling, SQL_WINDOW_TUMBLING),
    "sessionize": (sessionize, SQL_SESSIONIZE),
    "sliding_window": (sliding_window, SQL_SLIDING_WINDOW),
    "json_props_stats": (json_props_stats, SQL_JSON_PROPS),
    "systematic_sample": (systematic_sample, SQL_SYSTEMATIC_SAMPLE),
    "keyword_search": (keyword_search, SQL_KEYWORD_SEARCH),
    "multi_field_search": (multi_field_search, SQL_MULTI_FIELD_SEARCH),
    "search_analytics": (search_analytics, SQL_SEARCH_ANALYTICS),
    "paginated_listing": (paginated_listing, SQL_PAGINATED_LISTING),
    "asof_join_attribution": (asof_join_attribution, SQL_ASOF_ATTRIBUTION),
    "range_join_windows": (range_join_windows, SQL_RANGE_JOIN_WINDOWS),
    "range_join_bucketed": (range_join_bucketed, SQL_RANGE_JOIN_BUCKETED),
    "anti_join_customers": (anti_join_customers, SQL_ANTI_JOIN_CUSTOMERS),
    "segment_quantiles": (segment_quantiles, SQL_SEGMENT_QUANTILES),
    "order_revenue_topk": (order_revenue_topk, SQL_ORDER_REVENUE_TOPK),
    "top3_orders_per_customer": (top3_orders_per_customer, SQL_TOP3_ORDERS_PER_CUSTOMER),
    "running_total_per_user": (running_total_per_user, SQL_RUNNING_TOTAL_PER_USER),
    "stratified_sample_by_lang": (stratified_sample_by_lang, SQL_STRATIFIED_SAMPLE),
    "asof_broadcast_index": (asof_broadcast_index, SQL_ASOF_BROADCAST_INDEX),
}
