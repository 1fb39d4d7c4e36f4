"""Operator batch 19 — query-planner statistics and physical-layout audits.

Reference anchors: the reference plans nothing (every query is a hand-written
SQLite statement, `src/api/dashboard.py`); these are the cost-model and
layout primitives a 100-TB engine needs to CHOOSE plans:

- join_size_audit: exact join cardinality |R ⋈ S| = Σ_k n_R(k)·n_S(k) from
  one side-tagged count fold — never executing the join — plus the
  key-sampled estimator the optimizer would use, and its signed error.
- histogram_equi_depth: 8-bucket equi-depth histogram (the optimizer
  statistic) over order totals via the value-domain CDF trick — boundaries
  are exact rank-based order statistics, ZERO global sort.
- cardinality_fanout_audit: join fanout distribution (lineitems per order,
  fanout 0 included via the side-tagged fold) — the skew statistic that
  decides broadcast vs shuffle vs salting.
- zone_map_cluster_audit: zone-map (fragment min/max) pruning simulated
  under the NATIVE doc_id layout vs an n_chars-CLUSTERED layout — the
  measured answer to "is sorting this table worth it?".

All integer-exact with DuckDB twins; boundaries/ranks are type-1 order
statistics so ties behave identically in both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _bucketed_agg, _pd_arrow, _read

_JS_SAMPLE_MOD = 10  # key-sample 1-in-10 for the join-size estimator

_EQD_BUCKETS = 8

_ZM_FRAG = 50  # rows per simulated fragment (row-group analogue)
_ZM_T = 450  # predicate: n_chars > T


# ---------------------------------------------------------------------------
# join_size_audit
# ---------------------------------------------------------------------------


def join_size_audit(sf_dir: str):
    """Exact |orders ⋈ customer| on custkey from per-key count products,
    beside the 1-in-10 key-sampled estimate and its signed error.

    Scale shape: both sides stream through ONE side-tagged bucketed count
    fold (key domain is row-sized → bucketed, per the repo rule); the
    product/sample fold is bounded per bucket. The join itself never
    runs."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda t: pa.table({
            "k": t["o_custkey"],
            "n_r": pa.array(np.ones(t.num_rows, np.int64)),
            "n_s": pa.array(np.zeros(t.num_rows, np.int64)),
        }), batch_format="pyarrow")
    cust = _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: pa.table({
            "k": pc.cast(t["c_custkey"], pa.int64()),
            "n_r": pa.array(np.zeros(t.num_rows, np.int64)),
            "n_s": pa.array(np.ones(t.num_rows, np.int64)),
        }), batch_format="pyarrow")

    per_key = _bucketed_agg(
        orders.union(cust), ["k"],
        {"n_r": ("n_r", "sum"), "n_s": ("n_s", "sum")},
    )

    def partial(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        prod = t["n_r"].to_numpy() * t["n_s"].to_numpy()
        samp = prod[k % _JS_SAMPLE_MOD == 0]
        return pa.table({
            "exact_size": pa.array([int(prod.sum())], pa.int64()),
            "sampled": pa.array([int(samp.sum())], pa.int64()),
            "n_keys": pa.array([len(k)], pa.int64()),
        })

    exact = sampled = n_keys = 0
    for b in per_key.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            exact += int(pc.sum(b["exact_size"]).as_py())
            sampled += int(pc.sum(b["sampled"]).as_py())
            n_keys += int(pc.sum(b["n_keys"]).as_py())
    est = sampled * _JS_SAMPLE_MOD
    return pa.table({
        "exact_size": pa.array([exact], pa.int64()),
        "est_size": pa.array([est], pa.int64()),
        "err": pa.array([exact - est], pa.int64()),
        "n_keys": pa.array([n_keys], pa.int64()),
    })


SQL_JOIN_SIZE_AUDIT = f"""
WITH per_key AS (
  SELECT k, sum(n_r) AS n_r, sum(n_s) AS n_s FROM (
    SELECT o_custkey AS k, 1 AS n_r, 0 AS n_s FROM orders
    UNION ALL
    SELECT CAST(c_custkey AS BIGINT), 0, 1 FROM customer
  ) GROUP BY 1
), folded AS (
  SELECT sum(n_r * n_s) AS exact_size,
         sum(CASE WHEN k % {_JS_SAMPLE_MOD} = 0 THEN n_r * n_s ELSE 0 END)
           * {_JS_SAMPLE_MOD} AS est_size,
         count(*) AS n_keys
  FROM per_key
)
SELECT CAST(exact_size AS BIGINT) AS exact_size,
       CAST(est_size AS BIGINT) AS est_size,
       CAST(exact_size - est_size AS BIGINT) AS err,
       CAST(n_keys AS BIGINT) AS n_keys
FROM folded
"""


# ---------------------------------------------------------------------------
# histogram_equi_depth
# ---------------------------------------------------------------------------


def histogram_equi_depth(sf_dir: str):
    """8-bucket equi-depth histogram over order totals (integer cents):
    boundary i is the (i·n // 8)-th smallest value (type-1 order
    statistic), bucket count = rows in (b_{i-1}, b_i].

    Scale shape: the only shuffle is the value-domain count fold (cents
    domain is bounded by the price range, not row count — the
    global_percentile CDF discipline); boundaries and depths come from the
    folded CDF, no global sort anywhere."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.floor(t["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({
            "cents": pa.array(c, pa.int64()),
            "n": pa.array(np.ones(len(c), np.int64)),
        })

    hist = _bucketed_agg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["cents"], {"n": ("n", "sum")},
    ).to_pandas().sort_values("cents")

    v = hist["cents"].to_numpy()
    cum = np.cumsum(hist["n"].to_numpy())
    n = int(cum[-1])
    buckets, his, rows = [], [], []
    prev_cum = 0
    for i in range(1, _EQD_BUCKETS + 1):
        r = max(1, i * n // _EQD_BUCKETS)
        j = int(np.searchsorted(cum, r, side="left"))
        b = int(v[j])
        c = int(cum[j])  # rows with cents <= b
        buckets.append(i)
        his.append(b)
        rows.append(c - prev_cum)
        prev_cum = c
    return pa.table({
        "bucket": pa.array(buckets, pa.int64()),
        "hi": pa.array(his, pa.int64()),
        "n_rows": pa.array(rows, pa.int64()),
    })


SQL_HISTOGRAM_EQUI_DEPTH = f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents FROM orders
), ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c
), nn AS (SELECT count(*) AS n FROM c),
bounds AS (
  SELECT i.i AS bucket,
         (SELECT cents FROM ranked
          WHERE rn = greatest(1, (i.i * nn.n) // {_EQD_BUCKETS})) AS hi
  FROM (SELECT unnest(range(1, {_EQD_BUCKETS} + 1)) AS i) i CROSS JOIN nn
), cums AS (
  SELECT bucket, hi,
         (SELECT count(*) FROM c WHERE cents <= bounds.hi) AS cum
  FROM bounds
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(hi AS BIGINT) AS hi,
       CAST(cum - coalesce(lag(cum) OVER (ORDER BY bucket), 0) AS BIGINT)
         AS n_rows
FROM cums ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# cardinality_fanout_audit
# ---------------------------------------------------------------------------


def cardinality_fanout_audit(sf_dir: str):
    """Join fanout distribution: how many orders have exactly f lineitems,
    fanout 0 included — the skew statistic behind broadcast/salt choices.

    Scale shape: one side-tagged bucketed fold gives every order its line
    count (orders contribute the key with 0 lines, so childless orders
    surface without an anti-join); fanouts are a bounded domain →
    ordinary groupby."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        lambda t: pa.table({
            "k": t["o_orderkey"],
            "lines": pa.array(np.zeros(t.num_rows, np.int64)),
            "is_order": pa.array(np.ones(t.num_rows, np.int64)),
        }), batch_format="pyarrow")
    lines = _read(sf_dir, "lineitem", columns=["l_orderkey"]).map_batches(
        lambda t: pa.table({
            "k": t["l_orderkey"],
            "lines": pa.array(np.ones(t.num_rows, np.int64)),
            "is_order": pa.array(np.zeros(t.num_rows, np.int64)),
        }), batch_format="pyarrow")

    per_key = _bucketed_agg(
        orders.union(lines), ["k"],
        {"lines": ("lines", "sum"), "is_order": ("is_order", "sum")},
    )

    def to_fanout(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["is_order"], 0))  # FK: lineitem ⊆ orders
        return pa.table({
            "fanout": t["lines"],
            "n_orders": pa.array(np.ones(t.num_rows, np.int64)),
        })

    return _bucketed_agg(
        per_key.map_batches(to_fanout, batch_format="pyarrow"),
        ["fanout"], {"n_orders": ("n_orders", "sum")},
    ).sort("fanout")


SQL_CARDINALITY_FANOUT_AUDIT = """
WITH per_order AS (
  SELECT o.o_orderkey, coalesce(l.c, 0) AS fanout
  FROM orders o LEFT JOIN (
    SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1
  ) l ON l.l_orderkey = o.o_orderkey
)
SELECT CAST(fanout AS BIGINT) AS fanout,
       CAST(count(*) AS BIGINT) AS n_orders
FROM per_order GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# zone_map_cluster_audit
# ---------------------------------------------------------------------------


def zone_map_cluster_audit(sf_dir: str):
    """Zone-map pruning for the predicate n_chars > 450, simulated under
    two physical layouts of `documents`: the native doc_id order and an
    n_chars-clustered order (fragments of 50 rows each). Per layout:
    fragment count, fragments a min/max zone map would skip, rows inside
    skipped fragments, and matching rows — the measured case for (or
    against) re-clustering the table.

    Scale shape: the native layout needs one fragment-keyed bucketed
    max/count fold; the clustered layout derives each row's global rank
    from the value-domain CDF (broadcast) plus an in-value offset computed
    inside a bounded per-value group — still no global sort."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    # --- native layout: fragment = doc_id // F -------------------------
    def native_frag(t: pa.Table) -> pa.Table:
        return pa.table({
            "frag": pc.divide(t["doc_id"], _ZM_FRAG),
            "mx": t["n_chars"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "m": pc.cast(pc.greater(t["n_chars"], _ZM_T), pa.int64()),
        })

    def layout_row(frags, layout: str) -> dict:
        mx = frags["mx"].to_numpy()
        n = frags["n"].to_numpy()
        m = frags["m"].to_numpy()
        pruned = mx <= _ZM_T
        return {
            "layout": layout,
            "n_fragments": np.int64(len(frags)),
            "pruned_frags": np.int64(pruned.sum()),
            "skipped_rows": np.int64(n[pruned].sum()),
            "match_rows": np.int64(m.sum()),
        }

    native = _bucketed_agg(
        ds.map_batches(native_frag, batch_format="pyarrow"),
        ["frag"],
        {"mx": ("mx", "max"), "n": ("n", "sum"), "m": ("m", "sum")},
    ).to_pandas()

    # --- clustered layout: rank by (n_chars, doc_id), fragment = rank//F
    cdf = _bucketed_agg(
        ds.map_batches(
            lambda t: pa.table({
                "n_chars": t["n_chars"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }), batch_format="pyarrow"),
        ["n_chars"], {"n": ("n", "sum")},
    ).to_pandas().sort_values("n_chars")
    below = np.zeros(len(cdf), dtype=np.int64)
    below[1:] = np.cumsum(cdf["n"].to_numpy())[:-1]
    cdf_ref = ray.put(dict(zip(cdf["n_chars"].tolist(), below.tolist())))

    def ranked(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(cdf_ref)[int(g["n_chars"].iloc[0])]
        g = g.sort_values("doc_id")
        rank = base + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame({
            "frag": rank // _ZM_FRAG,
            "mx": g["n_chars"].to_numpy(),
            "n": np.ones(len(g), np.int64),
            "m": (g["n_chars"].to_numpy() > _ZM_T).astype(np.int64),
        })

    clustered = _bucketed_agg(
        ds.groupby("n_chars").map_groups(_pd_arrow(ranked),
                                         batch_format="pandas"),
        ["frag"],
        {"mx": ("mx", "max"), "n": ("n", "sum"), "m": ("m", "sum")},
    ).to_pandas()

    rows = [layout_row(clustered, "clustered"), layout_row(native, "native")]
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ZONE_MAP_CLUSTER_AUDIT = f"""
WITH native AS (
  SELECT doc_id // {_ZM_FRAG} AS frag, max(n_chars) AS mx, count(*) AS n,
         sum(CASE WHEN n_chars > {_ZM_T} THEN 1 ELSE 0 END) AS m
  FROM documents GROUP BY 1
), ranked AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rank
  FROM documents
), clustered AS (
  SELECT rank // {_ZM_FRAG} AS frag, max(n_chars) AS mx, count(*) AS n,
         sum(CASE WHEN n_chars > {_ZM_T} THEN 1 ELSE 0 END) AS m
  FROM ranked GROUP BY 1
), folded AS (
  SELECT 'native' AS layout, count(*) AS n_fragments,
         sum(CASE WHEN mx <= {_ZM_T} THEN 1 ELSE 0 END) AS pruned_frags,
         sum(CASE WHEN mx <= {_ZM_T} THEN n ELSE 0 END) AS skipped_rows,
         sum(m) AS match_rows
  FROM native
  UNION ALL
  SELECT 'clustered', count(*),
         sum(CASE WHEN mx <= {_ZM_T} THEN 1 ELSE 0 END),
         sum(CASE WHEN mx <= {_ZM_T} THEN n ELSE 0 END),
         sum(m)
  FROM clustered
)
SELECT layout, CAST(n_fragments AS BIGINT) AS n_fragments,
       CAST(pruned_frags AS BIGINT) AS pruned_frags,
       CAST(skipped_rows AS BIGINT) AS skipped_rows,
       CAST(match_rows AS BIGINT) AS match_rows
FROM folded ORDER BY layout
"""


PLANSTATS_REGISTRY = {
    "join_size_audit": (join_size_audit, SQL_JOIN_SIZE_AUDIT),
    "histogram_equi_depth": (histogram_equi_depth, SQL_HISTOGRAM_EQUI_DEPTH),
    "cardinality_fanout_audit": (cardinality_fanout_audit,
                                 SQL_CARDINALITY_FANOUT_AUDIT),
    "zone_map_cluster_audit": (zone_map_cluster_audit,
                               SQL_ZONE_MAP_CLUSTER_AUDIT),
}
