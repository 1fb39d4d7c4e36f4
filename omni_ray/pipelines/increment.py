"""Operator batch 16 — incremental maintenance, partition-pruned IO,
robust statistics, and rate-cap auditing.

Reference anchors: the reference recomputes dashboards from the full table
on every cycle (`src/api/dashboard.py` re-queries) and re-reads unpartitioned
SQLite; these ops give the engine the incremental/partitioned shapes a
continuous 100-TB crawl needs:

- incremental_agg_merge: incremental view maintenance — the BASE snapshot's
  per-type aggregate partials (count/sum/min/max, all merge-associative)
  are materialized ONCE to parquet; when the DELTA arrives only ITS partials
  are computed and merged with the stored view. The oracle is the full
  recompute, so the merge is proven equal to the from-scratch answer.
- incremental_dedup_delta: incremental crawl dedup — delta documents are
  checked against the base snapshot's fingerprint index AND against earlier
  delta arrivals (keep-first), in ONE fingerprint-keyed bucketed shuffle.
  Planted duplicates (odd multiples of 11 copy the preceding base doc's
  fingerprint; odd multiples of 13 copy the odd doc two back) make the
  answer non-trivial at every sf; both engines derive the SAME construction
  from original hashes, so the oracle is exact.
- mad_robust_stats: per-type lower median + median-absolute-deviation over
  integer cents — rank-based (type-1) quantiles, so both engines agree
  bit-for-bit. Exact per-group order statistics via bounded-domain
  map_groups (the segment_quantiles pattern); the sketch-scale sibling is
  quantile_sketch_audit.
- partition_pruned_read: hive-partitioned parquet written with
  ``write_parquet(partition_cols=...)`` and read back through Ray's
  ``PathPartitionFilter`` — directory-level pruning, so non-selected
  partitions are never opened. This is the resumable-output layout the
  prompt mandates (one directory per key range) exercised end-to-end.
- rate_limit_violations: per-(user, day) cap-K audit (rank events by
  (ts, event_id) inside the key, count overflow) — the abuse/politeness
  audit shape; per-user totals then a per-block-pruned bounded top-k.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _block_topk, _pd_arrow, _read

RATE_CAP = 3  # events per (user, day) before a violation is counted


# ---------------------------------------------------------------------------
# incremental_agg_merge
# ---------------------------------------------------------------------------

_AGG_COLS = ["event_type", "n", "sum_c", "min_c", "max_c"]


def _type_partials(ds):
    """Per-block → per-type merge-associative partials (the combiner)."""

    def block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(c=np.round(df["value"].to_numpy() * 100).astype(np.int64))
        g = df.groupby("event_type")
        return pd.DataFrame({
            "n": g.size(), "sum_c": g["c"].sum(),
            "min_c": g["c"].min(), "max_c": g["c"].max(),
        }).reset_index()

    return ds.map_batches(_pd_arrow(block), batch_format="pandas")


def _merge_partials(ds):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("event_type", as_index=False)
        return gg.agg(n=("n", "sum"), sum_c=("sum_c", "sum"),
                      min_c=("min_c", "min"), max_c=("max_c", "max"))

    return ds.groupby("event_type").map_groups(
        _pd_arrow(merge), batch_format="pandas")


def incremental_agg_merge(sf_dir: str):
    """events split by event_id parity into BASE (even — the maintained
    snapshot) and DELTA (odd — today's arrivals). The base view is
    aggregated once and persisted; the delta pass touches ONLY delta rows
    and merges into the stored view. Equal to the full recompute (the
    oracle) because every statistic is merge-associative."""
    import ray.data

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def parity(keep_even: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(t["event_id"], 1),
                         0 if keep_even else 1)
            return t.filter(m)
        return f

    view_dir = os.path.join(
        tempfile.gettempdir(),
        f"omni_ray_incr_view_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(view_dir, ignore_errors=True)
    base_view = _merge_partials(
        _type_partials(ev.map_batches(parity(True), batch_format="pyarrow")))
    base_view.write_parquet(view_dir)

    stored = ray.data.read_parquet(view_dir).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
    delta = _type_partials(
        ev.map_batches(parity(False), batch_format="pyarrow"))
    out = _merge_partials(stored.select_columns(_AGG_COLS)
                          .union(delta.select_columns(_AGG_COLS)))
    return out.sort("event_type")


SQL_INCREMENTAL_AGG_MERGE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
       min(CAST(round(value * 100) AS BIGINT)) AS min_c,
       max(CAST(round(value * 100) AS BIGINT)) AS max_c
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# incremental_dedup_delta
# ---------------------------------------------------------------------------


def incremental_dedup_delta(sf_dir: str):
    """delta (odd doc_id) documents → (doc_id, dup_of_base, dup_in_delta):
    is the fingerprint already in the base (even) snapshot, and does an
    earlier delta arrival carry it (keep-first)?

    Scale shape: fingerprints only (16-byte digests, never text) flow
    through ONE hash-bucketed shuffle; flags are vectorized inside the
    bucket. The planted construction (odd×11 ← preceding even doc, odd×13
    ← odd doc two back, both from ORIGINAL hashes so there is no chaining)
    is derived identically in both engines."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_rows(t: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        ids = t["doc_id"].to_pylist()
        hs = [md5((x or "").encode()).digest() for x in t["text"].to_pylist()]
        out_id, out_h = list(ids), list(hs)
        # override-source rows: (target, source-ORIGINAL-hash)
        for i, h in zip(ids, hs):
            j = i + 1
            if i % 2 == 0 and j % 11 == 0 and j % 2 == 1:
                out_id.append(j)
                out_h.append(h)
            j = i + 2
            if i % 2 == 1 and j % 13 == 0 and j % 11 != 0 and j % 2 == 1:
                out_id.append(j)
                out_h.append(h)
        prio = [0] * t.num_rows + [1] * (len(out_id) - t.num_rows)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "h": pa.array(out_h, pa.binary()),
            "prio": pa.array(prio, pa.int64()),
        })

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # per doc, the override (prio 1) wins when present; targets whose
        # source doc does not exist keep their own hash
        keep = g["prio"] == g.groupby("doc_id")["prio"].transform("max")
        r = g[keep].drop_duplicates("doc_id")
        return r[["doc_id", "h"]]

    def dbucket(col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df["_kb"] = (pd.util.hash_array(df[col].to_numpy()) % 256
                         ).astype(np.int64)
            return df
        return f

    resolved = (
        docs.map_batches(hash_rows, batch_format="pyarrow")
        .map_batches(_pd_arrow(dbucket("doc_id")), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(resolve), batch_format="pandas")
    )

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        odd = (g["doc_id"] % 2).astype(bool)
        base_hit = g.groupby("h")["doc_id"].transform(
            lambda s: (~(s % 2).astype(bool)).any())
        first_odd = g[odd].groupby("h")["doc_id"].min()
        g_odd = g[odd]
        earlier = g_odd["doc_id"] > g_odd["h"].map(first_odd)
        out = pd.DataFrame({
            "doc_id": g_odd["doc_id"].to_numpy(),
            "dup_of_base": base_hit[odd].to_numpy().astype(np.int64),
            "dup_in_delta": earlier.to_numpy().astype(np.int64),
        })
        return out

    out = (
        resolved.map_batches(_pd_arrow(dbucket("h")), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(flags), batch_format="pandas")
    )
    return out.sort("doc_id")


SQL_INCREMENTAL_DEDUP_DELTA = """
WITH h0 AS (
  SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents
), hx AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 2 = 1 AND d.doc_id % 11 = 0 AND b.h IS NOT NULL
                THEN b.h
              WHEN d.doc_id % 2 = 1 AND d.doc_id % 13 = 0
                   AND d.doc_id % 11 <> 0 AND c.h IS NOT NULL
                   AND (d.doc_id - 2) % 2 = 1
                THEN c.h
              ELSE d.h END AS h
  FROM h0 d
  LEFT JOIN h0 b ON b.doc_id = d.doc_id - 1
  LEFT JOIN h0 c ON c.doc_id = d.doc_id - 2
)
SELECT d.doc_id,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM hx b
                              WHERE b.h = d.h AND b.doc_id % 2 = 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS dup_of_base,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM hx e
                              WHERE e.h = d.h AND e.doc_id % 2 = 1
                                AND e.doc_id < d.doc_id)
                 THEN 1 ELSE 0 END AS BIGINT) AS dup_in_delta
FROM hx d WHERE d.doc_id % 2 = 1
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# mad_robust_stats
# ---------------------------------------------------------------------------


def mad_robust_stats(sf_dir: str):
    """Per event_type: n, lower median (rank ceil(n/2)) and MAD (lower
    median of |x − med|) over integer cents — rank-based so both engines
    agree exactly. Bounded type domain → exact per-group order statistics
    in map_groups."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(np.round(g["value"].to_numpy() * 100).astype(np.int64))
        n = len(c)
        med = int(c[(n + 1) // 2 - 1])
        dev = np.sort(np.abs(c - med))
        mad = int(dev[(n + 1) // 2 - 1])
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": np.int64(n), "med_c": np.int64(med), "mad_c": np.int64(mad),
        })

    return (
        ev.groupby("event_type")
        .map_groups(_pd_arrow(stats), batch_format="pandas")
        .sort("event_type")
    )


SQL_MAD_ROBUST_STATS = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
), r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
), med AS (
  SELECT event_type, max(n) AS n,
         max(CASE WHEN rn = (n + 1) // 2 THEN c END) AS med_c
  FROM r GROUP BY event_type
), dev AS (
  SELECT v.event_type, abs(v.c - m.med_c) AS d
  FROM v JOIN med m USING (event_type)
), rd AS (
  SELECT event_type, d,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN d END) AS mad_c
  FROM rd GROUP BY event_type
)
SELECT m.event_type, m.n, m.med_c, CAST(a.mad_c AS BIGINT) AS mad_c
FROM med m JOIN mad a USING (event_type)
ORDER BY m.event_type
"""


# ---------------------------------------------------------------------------
# partition_pruned_read
# ---------------------------------------------------------------------------


def partition_pruned_read(sf_dir: str):
    """documents → hive-partitioned parquet (``partition_cols=['lang']``,
    one directory per language — the resumable-output layout) → pruned
    read of the two lexicographically-smallest languages through
    ``PathPartitionFilter`` (non-selected directories are never opened) →
    per-lang count + char sum."""
    import ray.data
    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    langs = sorted(
        r["lang"] for r in docs.groupby("lang").count().take_all())
    want = set(langs[:2])

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"omni_ray_hive_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    docs.write_parquet(out_dir, partition_cols=["lang"])

    filt = PathPartitionFilter.of(lambda p: p["lang"] in want, style="hive")
    pruned = ray.data.read_parquet(
        out_dir, partitioning=Partitioning("hive"), partition_filter=filt,
    ).map_batches(  # partition-inferred blocks carry schema metadata
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "n_docs": np.int64(len(g)),
            "chars": np.int64(g["n_chars"].sum()),
        })

    return (
        pruned.groupby("lang")
        .map_groups(_pd_arrow(agg), batch_format="pandas")
        .sort("lang")
    )


SQL_PARTITION_PRUNED_READ = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
WHERE lang IN (SELECT DISTINCT lang FROM documents ORDER BY lang LIMIT 2)
GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# rate_limit_violations
# ---------------------------------------------------------------------------


def rate_limit_violations(sf_dir: str):
    """Top-20 users by (user, day) rate-cap overflow: events ranked by
    (ts, event_id) within the key; every event past rank RATE_CAP counts.
    User-bucketed shuffle (all of a user's events co-locate), vectorized
    cumcount inside the bucket, bounded top-k finish."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "dd": pc.strftime(t["ts"], format="%Y-%m-%d"),
            "ts": t["ts"],
            "event_id": t["event_id"],
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def viol_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "dd", "ts", "event_id"])
        rn = g.groupby(["user_id", "dd"]).cumcount() + 1
        over = g[rn > RATE_CAP]
        out = over.groupby("user_id", as_index=False).agg(
            n_viol=("event_id", "size"))
        return out.astype({"user_id": "int64", "n_viol": "int64"})

    per_user = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(_pd_arrow(viol_in_bucket), batch_format="pandas")
    )
    keys, desc = ["n_viol", "user_id"], [True, False]
    return (
        per_user.map_batches(_block_topk(keys, desc, 20),
                             batch_format="pyarrow")
        .sort(keys, descending=desc)
        .limit(20)
    )


SQL_RATE_LIMIT_VIOLATIONS = """
WITH r AS (
  SELECT user_id,
         row_number() OVER (
           PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, count(*) AS n_viol
FROM r WHERE rn > 3
GROUP BY user_id
ORDER BY n_viol DESC, user_id
LIMIT 20
"""


INCREMENT_REGISTRY = {
    "incremental_agg_merge": (incremental_agg_merge, SQL_INCREMENTAL_AGG_MERGE),
    "incremental_dedup_delta": (incremental_dedup_delta,
                                SQL_INCREMENTAL_DEDUP_DELTA),
    "mad_robust_stats": (mad_robust_stats, SQL_MAD_ROBUST_STATS),
    "partition_pruned_read": (partition_pruned_read, SQL_PARTITION_PRUNED_READ),
    "rate_limit_violations": (rate_limit_violations, SQL_RATE_LIMIT_VIOLATIONS),
}
