"""Operator batch 23 — infrastructure-grade corpus and storage operators.

Reference anchors: the reference dedups whole documents by md5
(`src/storage/database_manager.py` content_hash) and shards nothing; these
add the finer-grained and systems-level versions the 100-TB mission runs:

- sentence_dedup_census: CCNet-style sentence-level duplication census
  (Wenzek et al. 2020 dedups the corpus per sentence hash) — how many
  distinct sentences occur k times and how many chars a keep-one pass
  would remove, per occurrence count.
- hard_negatives_topk: hard-negative mining for contrastive training
  (ranks 2..6 by exact integer dot — similar-but-not-nearest), the
  retrieval-training sampler next to knn_bruteforce.
- consistent_hash_ring_moves: how many keys change owner when a 9th node
  joins a 16-vnode consistent-hash ring (Karger et al. 1997) — the
  resharding-cost audit behind every stateful scale-out, per old owner.
- encoding_advisor: per-column dictionary-encoding advisor (NDV, raw
  bytes, dict estimate, verdict) — the storage-layout read behind Parquet
  writer tuning.

All integer-exact; hashes use the repo's KMV multiplicative convention so
the DuckDB twins match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .mlqueries import _emb
from .queries import _bucketed_agg, _read

_H_MULT = 2654435761
_H_MOD = 4294967296

_HN_QMOD = 50   # query subset: vec_id % 50 == 0
_HN_LO, _HN_HI = 2, 6  # hard negatives = similarity ranks 2..6

_RING_NODES_OLD = 8
_RING_NODES_NEW = 9
_RING_VNODES = 16

_ENC_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]
_ENC_IDX_BYTES = 4  # dictionary index width per row in the estimate


# ---------------------------------------------------------------------------
# sentence_dedup_census
# ---------------------------------------------------------------------------


def sentence_dedup_census(sf_dir: str):
    """Sentence-level duplication census over the corpus: sentences (the
    repo's '. ' split, empties dropped) are counted across ALL documents;
    per occurrence count k, the number of distinct sentences and the chars
    a keep-first dedup pass would delete ((k-1) · length each).

    Scale shape: sentence explode map-side, ONE sentence-keyed bucketed
    fold (count + length), then a bounded census groupby — the corpus
    never re-shuffles raw text twice."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        sents = []
        for text in t["text"].to_pylist():
            sents.extend(s for s in text.split(". ") if s)
        return pa.table({
            "sent": pa.array(sents, pa.string()),
            "n": pa.array(np.ones(len(sents), np.int64)),
            "chars": pa.array([len(s) for s in sents], pa.int64()),
        })

    per_sent = _bucketed_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["sent"], {"n": ("n", "sum"), "chars": ("chars", "min")},
    )

    def census_rows(t: pa.Table) -> pa.Table:
        occ = t["n"].to_numpy()
        ch = t["chars"].to_numpy()
        return pa.table({
            "occurrences": pa.array(occ, pa.int64()),
            "n_sentences": pa.array(np.ones(len(occ), np.int64)),
            "removable_chars": pa.array((occ - 1) * ch, pa.int64()),
        })

    return (
        per_sent.map_batches(census_rows, batch_format="pyarrow")
        .groupby("occurrences")
        .sum(["n_sentences", "removable_chars"])
        .map_batches(lambda t: t.rename_columns(
            ["occurrences", "n_sentences", "removable_chars"]),
            batch_format="pyarrow")
        .sort("occurrences")
    )


SQL_SENTENCE_DEDUP_CENSUS = """
WITH sents AS (
  SELECT unnest(string_split(text, '. ')) AS sent FROM documents
), nonempty AS (SELECT sent FROM sents WHERE sent != ''),
per_sent AS (
  SELECT sent, count(*) AS occ, length(sent) AS chars
  FROM nonempty GROUP BY 1
)
SELECT CAST(occ AS BIGINT) AS occurrences,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(sum((occ - 1) * chars) AS BIGINT) AS removable_chars
FROM per_sent GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# hard_negatives_topk
# ---------------------------------------------------------------------------


def hard_negatives_topk(sf_dir: str):
    """Hard-negative mining: for each query vector (vec_id % 50 == 0), the
    corpus vectors at similarity ranks 2..6 (exact integer dot, ties →
    smaller vec_id) — similar enough to be hard, not the nearest
    neighbor. The contrastive-training sampler.

    Scale shape: the quantized corpus matrix is broadcast once; each query
    block computes its dot rows vectorized and emits exactly 5 rows per
    query — knn_bruteforce's zero-shuffle discipline."""
    emb = _emb(sf_dir)

    mats = emb.map_batches(
        lambda t: pa.table({
            "vec_id": t["vec_id"],
            "q": pa.array(
                np.floor(np.stack(t["embedding"].to_numpy(zero_copy_only=False))
                         .astype(np.float64) * 1_000_000 + 0.5)
                .astype(np.int64).tolist()),
        }), batch_format="pyarrow").to_pandas()
    order = np.argsort(mats["vec_id"].to_numpy())
    ids = mats["vec_id"].to_numpy()[order].astype(np.int64)
    mat = np.stack(mats["q"].to_numpy()[order]).astype(np.int64)
    ref = ray.put((ids, mat))

    def mine(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = t["vec_id"].to_numpy().astype(np.int64)
        keep = bids % _HN_QMOD == 0
        bids = bids[keep]
        if not len(bids):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "rnk": pa.array([], pa.int64()),
                             "dot_q": pa.array([], pa.int64())})
        bq = np.floor(
            np.stack(t["embedding"].to_numpy(zero_copy_only=False))[keep]
            .astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
        d = bq @ all_mat.T
        self_col = np.searchsorted(all_ids, bids)
        # int64.min negates to itself (overflow) and would sort FIRST under
        # argsort(-d); half of it negates safely and still sorts last
        d[np.arange(len(bids)), self_col] = np.iinfo(np.int64).min // 2
        # rank by (dot desc, vec_id asc): argsort on (-dot, index)
        ordr = np.argsort(-d, axis=1, kind="stable")[:, :_HN_HI]
        rows_q, rows_n, rows_r, rows_d = [], [], [], []
        ar = np.arange(len(bids))
        for r in range(_HN_LO - 1, _HN_HI):
            cols = ordr[:, r]
            rows_q.append(bids)
            rows_n.append(all_ids[cols])
            rows_r.append(np.full(len(bids), r + 1, np.int64))
            rows_d.append(d[ar, cols])
        return pa.table({
            "query_id": pa.array(np.concatenate(rows_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(rows_n), pa.int64()),
            "rnk": pa.array(np.concatenate(rows_r), pa.int64()),
            "dot_q": pa.array(np.concatenate(rows_d), pa.int64()),
        })

    return emb.map_batches(mine, batch_format="pyarrow") \
        .sort(["query_id", "rnk"])


SQL_HARD_NEGATIVES_TOPK = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS e
  FROM embeddings
), dims AS (
  SELECT unnest(range(1, (SELECT len(e) FROM q LIMIT 1) + 1)) AS d
), dots AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.e[d.d] * b.e[d.d]) AS dot
  FROM q a JOIN q b ON a.vec_id <> b.vec_id CROSS JOIN dims d
  WHERE a.vec_id % {_HN_QMOD} = 0
  GROUP BY 1, 2
), ranked AS (
  SELECT i, j, dot,
         row_number() OVER (PARTITION BY i ORDER BY dot DESC, j) AS rnk
  FROM dots
)
SELECT i AS query_id, j AS neighbor_id, CAST(rnk AS BIGINT) AS rnk,
       CAST(dot AS BIGINT) AS dot_q
FROM ranked WHERE rnk BETWEEN {_HN_LO} AND {_HN_HI}
ORDER BY query_id, rnk
"""


# ---------------------------------------------------------------------------
# consistent_hash_ring_moves
# ---------------------------------------------------------------------------


def _ring(n_nodes: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (positions, owners) for an n-node × 16-vnode hash ring."""
    nodes = np.repeat(np.arange(n_nodes, dtype=np.int64), _RING_VNODES)
    reps = np.tile(np.arange(_RING_VNODES, dtype=np.int64), n_nodes)
    pos = ((nodes * 131 + reps) * _H_MULT) % _H_MOD
    order = np.argsort(pos, kind="stable")
    return pos[order], nodes[order]


def _owners(kh: np.ndarray, pos: np.ndarray, own: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(pos, kh, side="left")
    return own[np.where(idx == len(pos), 0, idx)]  # wrap to ring start


def consistent_hash_ring_moves(sf_dir: str):
    """Resharding-cost audit: documents keyed onto an 8-node consistent-
    hash ring (16 vnodes each, clockwise-successor ownership), then a 9th
    node joins; per OLD owner, how many keys it held and how many move.
    The consistent-hashing guarantee made measurable: only successors of
    the new vnodes' arcs move.

    Scale shape: both rings are tiny broadcast arrays; assignment is one
    vectorized zero-shuffle searchsorted map; the rollup is 8 rows."""
    p1, o1 = _ring(_RING_NODES_OLD)
    p2, o2 = _ring(_RING_NODES_NEW)

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy().astype(np.uint64)
        kh = ((k * _H_MULT) % _H_MOD).astype(np.int64)
        old = _owners(kh, p1, o1)
        new = _owners(kh, p2, o2)
        return pa.table({
            "old_owner": pa.array(old, pa.int64()),
            "n_keys": pa.array(np.ones(len(old), np.int64)),
            "moved": pa.array((old != new).astype(np.int64), pa.int64()),
        })

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("old_owner").sum(["n_keys", "moved"])
        .map_batches(lambda t: t.rename_columns(
            ["old_owner", "n_keys", "moved"]), batch_format="pyarrow")
        .sort("old_owner")
    )


def _ring_sql(n_nodes: int, name: str) -> str:
    return (
        f"{name} AS (SELECT ((node * 131 + rep) * {_H_MULT}) % {_H_MOD}"
        f" AS pos, node FROM (SELECT unnest(range(0, {n_nodes})) AS node)"
        f" CROSS JOIN (SELECT unnest(range(0, {_RING_VNODES})) AS rep))"
    )


SQL_CONSISTENT_HASH_RING_MOVES = f"""
WITH {_ring_sql(_RING_NODES_OLD, "r1")},
{_ring_sql(_RING_NODES_NEW, "r2")},
keys AS (
  SELECT doc_id,
         CAST(CAST(doc_id AS HUGEINT) * {_H_MULT} % {_H_MOD} AS BIGINT) AS kh
  FROM documents
), assigned AS (
  SELECT kh,
         coalesce((SELECT node FROM r1 WHERE pos >= kh ORDER BY pos, node
                   LIMIT 1),
                  (SELECT node FROM r1 ORDER BY pos, node LIMIT 1))
           AS old_owner,
         coalesce((SELECT node FROM r2 WHERE pos >= kh ORDER BY pos, node
                   LIMIT 1),
                  (SELECT node FROM r2 ORDER BY pos, node LIMIT 1))
           AS new_owner
  FROM keys
)
SELECT CAST(old_owner AS BIGINT) AS old_owner,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN old_owner != new_owner THEN 1 ELSE 0 END)
            AS BIGINT) AS moved
FROM assigned GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# encoding_advisor
# ---------------------------------------------------------------------------


def encoding_advisor(sf_dir: str):
    """Per-column dictionary-encoding advisor over `orders`: exact NDV,
    raw byte volume (string length sum; 8 B per integer), the dictionary
    estimate (distinct payload + 4 B index per row), and the verdict — the
    Parquet writer-tuning read.

    Scale shape: one pass emits per-block (col, value) distinct rows plus
    width partials; NDV finishes in a value-keyed bucketed fold, widths in
    a bounded per-column groupby."""
    ds = _read(sf_dir, "orders", columns=_ENC_COLS)

    def explode(t: pa.Table) -> pa.Table:
        cols, vals, raws = [], [], []
        for c in _ENC_COLS:
            arr = t[c]
            sv = pc.cast(arr, pa.string()).to_pylist()
            if pa.types.is_integer(arr.type):
                raw = [8] * len(sv)
            else:
                raw = [len(x) for x in sv]
            cols.extend([c] * len(sv))
            vals.extend(sv)
            raws.extend(raw)
        return pa.table({
            "col": pa.array(cols, pa.string()),
            "val": pa.array(vals, pa.string()),
            "raw": pa.array(raws, pa.int64()),
            "n": pa.array(np.ones(len(cols), np.int64)),
        })

    per_val = _bucketed_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["col", "val"],
        {"n": ("n", "sum"), "raw": ("raw", "min")},
    )

    def fold(t: pa.Table) -> pa.Table:
        return pa.table({
            "col": t["col"],
            "ndv": pa.array(np.ones(t.num_rows, np.int64)),
            "rows": t["n"],
            "raw_bytes": pc.multiply(t["raw"], t["n"]),
            "dict_payload": t["raw"],
        })

    out = (
        per_val.map_batches(fold, batch_format="pyarrow")
        .groupby("col")
        .sum(["ndv", "rows", "raw_bytes", "dict_payload"])
        .to_pandas()
    )
    out.columns = ["col", "ndv", "n_rows", "raw_bytes", "dict_payload"]
    out["dict_bytes"] = out["dict_payload"] + out["n_rows"] * _ENC_IDX_BYTES
    out["use_dict"] = (out["dict_bytes"] < out["raw_bytes"]).astype("int64")
    out = out.drop(columns=["dict_payload"]) \
        .sort_values("col").reset_index(drop=True).astype(
            {c: "int64" for c in ["ndv", "n_rows", "raw_bytes", "dict_bytes",
                                  "use_dict"]})
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _enc_sql() -> str:
    arms = []
    for c in _ENC_COLS:
        width = "8" if c.endswith("key") else f"length(CAST({c} AS VARCHAR))"
        arms.append(
            f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val,"
            f" {width} AS raw FROM orders"
        )
    return f"""
WITH vals AS ({" UNION ALL ".join(arms)}),
per_val AS (
  SELECT col, val, count(*) AS n, min(raw) AS raw FROM vals GROUP BY 1, 2
), folded AS (
  SELECT col, count(*) AS ndv, sum(n) AS rows_,
         sum(raw * n) AS raw_bytes, sum(raw) AS dict_payload
  FROM per_val GROUP BY 1
)
SELECT col, CAST(ndv AS BIGINT) AS ndv, CAST(rows_ AS BIGINT) AS n_rows,
       CAST(raw_bytes AS BIGINT) AS raw_bytes,
       CAST(dict_payload + rows_ * {_ENC_IDX_BYTES} AS BIGINT) AS dict_bytes,
       CAST(CASE WHEN dict_payload + rows_ * {_ENC_IDX_BYTES} < raw_bytes
                 THEN 1 ELSE 0 END AS BIGINT) AS use_dict
FROM folded ORDER BY col
"""


SQL_ENCODING_ADVISOR = _enc_sql()


INFRAOPS_REGISTRY = {
    "sentence_dedup_census": (sentence_dedup_census,
                              SQL_SENTENCE_DEDUP_CENSUS),
    "hard_negatives_topk": (hard_negatives_topk, SQL_HARD_NEGATIVES_TOPK),
    "consistent_hash_ring_moves": (consistent_hash_ring_moves,
                                   SQL_CONSISTENT_HASH_RING_MOVES),
    "encoding_advisor": (encoding_advisor, SQL_ENCODING_ADVISOR),
}
