"""Operator batch 24 — retrieval reranking and operational advisors.

Reference anchors: the reference returns raw ES hit lists
(`src/search/advanced_search.py`) and keeps every row forever (no retention
path in `database_manager.py`); these add the post-processing and
housekeeping decisions real deployments need:

- mmr_rerank: Maximal Marginal Relevance diversified top-5 (Carbonell &
  Goldstein 1998) over the embedding table — integer MMR unrolled like
  the PPR recurrence so DuckDB replays the exact greedy trajectory.
- bloom_size_advisor: optimal bloom-filter geometry (bits, hashes, bytes)
  for 1% FPP per join-key column from EXACT distinct counts — the sizing
  read behind `bloom_antijoin`; pure integer constants, no runtime ln().
- ooo_arrival_audit: out-of-order arrival audit per event type (arrival
  order = event_id): late events vs the running watermark, adjacent
  inversions, max/total lateness — the watermark-tuning read for the
  windowing suite.
- vacuum_plan: retention sweep plan — rows past the 14-day TTL and the
  bytes a vacuum would reclaim, per event type.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .engineops import _DAY_US
from .mlqueries import _emb
from .queries import _pd_arrow, _read

_MMR_QUERY = 0
_MMR_CAND = 10
_MMR_PICKS = 5
_MMR_REL_W = 4   # lambda = 0.4, scaled by 10
_MMR_DIV_W = 6

# m/n = -ln(p)/ln(2)^2 at p = 0.01, in millionths; k = (m/n)·ln(2)
_BLOOM_BITS_PER_KEY_MICRO = 9_585_059
_BLOOM_LN2_MICRO = 693_147
_BLOOM_TABLES = [("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("lineitem", "l_orderkey")]

_VACUUM_TTL_DAYS = 14
_VACUUM_FIXED_ROW_BYTES = 40


# ---------------------------------------------------------------------------
# mmr_rerank
# ---------------------------------------------------------------------------


def _quant_mat(emb) -> tuple[np.ndarray, np.ndarray]:
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
    return ids, mat


def mmr_rerank(sf_dir: str):
    """Diversified top-5 for query vector 0 by integer MMR over the top-10
    relevance candidates: pick 1 = max relevance; each next pick maximizes
    4·rel - 6·max_sim_to_selected (ties → smaller vec_id). Returns
    (pick_order, vec_id, rel_q, mmr_q).

    Scale shape: the quantized matrix collect is the same one mutual_top1
    performs to build its broadcast (beyond broadcast scale the relevance
    pass becomes knn_bruteforce's distributed map over a broadcast query);
    the greedy selection folds over the bounded candidate set on the
    driver — O(picks · candidates), output-sized. The SQL twin unrolls the
    same 5 greedy steps as chained CTEs."""
    ids, mat = _quant_mat(_emb(sf_dir))
    qi = int(np.searchsorted(ids, _MMR_QUERY))
    rel = mat @ mat[qi]
    rel[qi] = np.iinfo(np.int64).min // 2
    cand_order = np.argsort(-rel, kind="stable")[:_MMR_CAND]
    cand_ids = ids[cand_order]
    cand_rel = rel[cand_order]
    sims = mat[cand_order] @ mat[cand_order].T

    picked: list[int] = []
    rows = []
    for step in range(1, _MMR_PICKS + 1):
        best_j, best_score = -1, None
        for j in range(_MMR_CAND):
            if j in picked:
                continue
            if picked:
                div = max(int(sims[j, p]) for p in picked)
                score = _MMR_REL_W * int(cand_rel[j]) - _MMR_DIV_W * div
            else:
                score = _MMR_REL_W * int(cand_rel[j])
            if best_score is None or score > best_score or (
                    score == best_score and cand_ids[j] < cand_ids[best_j]):
                best_j, best_score = j, score
        picked.append(best_j)
        rows.append((step, int(cand_ids[best_j]), int(cand_rel[best_j]),
                     int(best_score)))
    return pa.table({
        "pick_order": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "rel_q": pa.array([r[2] for r in rows], pa.int64()),
        "mmr_q": pa.array([r[3] for r in rows], pa.int64()),
    })


def _mmr_sql() -> str:
    head = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS e
  FROM embeddings
), dims AS (
  SELECT unnest(range(1, (SELECT len(e) FROM q LIMIT 1) + 1)) AS d
), rel AS (
  SELECT b.vec_id AS i, sum(a.e[d.d] * b.e[d.d]) AS rel
  FROM q a JOIN q b ON b.vec_id <> {_MMR_QUERY}
  CROSS JOIN dims d
  WHERE a.vec_id = {_MMR_QUERY}
  GROUP BY 1
), cand AS (
  SELECT i, rel FROM rel ORDER BY rel DESC, i LIMIT {_MMR_CAND}
), sims AS (
  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.e[d.d] * b.e[d.d]) AS sim
  FROM q a JOIN q b
    ON a.vec_id IN (SELECT i FROM cand) AND b.vec_id IN (SELECT i FROM cand)
  CROSS JOIN dims d
  GROUP BY 1, 2
), s1 AS (
  SELECT i, rel, {_MMR_REL_W} * rel AS score FROM cand
  ORDER BY rel DESC, i LIMIT 1
)"""
    parts = [head]
    prev_sel = "SELECT i FROM s1"
    for step in range(2, _MMR_PICKS + 1):
        parts.append(f""",
s{step} AS (
  SELECT c.i, c.rel,
         {_MMR_REL_W} * c.rel - {_MMR_DIV_W} * (
           SELECT max(s.sim) FROM sims s
           WHERE s.i = c.i AND s.j IN ({prev_sel})) AS score
  FROM cand c WHERE c.i NOT IN ({prev_sel})
  ORDER BY score DESC, c.i LIMIT 1
)""")
        prev_sel += f" UNION ALL SELECT i FROM s{step}"
    sels = " UNION ALL ".join(
        f"SELECT {k} AS pick_order, i AS vec_id, rel AS rel_q,"
        f" score AS mmr_q FROM s{k}"
        for k in range(1, _MMR_PICKS + 1))
    parts.append(f"\nSELECT CAST(pick_order AS BIGINT) AS pick_order,"
                 f" CAST(vec_id AS BIGINT) AS vec_id,"
                 f" CAST(rel_q AS BIGINT) AS rel_q,"
                 f" CAST(mmr_q AS BIGINT) AS mmr_q FROM ({sels})"
                 f" ORDER BY pick_order")
    return "".join(parts)


SQL_MMR_RERANK = _mmr_sql()


# ---------------------------------------------------------------------------
# bloom_size_advisor
# ---------------------------------------------------------------------------


def bloom_size_advisor(sf_dir: str):
    """Bloom-filter geometry for a 1% false-positive target per join-key
    column: exact distinct keys n, m = ceil(n · 9.585059) bits,
    k = round((m/n) · ln 2) hashes, (m+7)//8 bytes — all from integer
    millionth constants so both engines agree exactly.

    Scale shape: each key column reduces to block-distinct rows, then one
    key-bucketed distinct fold per table — the count is exact, never a
    sketch, because the advisor sizes the production filter."""
    from .queries import _bucketed_agg

    parts = []
    for tbl, col in _BLOOM_TABLES:
        rows = _read(sf_dir, tbl, columns=[col]).map_batches(
            lambda t, c=col, name=tbl: pa.table({
                "tbl": pa.array([name] * t.num_rows, pa.string()),
                "key": pc.cast(t[c], pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }), batch_format="pyarrow")
        parts.append(rows)
    allrows = parts[0].union(*parts[1:])
    per_key = _bucketed_agg(allrows, ["tbl", "key"], {"n": ("n", "sum")})

    def fold(t: pa.Table) -> pa.Table:
        return pa.table({
            "tbl": t["tbl"],
            "n_keys": pa.array(np.ones(t.num_rows, np.int64)),
        })

    counts = (
        per_key.map_batches(fold, batch_format="pyarrow")
        .groupby("tbl").sum("n_keys").to_pandas()
    )
    counts.columns = ["tbl", "n_keys"]
    n = counts["n_keys"].to_numpy(np.int64)
    m_bits = (n * _BLOOM_BITS_PER_KEY_MICRO + 999_999) // 1_000_000
    k_hashes = np.maximum(
        1, (m_bits * _BLOOM_LN2_MICRO + n * 500_000) // (n * 1_000_000))
    out = pd.DataFrame({
        "tbl": counts["tbl"],
        "n_keys": n,
        "m_bits": m_bits,
        "k_hashes": k_hashes,
        "filter_bytes": (m_bits + 7) // 8,
    }).sort_values("tbl").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _bloom_sql() -> str:
    arms = [
        f"SELECT '{tbl}' AS tbl, count(DISTINCT {col}) AS n_keys FROM {tbl}"
        for tbl, col in _BLOOM_TABLES
    ]
    return f"""
WITH counts AS ({" UNION ALL ".join(arms)}),
geo AS (
  SELECT tbl, n_keys,
         (n_keys * {_BLOOM_BITS_PER_KEY_MICRO} + 999999) // 1000000 AS m_bits
  FROM counts
)
SELECT tbl, CAST(n_keys AS BIGINT) AS n_keys, CAST(m_bits AS BIGINT) AS m_bits,
       CAST(greatest(1, (m_bits * {_BLOOM_LN2_MICRO} + n_keys * 500000)
                        // (n_keys * 1000000)) AS BIGINT) AS k_hashes,
       CAST((m_bits + 7) // 8 AS BIGINT) AS filter_bytes
FROM geo ORDER BY tbl
"""


SQL_BLOOM_SIZE_ADVISOR = _bloom_sql()


# ---------------------------------------------------------------------------
# ooo_arrival_audit
# ---------------------------------------------------------------------------


def ooo_arrival_audit(sf_dir: str):
    """Out-of-order arrival audit per event type (arrival order =
    event_id): events arriving behind the running max-ts watermark, the
    adjacent inversions (previous arrival has a later ts), and max/total
    lateness in microseconds — the measurement behind window
    allowed-lateness settings.

    Scale shape: event types are a bounded domain → ONE type-keyed
    shuffle; the watermark scan is a vectorized cummax inside the group;
    the output is type-sized."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        us = g["ts"].astype("int64").to_numpy()
        run = np.maximum.accumulate(us)
        prev_run = np.concatenate([[np.iinfo(np.int64).min], run[:-1]])
        late = prev_run > us
        lateness = np.where(late, prev_run - us, 0)
        adj = np.concatenate([[False], us[1:] < us[:-1]])
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_events": np.int64(len(g)),
            "late_events": np.int64(late.sum()),
            "adj_inversions": np.int64(adj.sum()),
            "max_lateness_us": np.int64(lateness.max(initial=0)),
            "sum_lateness_us": np.int64(lateness.sum()),
        })

    return (
        ev.groupby("event_type")
        .map_groups(_pd_arrow(audit), batch_format="pandas")
        .sort("event_type")
    )


SQL_OOO_ARRIVAL_AUDIT = """
WITH w AS (
  SELECT event_type, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm,
         lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY event_id) AS prev_us
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN wm > us THEN 1 ELSE 0 END) AS BIGINT)
         AS late_events,
       CAST(sum(CASE WHEN prev_us > us THEN 1 ELSE 0 END) AS BIGINT)
         AS adj_inversions,
       CAST(coalesce(max(CASE WHEN wm > us THEN wm - us END), 0) AS BIGINT)
         AS max_lateness_us,
       CAST(sum(CASE WHEN wm > us THEN wm - us ELSE 0 END) AS BIGINT)
         AS sum_lateness_us
FROM w GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# vacuum_plan
# ---------------------------------------------------------------------------


def vacuum_plan(sf_dir: str):
    """Retention sweep plan: per event type, rows past the 14-day TTL
    (measured back from the stream's last day) vs live rows, and the bytes
    a vacuum would reclaim (40 B fixed + props length per row) — the
    compliance read before any delete.

    Scale shape: the TTL boundary is one bounded max; the sweep is a
    zero-shuffle tag map plus one type-sized groupby."""
    from ray.data.aggregate import Max

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "props"])

    def day_col(t: pa.Table) -> pa.Table:
        return t.append_column(
            "day", pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US))

    tagged = ev.map_batches(day_col, batch_format="pyarrow").materialize()
    cutoff = int(tagged.aggregate(Max("day", alias_name="m"))["m"]) \
        - _VACUUM_TTL_DAYS

    def sweep(t: pa.Table) -> pa.Table:
        expired = pc.less(t["day"], cutoff).to_numpy(zero_copy_only=False)
        sizes = np.fromiter((len(p) for p in t["props"].to_pylist()),
                            dtype=np.int64, count=t.num_rows) \
            + _VACUUM_FIXED_ROW_BYTES
        return pa.table({
            "event_type": t["event_type"],
            "expired_rows": pa.array(expired.astype(np.int64)),
            "live_rows": pa.array((~expired).astype(np.int64)),
            "reclaim_bytes": pa.array(np.where(expired, sizes, 0), pa.int64()),
        })

    out = (
        tagged.map_batches(sweep, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["expired_rows", "live_rows", "reclaim_bytes"])
        .to_pandas()
    )
    out.columns = ["event_type", "expired_rows", "live_rows",
                   "reclaim_bytes"]
    out = out.sort_values("event_type").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_VACUUM_PLAN = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         {_VACUUM_FIXED_ROW_BYTES} + length(props) AS row_bytes
  FROM events
), mx AS (SELECT max(day) - {_VACUUM_TTL_DAYS} AS cutoff FROM e)
SELECT event_type,
       CAST(sum(CASE WHEN day < mx.cutoff THEN 1 ELSE 0 END) AS BIGINT)
         AS expired_rows,
       CAST(sum(CASE WHEN day >= mx.cutoff THEN 1 ELSE 0 END) AS BIGINT)
         AS live_rows,
       CAST(sum(CASE WHEN day < mx.cutoff THEN row_bytes ELSE 0 END)
            AS BIGINT) AS reclaim_bytes
FROM e CROSS JOIN mx GROUP BY 1 ORDER BY 1
"""


ADVISORY_REGISTRY = {
    "mmr_rerank": (mmr_rerank, SQL_MMR_RERANK),
    "bloom_size_advisor": (bloom_size_advisor, SQL_BLOOM_SIZE_ADVISOR),
    "ooo_arrival_audit": (ooo_arrival_audit, SQL_OOO_ARRIVAL_AUDIT),
    "vacuum_plan": (vacuum_plan, SQL_VACUUM_PLAN),
}
