"""Operator batch 17 — sketch set-difference auditing, mutual-neighbor pair
mining, personalized PageRank, and schema-evolution union.

Reference anchors: the reference has no sketch/graph/vector surface (its
analytics are exact SQLite aggregates, `src/api/dashboard.py`); these extend
the engine's estimation/mining families in the shapes the 100-TB mission
needs:

- kmv_anotb_audit: KMV set-DIFFERENCE estimator (|A \\ B| from two bottom-k
  sketches, Beyer et al. 2007 union trick) with an exact audit — the
  audience-churn estimator that never shuffles the id sets; the exact side
  is one bucketed per-user flag fold.
- mutual_top1_pairs: reciprocal nearest-neighbor mining over the embedding
  table (the bitext/near-dup pair-mining primitive, Artetxe & Schwenk 2019
  shape): exact integer dot products against a broadcast matrix, top-1 per
  vector with deterministic tie-break, mutuality decided by a pair-count
  fold — a pair survives iff BOTH directions emitted it.
- ppr_seeded: PERSONALIZED PageRank (teleport mass restricted to a seed
  set) over the derived link graph — the seed-expansion/crawl-frontier
  prioritization primitive. Integer mass, 3 unrolled iterations, broadcast
  rank-vector regime (the >5M-node Dataset-join regime is pagerank_topk's
  `_pagerank_join`; this op documents the same switch point).
- schema_evolution_union: union of two parquet snapshots written under
  DIFFERENT schemas (the v1 shard lacks a column added in v2) — v1 blocks
  are null-extended to the v2 schema before the union, the everyday
  data-lake migration read.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .engineops import _DAY_US
from .graphops import _PR_MASS, _make_edges_fn, _n_docs, _outdeg
from .mlqueries import _emb
from .queries import _bucketed_agg, _pd_arrow, _read

_KMV_MULT = 2654435761
_KMV_MOD = 4294967296
_KMV_K = 64

_PPR_ITERS = 3
_PPR_SEED_MOD = 17


# ---------------------------------------------------------------------------
# kmv_anotb_audit
# ---------------------------------------------------------------------------


def kmv_anotb_audit(sf_dir: str):
    """|A \\ B| where A = users active in even-index weeks, B = odd-index
    weeks: KMV estimate from two bottom-64 sketches vs the exact anti-join
    count, plus the signed error — the deployable churn-estimator witness.

    Sketch side: each block reduces to ≤ k hashes per side; the driver
    folds two 64-value arrays (the legitimate O(k) finalize). Exact side:
    ONE bucketed per-user flag fold (max of side indicators), then a
    bounded count — never a distinct shuffle of raw events."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        day = pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US).to_numpy()
        side = ((day // 7) % 2).astype(np.int64)
        h = ((u * _KMV_MULT) % _KMV_MOD).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "side": pa.array(side, pa.int64()),
            "h": pa.array(h, pa.int64()),
        })

    rows = ds.map_batches(prep, batch_format="pyarrow")

    # sketch: block-local bottom-k per side, driver fold of sketch-sized rows
    def bottom_k(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy()
        h = t["h"].to_numpy()
        outs, outh = [], []
        for s in (0, 1):
            hh = np.unique(h[side == s])[:_KMV_K]
            outs.append(np.full(len(hh), s, np.int64))
            outh.append(hh)
        return pa.table({
            "side": pa.array(np.concatenate(outs), pa.int64()),
            "h": pa.array(np.concatenate(outh), pa.int64()),
        })

    sk = rows.map_batches(bottom_k, batch_format="pyarrow").to_pandas()
    ka = np.sort(sk[sk["side"] == 0]["h"].unique())[:_KMV_K]
    kb = np.sort(sk[sk["side"] == 1]["h"].unique())[:_KMV_K]
    un = np.sort(np.union1d(ka, kb))[:_KMV_K]
    k_eff = len(un)
    n_a_only = int((np.isin(un, ka) & ~np.isin(un, kb)).sum())
    if k_eff == _KMV_K:
        est_union = (k_eff - 1) * _KMV_MOD // int(un[-1])
    else:
        est_union = k_eff  # sketch saw every distinct hash
    est_anotb = est_union * n_a_only // k_eff if k_eff else 0

    # exact audit: per-user side flags through one bucketed fold
    def flag_rows(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy()
        return pa.table({
            "user_id": t["user_id"],
            "in_a": pa.array((side == 0).astype(np.int64)),
            "in_b": pa.array((side == 1).astype(np.int64)),
        })

    flags = _bucketed_agg(
        rows.map_batches(flag_rows, batch_format="pyarrow"),
        ["user_id"], {"in_a": ("in_a", "max"), "in_b": ("in_b", "max")},
    )

    def count_aonly(t: pa.Table) -> pa.Table:
        a = t["in_a"].to_numpy()
        b = t["in_b"].to_numpy()
        return pa.table({"c": pa.array([int(((a == 1) & (b == 0)).sum())],
                                       pa.int64())})

    exact = sum(
        b["c"][0].as_py()
        for b in flags.map_batches(count_aonly, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if b.num_rows)

    return pa.table({
        "k_eff": pa.array([k_eff], pa.int64()),
        "n_a_only": pa.array([n_a_only], pa.int64()),
        "est_anotb": pa.array([est_anotb], pa.int64()),
        "exact_anotb": pa.array([int(exact)], pa.int64()),
        "err": pa.array([int(exact) - est_anotb], pa.int64()),
    })


SQL_KMV_ANOTB_AUDIT = """
WITH e AS (
  SELECT user_id, ((epoch_us(ts) // 86400000000) // 7) % 2 AS side FROM events
), h AS (
  SELECT DISTINCT side,
         CAST(CAST(user_id AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT) AS h
  FROM e
), ka AS (SELECT h FROM h WHERE side = 0 ORDER BY h LIMIT 64),
kb AS (SELECT h FROM h WHERE side = 1 ORDER BY h LIMIT 64),
un AS (
  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT 64
), k AS (SELECT count(*) AS k_eff, max(h) AS mx FROM un),
ao AS (
  SELECT count(*) AS n_a_only FROM un
  WHERE h IN (SELECT h FROM ka) AND h NOT IN (SELECT h FROM kb)
), est AS (
  SELECT k.k_eff, ao.n_a_only,
         CASE WHEN k.k_eff = 0 THEN 0
              WHEN k.k_eff = 64
                THEN ((k.k_eff - 1) * 4294967296 // k.mx) * ao.n_a_only // k.k_eff
              ELSE k.k_eff * ao.n_a_only // k.k_eff END AS est_anotb
  FROM k, ao
), ex AS (
  SELECT count(*) AS exact_anotb FROM (
    SELECT user_id FROM e GROUP BY user_id
    HAVING max(CASE WHEN side = 0 THEN 1 ELSE 0 END) = 1
       AND max(CASE WHEN side = 1 THEN 1 ELSE 0 END) = 0)
)
SELECT CAST(est.k_eff AS BIGINT) AS k_eff,
       CAST(est.n_a_only AS BIGINT) AS n_a_only,
       CAST(est.est_anotb AS BIGINT) AS est_anotb,
       CAST(ex.exact_anotb AS BIGINT) AS exact_anotb,
       CAST(ex.exact_anotb - est.est_anotb AS BIGINT) AS err
FROM est, ex
"""


# ---------------------------------------------------------------------------
# mutual_top1_pairs
# ---------------------------------------------------------------------------


def mutual_top1_pairs(sf_dir: str):
    """Reciprocal nearest-neighbor pairs over the embedding table:
    (id_a, id_b, dot_q) where each side is the other's top-1 by exact
    integer dot product (ties → smaller vec_id).

    Scale shape: the quantized matrix is broadcast ONCE (ray.put, zero-copy
    numpy in every task); each block computes its dot rows vectorized and
    emits exactly one normalized pair row per vector; mutuality is a
    pair-count fold (count==2 ⇔ both directions agree) — the brute-force
    exact baseline of the ANN family (knn_ivf is the 100-TB path)."""
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

    def top1(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = t["vec_id"].to_numpy().astype(np.int64)
        bq = np.floor(np.stack(t["embedding"].to_numpy(zero_copy_only=False))
                      .astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
        d = bq @ all_mat.T
        self_col = np.searchsorted(all_ids, bids)
        d[np.arange(len(bids)), self_col] = np.iinfo(np.int64).min
        best = np.argmax(d, axis=1)  # first max = smallest vec_id (sorted)
        nbr = all_ids[best]
        dot = d[np.arange(len(bids)), best]
        a = np.minimum(bids, nbr)
        b = np.maximum(bids, nbr)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "dot_q": pa.array(dot, pa.int64()),
            "n": pa.array(np.ones(len(a), np.int64)),
        })

    agg = _bucketed_agg(
        emb.map_batches(top1, batch_format="pyarrow"),
        ["id_a", "id_b"], {"n": ("n", "sum"), "dot_q": ("dot_q", "min")},
    )

    def mutual(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["n"], 2))
        return t.select(["id_a", "id_b", "dot_q"])

    return agg.map_batches(mutual, batch_format="pyarrow").sort(
        ["id_a", "id_b"])


def _mutual_top1_sql() -> str:
    return """
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
  GROUP BY 1, 2
), t1 AS (
  SELECT i, j, dot,
         row_number() OVER (PARTITION BY i ORDER BY dot DESC, j) AS rn
  FROM dots
), best AS (SELECT i, j, dot FROM t1 WHERE rn = 1)
SELECT a.i AS id_a, a.j AS id_b, CAST(a.dot AS BIGINT) AS dot_q
FROM best a JOIN best b ON a.j = b.i AND b.j = a.i AND a.i < a.j
ORDER BY id_a, id_b
"""


SQL_MUTUAL_TOP1_PAIRS = _mutual_top1_sql()


# ---------------------------------------------------------------------------
# ppr_seeded
# ---------------------------------------------------------------------------


def ppr_seeded(sf_dir: str):
    """Top-20 documents by 3-iteration PERSONALIZED PageRank: teleport mass
    lands only on the seed set (doc_id % 17 == 0) — the seed-expansion /
    frontier-prioritization read. Same integer-mass discipline and link
    graph as pagerank_topk; broadcast rank-vector regime (the Dataset-join
    regime for >5M nodes is `graphops._pagerank_join`'s structure)."""
    n = _n_docs(sf_dir)
    seeds = np.arange(0, n, _PPR_SEED_MOD, dtype=np.int64)
    s = len(seeds)
    base = _PR_MASS // s
    seed_mass = np.zeros(n, dtype=np.int64)
    seed_mass[seeds] = base

    edges = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(_make_edges_fn(n), batch_format="pyarrow")
        .materialize()
    )
    ranks = seed_mass.copy()
    for _ in range(_PPR_ITERS):
        ref = ray.put(ranks)

        def partial_inflow(t: pa.Table) -> pa.Table:
            r = ray.get(ref)
            src = t.column("src").to_numpy()
            dst = t.column("dst").to_numpy()
            c = (r[src] // _outdeg(src, n)).astype(np.float64)
            acc = np.bincount(dst, weights=c, minlength=n).astype(np.int64)
            nz = np.nonzero(acc)[0]
            return pa.table({
                "dst": pa.array(nz, pa.int64()),
                "s": pa.array(acc[nz], pa.int64()),
            })

        infl = np.zeros(n, dtype=np.int64)
        for tbl in edges.map_batches(
            partial_inflow, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            if tbl.num_rows:
                np.add.at(infl, tbl["dst"].to_numpy(), tbl["s"].to_numpy())
        ranks = (15 * seed_mass + 85 * infl) // 100
    order = np.lexsort((np.arange(n), -ranks))[:20]
    return pd.DataFrame({"doc_id": order.astype("int64"),
                         "rank": ranks[order].astype("int64")})


def _ppr_sql() -> str:
    parts = [
        "WITH nodes AS (SELECT doc_id FROM documents),",
        "nn AS (SELECT count(*) AS n FROM documents),",
        f"seeds AS (SELECT doc_id FROM documents WHERE doc_id % {_PPR_SEED_MOD} = 0),",
        "ns AS (SELECT count(*) AS s FROM seeds),",
        "edges AS (SELECT doc_id AS src, (7*doc_id + j.j) % nn.n AS dst",
        "  FROM nodes CROSS JOIN nn CROSS JOIN (SELECT unnest([1,2,3]) AS j) j",
        "  WHERE (7*doc_id + j.j) % nn.n != doc_id),",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),",
        f"r0 AS (SELECT nodes.doc_id, CASE WHEN s.doc_id IS NULL THEN 0"
        f" ELSE {_PR_MASS} // ns.s END AS rank"
        " FROM nodes CROSS JOIN ns LEFT JOIN seeds s ON s.doc_id = nodes.doc_id),",
    ]
    for i in range(_PPR_ITERS):
        tail = "," if i + 1 < _PPR_ITERS else ""
        parts.append(
            f"r{i+1} AS (SELECT nodes.doc_id, CAST((15*(CASE WHEN s.doc_id IS"
            f" NULL THEN 0 ELSE {_PR_MASS} // ns.s END)"
            f" + 85*coalesce(infl.s, 0)) // 100 AS BIGINT) AS rank"
            " FROM nodes CROSS JOIN ns"
            " LEFT JOIN seeds s ON s.doc_id = nodes.doc_id LEFT JOIN"
            f" (SELECT e.dst, sum(r{i}.rank // deg.outdeg) AS s"
            f"  FROM edges e JOIN r{i} ON e.src = r{i}.doc_id"
            "   JOIN deg ON deg.src = e.src GROUP BY 1) infl"
            f" ON infl.dst = nodes.doc_id){tail}"
        )
    parts.append(
        f"SELECT doc_id, rank FROM r{_PPR_ITERS}"
        " ORDER BY rank DESC, doc_id LIMIT 20"
    )
    return "\n".join(parts)


SQL_PPR_SEEDED = _ppr_sql()


# ---------------------------------------------------------------------------
# schema_evolution_union
# ---------------------------------------------------------------------------


def schema_evolution_union(sf_dir: str):
    """Two parquet snapshots under DIFFERENT schemas — the v1 shard (even
    doc_id, written before the `lang` column existed) and the v2 shard (odd
    doc_id, with `lang`) — read back and unioned: v1 blocks are
    null-extended to the v2 schema in a zero-copy map, then ONE bounded
    rollup by coalesced lang. The everyday data-lake migration read."""
    import ray.data

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "source", "n_chars"])
    root = os.path.join(
        tempfile.gettempdir(),
        f"omni_ray_schemaevo_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(root, ignore_errors=True)

    def split(keep_even: bool, cols):
        def f(t: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0 if keep_even else 1)
            return t.filter(m).select(cols)
        return f

    docs.map_batches(split(True, ["doc_id", "source", "n_chars"]),
                     batch_format="pyarrow").write_parquet(f"{root}/v1")
    docs.map_batches(split(False, ["doc_id", "source", "n_chars", "lang"]),
                     batch_format="pyarrow").write_parquet(f"{root}/v2")

    def widen(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return t.append_column(
            "lang", pa.array([None] * t.num_rows, pa.string()))

    v1 = ray.data.read_parquet(f"{root}/v1").map_batches(
        widen, batch_format="pyarrow")
    v2 = ray.data.read_parquet(f"{root}/v2").map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
    cols = ["doc_id", "source", "n_chars", "lang"]
    full = v1.select_columns(cols).union(v2.select_columns(cols))

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang_v": [g["lang_v"].iloc[0]],
            "n_docs": np.int64(len(g)),
            "chars": np.int64(g["n_chars"].sum()),
        })

    tagged = full.map_batches(
        lambda t: pa.table({
            "lang_v": pc.coalesce(t["lang"], pa.scalar("pre_migration")),
            "n_chars": t["n_chars"],
        }), batch_format="pyarrow")
    return (
        tagged.groupby("lang_v")
        .map_groups(_pd_arrow(rollup), batch_format="pandas")
        .sort("lang_v")
    )


SQL_SCHEMA_EVOLUTION_UNION = """
WITH unioned AS (
  SELECT doc_id, source, n_chars, NULL AS lang
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, source, n_chars, lang
  FROM documents WHERE doc_id % 2 = 1
)
SELECT coalesce(lang, 'pre_migration') AS lang_v,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM unioned GROUP BY 1 ORDER BY 1
"""


ESTMINE_REGISTRY = {
    "kmv_anotb_audit": (kmv_anotb_audit, SQL_KMV_ANOTB_AUDIT),
    "mutual_top1_pairs": (mutual_top1_pairs, SQL_MUTUAL_TOP1_PAIRS),
    "ppr_seeded": (ppr_seeded, SQL_PPR_SEEDED),
    "schema_evolution_union": (schema_evolution_union,
                               SQL_SCHEMA_EVOLUTION_UNION),
}
