"""Mixture / graph-structure operators, round 3 batch 13: component-size
census, host-contracted PageRank, temperature-scaled mixture rates,
majority-vote label propagation, and per-doc corpus-boilerplate ratio.

The graph side extends the web-graph suite (pagerank/HITS/triangles/
reciprocity, graphops.py + webscaleops.py) with the two remaining
structural reads a crawl corpus needs: the weakly-connected-component
size census (the shape report behind dedup-cluster and mirror-site
analysis — reuses duplicate_of's hash-to-min propagation, Rastogi et
al., over a sparse derived edge set) and graph CONTRACTION (collapse
the page graph to its host quotient graph, then rank hosts — the
standard host-level authority rollup, one bounded fold because the
quotient domain is hosts², then exact integer power iterations). The
mixture side adds the temperature-scaled sampling-rate table
(p_i ∝ n_i^(1/2), the multinomial source-mixing rule of the GPT-3/PaLM
data recipes at T=2 — sqrt is IEEE-correctly-rounded in BOTH engines,
so unlike pow(x, 0.7) it is bit-exact cross-engine), majority-vote
label propagation (2 fixed supersteps of the classic community/topic
spread, mode with deterministic min-label tie-break), and the per-doc
common-shingle ratio (fraction of a doc's shingles that are corpus-wide
common, df >= 10 — the doc-level boilerplate/templatedness score C4's
line-dedup and our host-level boilerplate_segments look at from the
segment side).

Integer rules (CLAUDE.md): sqrt quantized per element BEFORE any sum or
ratio; all divisions are positive integer floor divisions; PageRank
iterations are exact integer arithmetic unrolled identically in SQL.

Scale shape summary (details per docstring):
- wcc_sizes: sparse edge map → hash-to-min label propagation (O(log n)
  bucketed rounds, stages/dedup.duplicate_groups_distributed) → bounded
  size-of-size fold.
- host_graph_rank: block (host_src, host_dst) combiner → BOUNDED 49-key
  fold → driver integer power iteration on the 7-node quotient graph.
- temperature_mix: bounded groupby(source) count → driver integer table.
- label_propagation_2r: per round ONE bucketed src-keyed label join +
  ONE bucketed dst-keyed mode fold + ONE bucketed id-keyed coalesce; 2
  fixed rounds, state never leaves the Dataset.
- common_shingle_ratio: distinct-shingle explode → ONE bucketed shingle
  shuffle (df computed in-bucket, per-doc partials emitted) → ONE
  bucketed doc_id sum (row-sized key domain → _bucketed_agg).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_WORD = re.compile(r"[a-z]+")


def _n_docs(sf_dir: str) -> int:
    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


# -- wcc_sizes ----------------------------------------------------------------


def wcc_sizes(sf_dir: str):
    """Weakly-connected-component size census over a sparse derived edge
    set (u -> u - 1 - (n_chars % 5) when the target stays inside u's
    16-id block — a forest of data-dependent within-block chains, so
    component structure is decided by the DATA, not by id arithmetic
    alone). Components come from the same hash-to-min label propagation
    duplicate_of ships (Rastogi et al.; O(log n) bucketed rounds, no
    driver union-find); the census then counts nodes per component and
    components per size — both bounded folds. Isolated docs (no edge)
    are out of scope on both sides: the census covers edge-incident
    nodes, the mirror of how dedup-cluster reports treat singletons.

    Output: (comp_size, n_components), the cluster-shape histogram."""
    from ..stages.dedup import duplicate_groups_distributed

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def edges(t: pa.Table) -> pa.Table:
        u = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        v = u - 1 - (nch % 5)
        keep = v >= (u // 16) * 16
        return pa.table({
            "doc_a": pa.array(u[keep], pa.int64()),
            "doc_b": pa.array(v[keep], pa.int64()),
        })

    pairs = ds.map_batches(edges, batch_format="pyarrow")
    # (doc_id, duplicate_of) for every non-minimum member; component size
    # = members per label + 1 (the label node itself)
    comp = duplicate_groups_distributed(pairs)
    sizes = (
        comp.groupby("duplicate_of")
        .aggregate(ray.data.aggregate.Count(alias_name="n_members"))
        .to_pandas()
    )
    hist = (
        (sizes["n_members"] + 1).value_counts().sort_index()
        .rename_axis("comp_size").reset_index(name="n_components")
    )
    hist["comp_size"] = hist["comp_size"].astype("int64")
    hist["n_components"] = hist["n_components"].astype("int64")
    return pa.Table.from_pandas(
        hist, preserve_index=False).replace_schema_metadata(None)


SQL_WCC_SIZES = r"""
WITH RECURSIVE base AS (
  SELECT doc_id AS u, doc_id - 1 - (n_chars % 5) AS v
  FROM documents
  WHERE doc_id - 1 - (n_chars % 5) >= (doc_id // 16) * 16
), e AS (
  SELECT u, v FROM base UNION ALL SELECT v, u FROM base
), reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e)
  UNION
  SELECT e.v, rc.r FROM reach rc JOIN e ON e.u = rc.node
), comp AS (
  SELECT node, min(r) AS label FROM reach GROUP BY node
), sz AS (
  SELECT label, count(*) AS n FROM comp GROUP BY label
)
SELECT CAST(n AS BIGINT) AS comp_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sz GROUP BY n ORDER BY n
"""


# -- host_graph_rank ----------------------------------------------------------

_HGR_MASS = 1_000_000_000_000
_HGR_ITERS = 3
_HGR_HOSTS = 7


def host_graph_rank(sf_dir: str):
    """Host-level authority: contract the shared 3-out page graph
    (dst = (7*src + j) % n, j in 1..3, self-loops dropped — the edge
    convention pagerank/HITS/reciprocity share) to its host quotient
    (host = id % 7), then run 3 exact-integer PageRank iterations on
    the 7-node weighted graph. Contraction is the scale move: the page
    graph is corpus-sized but the quotient domain is hosts² = 49 keys,
    so ONE bounded fold replaces the per-page iterative shuffle and the
    power iteration itself is driver arithmetic on 49 integers —
    mirrored literally (same floor divisions, same damping 85/100) in
    the unrolled SQL twin.

    Output per host: in_w/out_w quotient weights and the final integer
    rank mass (rank_units of 1e12 total)."""
    n = _n_docs(sf_dir)
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def contract(t: pa.Table) -> pa.Table:
        src = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hs_parts, hd_parts = [], []
        for j in (1, 2, 3):
            dst = (7 * src + j) % n
            keep = dst != src
            hs_parts.append(src[keep] % _HGR_HOSTS)
            hd_parts.append(dst[keep] % _HGR_HOSTS)
        df = pd.DataFrame({"hs": np.concatenate(hs_parts),
                           "hd": np.concatenate(hd_parts)})
        p = df.groupby(["hs", "hd"], sort=False).size().reset_index(name="w")
        return pa.Table.from_pandas(
            p, preserve_index=False).replace_schema_metadata(None)

    w = (
        ds.map_batches(contract, batch_format="pyarrow")
        .groupby(["hs", "hd"])
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )
    wm = np.zeros((_HGR_HOSTS, _HGR_HOSTS), np.int64)
    wm[w["hs"].to_numpy(), w["hd"].to_numpy()] = w["w"].to_numpy()
    out_w = wm.sum(axis=1)
    in_w = wm.sum(axis=0)
    r = np.full(_HGR_HOSTS, _HGR_MASS // _HGR_HOSTS, np.int64)
    base = _HGR_MASS * 15 // (100 * _HGR_HOSTS)
    for _ in range(_HGR_ITERS):
        # inflow[d] = sum_s floor(r[s] * w[s,d] / out_w[s]) — exact ints
        contrib = (r[:, None] * wm) // np.maximum(out_w, 1)[:, None]
        r = base + 85 * contrib.sum(axis=0) // 100
    out = pd.DataFrame({
        "host": ["h" + str(h) for h in range(_HGR_HOSTS)],
        "in_w": in_w, "out_w": out_w, "rank_units": r,
    })
    for c in ("in_w", "out_w", "rank_units"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_HOST_GRAPH_RANK = r"""
WITH cnt AS (
  SELECT count(*) AS n FROM documents
), e AS (
  SELECT doc_id % 7 AS hs, ((7 * doc_id + j) % n) % 7 AS hd
  FROM documents, (VALUES (1), (2), (3)) t(j), cnt
  WHERE (7 * doc_id + j) % n <> doc_id
), w AS (
  SELECT hs, hd, count(*) AS w FROM e GROUP BY 1, 2
), ow AS (
  SELECT hs AS h, sum(w) AS out_w FROM w GROUP BY 1
), iw AS (
  SELECT hd AS h, sum(w) AS in_w FROM w GROUP BY 1
), hosts AS (
  SELECT unnest(range(0, 7)) AS h
), r0 AS (
  SELECT h, CAST(1000000000000 // 7 AS BIGINT) AS r FROM hosts
), r1 AS (
  SELECT hosts.h,
         CAST(1000000000000 * 15 // (100 * 7)
              + 85 * coalesce(f.infl, 0) // 100 AS BIGINT) AS r
  FROM hosts LEFT JOIN (
    SELECT w.hd AS h, sum(r0.r * w.w // ow.out_w) AS infl
    FROM w JOIN r0 ON r0.h = w.hs JOIN ow ON ow.h = w.hs GROUP BY 1
  ) f ON f.h = hosts.h
), r2 AS (
  SELECT hosts.h,
         CAST(1000000000000 * 15 // (100 * 7)
              + 85 * coalesce(f.infl, 0) // 100 AS BIGINT) AS r
  FROM hosts LEFT JOIN (
    SELECT w.hd AS h, sum(r1.r * w.w // ow.out_w) AS infl
    FROM w JOIN r1 ON r1.h = w.hs JOIN ow ON ow.h = w.hs GROUP BY 1
  ) f ON f.h = hosts.h
), r3 AS (
  SELECT hosts.h,
         CAST(1000000000000 * 15 // (100 * 7)
              + 85 * coalesce(f.infl, 0) // 100 AS BIGINT) AS r
  FROM hosts LEFT JOIN (
    SELECT w.hd AS h, sum(r2.r * w.w // ow.out_w) AS infl
    FROM w JOIN r2 ON r2.h = w.hs JOIN ow ON ow.h = w.hs GROUP BY 1
  ) f ON f.h = hosts.h
)
SELECT 'h' || r3.h AS host,
       CAST(coalesce(iw.in_w, 0) AS BIGINT) AS in_w,
       CAST(coalesce(ow.out_w, 0) AS BIGINT) AS out_w,
       r3.r AS rank_units
FROM r3
LEFT JOIN iw ON iw.h = r3.h
LEFT JOIN ow ON ow.h = r3.h
ORDER BY r3.h
"""


# -- temperature_mix ----------------------------------------------------------

_TMIX_BUDGET = 100_000


def temperature_mix(sf_dir: str):
    """Temperature-scaled source mixing table: sampling probability
    p_i ∝ n_i^(1/2) (T = 2 temperature flattening — the multinomial
    source-weighting rule of the GPT-3/PaLM data recipes, which
    up-weights small high-quality sources relative to raw proportions).
    Exponent 1/2 is chosen deliberately: sqrt is correctly rounded
    under IEEE 754 in BOTH numpy and DuckDB, so — unlike a libm
    pow(n, 0.7) — the per-source weight is bit-exact cross-engine
    before quantization even starts. Each sqrt is quantized half-up to
    int BEFORE summing, so normalization is pure integer arithmetic.

    Shape: block combiner → bounded groupby(source) count → 20-row
    driver table. Output: rate_ppm and the expected document allocation
    under a 100k-doc sampling budget."""
    ds = _read(sf_dir, "documents", columns=["source"])

    def counts(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": t.column("source").to_pylist()})
        p = df.groupby("source", sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(
            p, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    agg = agg.sort_values("source", kind="mergesort").reset_index(drop=True)
    n = agg["n_docs"].to_numpy().astype(np.int64)
    q = np.floor(np.sqrt(n.astype(np.float64)) * 1_000_000 + 0.5).astype(
        np.int64)
    tq = int(q.sum())
    out = pd.DataFrame({
        "source": agg["source"],
        "n_docs": n,
        "q_sqrt": q,
        "rate_ppm": q * 1_000_000 // tq,
        "exp_docs": _TMIX_BUDGET * q // tq,
    })
    for c in ("n_docs", "q_sqrt", "rate_ppm", "exp_docs"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_TEMPERATURE_MIX = r"""
WITH c AS (
  SELECT source, count(*) AS n FROM documents GROUP BY 1
), q AS (
  SELECT source, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS q
  FROM c
), t AS (
  SELECT sum(q) AS tq FROM q
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       q AS q_sqrt,
       CAST(q * 1000000 // tq AS BIGINT) AS rate_ppm,
       CAST(100000 * q // tq AS BIGINT) AS exp_docs
FROM q, t ORDER BY source
"""


# -- label_propagation_2r -----------------------------------------------------

_LP_ROUNDS = 2
_LP_BUCKETS = 256
# label state is one int64 per node; below this node count the dense label
# vector is broadcast per superstep (same auto-switch as graphops'
# _PR_BCAST_MAX_NODES) — two bucketed map_groups shuffles per round are pure
# overhead on a small graph. Above it, the Dataset-state path is the only
# shape that scales (label state no longer fits a worker heap).
_LP_BCAST_MAX_NODES = 5_000_000


def label_propagation_2r(sf_dir: str):
    """Majority-vote label propagation over the shared 3-out page graph:
    node labels seed from the source index, and each of 2 fixed
    supersteps replaces a node's label with the MODE of its in-neighbor
    labels (ties to the smallest label; nodes with no in-edges keep
    theirs) — the classic community/topic-spread primitive
    (Raghavan et al. 2007), deterministic by construction here.

    Auto-switch on node count (pytest pins both paths equal): below
    _LP_BCAST_MAX_NODES the dense label vector is broadcast each
    superstep and the step is ONE map emitting per-(dst, label) partial
    vote counts folded on the driver (O(n) driver state, the
    _pagerank_broadcast regime; 30 s → 0.7 s at sf0.001 where four
    bucketed map_groups shuffles were pure overhead). Above it, labels
    stay a Dataset (see _label_prop_dataset).
    Output: final label census (label, n_nodes) — a bounded fold."""
    n = _n_docs(sf_dir)
    if n <= _LP_BCAST_MAX_NODES:
        return _label_prop_broadcast(sf_dir, n)
    return _label_prop_dataset(sf_dir, n)


def _label_prop_broadcast(sf_dir: str, n: int):
    """Small-label-state regime: labels live in a dense int64 vector
    indexed by doc_id (ids are 0..n-1 by construction), ray.put once per
    superstep (zero-copy plasma reads in every task). Edges are derived
    per block from doc_id arithmetic — nothing but per-(dst, label)
    partial vote counts (≤ 3 rows per node before block-local fold)
    travels back; the mode + coalesce fold is driver pandas over O(n)
    rows, gated by the threshold above."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    # seed labels: dense vector labels[doc_id] = int(source[3:])
    labels = np.zeros(n, dtype=np.int64)
    for t in docs.iter_batches(batch_format="pyarrow"):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lab = np.fromiter((int(s[3:]) for s in t.column("source").to_pylist()),
                          dtype=np.int64, count=len(ids))
        labels[ids] = lab

    ids_ds = _read(sf_dir, "documents", columns=["doc_id"]).materialize()
    for _ in range(_LP_ROUNDS):
        ref = ray.put(labels)

        def partial_votes(t: pa.Table) -> pa.Table:
            lab = ray.get(ref)
            src = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
                np.int64)
            ds_parts = []
            for j in (1, 2, 3):
                dst = (7 * src + j) % n
                keep = dst != src
                ds_parts.append(np.stack([dst[keep], lab[src[keep]]]))
            dl = np.concatenate(ds_parts, axis=1)
            # block-local (dst, label) fold before anything travels
            uniq, cnt = np.unique(dl, axis=1, return_counts=True)
            return pa.table({
                "dst": pa.array(uniq[0], pa.int64()),
                "label": pa.array(uniq[1], pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            })

        parts = []
        for tbl in ids_ds.map_batches(
            partial_votes, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            if tbl.num_rows:
                parts.append(tbl.to_pandas())
        if not parts:
            continue
        votes = pd.concat(parts, ignore_index=True)
        m = votes.groupby(["dst", "label"], sort=False)["c"].sum().reset_index()
        m = m.sort_values(["dst", "c", "label"],
                          ascending=[True, False, True], kind="mergesort")
        win = m.groupby("dst", sort=False).head(1)
        labels = labels.copy()
        labels[win["dst"].to_numpy()] = win["label"].to_numpy()

    lab_u, cnt = np.unique(labels, return_counts=True)
    return pa.table({
        "label": pa.array(lab_u, pa.int64()),
        "n_nodes": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def _label_prop_dataset(sf_dir: str, n: int):
    """Dataset-state regime: each superstep is TWO bucketed shuffles with
    the label state living in the Dataset: (1) edges tagged by src meet
    labels tagged by id in one bucketed join, emitting per-(dst, label)
    partially-aggregated vote counts; (2) the vote partials meet the
    previous labels in one dst/id-keyed bucketed merge that folds the
    mode AND coalesces with the old label in the same group call. The
    state is materialized per round — it is consumed by BOTH shuffles of
    the next round, and an unmaterialized lineage would re-execute once
    per consumer, doubling work every round (measured: 35 s → 6 s at
    sf0.001; the same per-round materialize
    duplicate_groups_distributed uses)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def seed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lab = np.fromiter((int(s[3:]) for s in t.column("source").to_pylist()),
                          dtype=np.int64, count=len(ids))
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "label": pa.array(lab, pa.int64())})

    labels = ds.map_batches(seed, batch_format="pyarrow")

    # uniform shuffle schema (key, role, aux, label, _kb): role 0 = edge
    # (aux = dst) or old label (aux = vote count 0); role 1 = provider
    # label or vote partial (aux = count)
    def tag_labels(role: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("id").to_numpy(zero_copy_only=False)
            return pa.table({
                "key": t.column("id"),
                "role": pa.array(np.full(len(ids), role), pa.int64()),
                "aux": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
                "label": t.column("label"),
                "_kb": pa.array(ids % _LP_BUCKETS, pa.int64()),
            })
        return f

    def tag_edges(t: pa.Table) -> pa.Table:
        src = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ks, ds_ = [], []
        for j in (1, 2, 3):
            dst = (7 * src + j) % n
            keep = dst != src
            ks.append(src[keep])
            ds_.append(dst[keep])
        key = np.concatenate(ks)
        dst = np.concatenate(ds_)
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "role": pa.array(np.zeros(len(key), np.int64), pa.int64()),
            "aux": pa.array(dst, pa.int64()),
            "label": pa.array(np.full(len(key), -1), pa.int64()),
            "_kb": pa.array(key % _LP_BUCKETS, pa.int64()),
        })

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        prov = g[g["role"] == 1].set_index("key")["label"]
        q = g[g["role"] == 0]
        lab = prov.reindex(q["key"]).to_numpy()
        if np.isnan(lab.astype(np.float64)).any():
            raise RuntimeError("label_propagation: edge src without label")
        # partial vote aggregation before the dst shuffle
        votes = pd.DataFrame({"key": q["aux"].to_numpy(),
                              "label": lab.astype(np.int64)})
        p = (votes.groupby(["key", "label"], sort=False).size()
             .reset_index(name="aux"))
        p["role"] = np.int64(1)
        p["_kb"] = (p["key"] % _LP_BUCKETS).astype(np.int64)
        return p[["key", "role", "aux", "label", "_kb"]].astype("int64")

    def mode_coalesce(g: pd.DataFrame) -> pd.DataFrame:
        votes = g[g["role"] == 1]
        m = (votes.groupby(["key", "label"], sort=False)["aux"].sum()
             .reset_index())
        m = m.sort_values(["key", "aux", "label"],
                          ascending=[True, False, True], kind="mergesort")
        new = m.groupby("key", sort=False).head(1).set_index("key")["label"]
        old = g[g["role"] == 0]
        lab = new.reindex(old["key"]).to_numpy(dtype=np.float64)
        keep = old["label"].to_numpy(dtype=np.float64)
        out = np.where(np.isnan(lab), keep, lab).astype(np.int64)
        return pd.DataFrame({"id": old["key"].to_numpy(),
                             "label": out}).astype("int64")

    edges = ds.map_batches(tag_edges, batch_format="pyarrow").materialize()
    for _ in range(_LP_ROUNDS):
        votes = (
            edges.union(labels.map_batches(tag_labels(1),
                                           batch_format="pyarrow"))
            .groupby("_kb")
            .map_groups(_pd_arrow(vote), batch_format="pandas")
        )
        labels = (
            labels.map_batches(tag_labels(0), batch_format="pyarrow")
            .union(votes)
            .groupby("_kb")
            .map_groups(_pd_arrow(mode_coalesce), batch_format="pandas")
            .materialize()
        )

    out = (
        labels.groupby("label")
        .aggregate(ray.data.aggregate.Count(alias_name="n_nodes"))
        .to_pandas()
    )
    out = out.sort_values("label", kind="mergesort").reset_index(drop=True)
    out["label"] = out["label"].astype("int64")
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_LABEL_PROPAGATION_2R = r"""
WITH cnt AS (
  SELECT count(*) AS n FROM documents
), e AS (
  SELECT doc_id AS src, (7 * doc_id + j) % n AS dst
  FROM documents, (VALUES (1), (2), (3)) t(j), cnt
  WHERE (7 * doc_id + j) % n <> doc_id
), lab0 AS (
  SELECT doc_id AS id, CAST(substr(source, 4) AS BIGINT) AS label
  FROM documents
), v1 AS (
  SELECT e.dst AS id, l.label, count(*) AS c
  FROM e JOIN lab0 l ON l.id = e.src GROUP BY 1, 2
), m1 AS (
  SELECT id, label FROM (
    SELECT id, label,
           row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
    FROM v1
  ) WHERE rn = 1
), lab1 AS (
  SELECT l0.id, coalesce(m1.label, l0.label) AS label
  FROM lab0 l0 LEFT JOIN m1 ON m1.id = l0.id
), v2 AS (
  SELECT e.dst AS id, l.label, count(*) AS c
  FROM e JOIN lab1 l ON l.id = e.src GROUP BY 1, 2
), m2 AS (
  SELECT id, label FROM (
    SELECT id, label,
           row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
    FROM v2
  ) WHERE rn = 1
), lab2 AS (
  SELECT l1.id, coalesce(m2.label, l1.label) AS label
  FROM lab1 l1 LEFT JOIN m2 ON m2.id = l1.id
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM lab2 GROUP BY label ORDER BY label
"""


# -- common_shingle_ratio -----------------------------------------------------

_CSR_K = 3
_CSR_DF = 10


def common_shingle_ratio(sf_dir: str):
    """Per-doc corpus-boilerplate score: the fraction of a document's
    distinct word-3-gram shingles whose corpus document frequency is
    >= 10 — high ratios flag templated/boilerplate-heavy docs whose
    content is mostly corpus-common phrasing (the doc-level view of the
    C4 line-dedup signal; boilerplate_segments gives the host-level
    segment view). Exact, not sketched.

    Shape: distinct-shingle explode bucketed BY SHINGLE (a shingle's
    rows never span buckets, so its df is exact in-bucket) → per-doc
    partial (n_sh, n_common) emitted from each bucket → ONE bucketed
    doc_id sum (_bucketed_agg; row-sized key domain) → ratio map.
    Output: (doc_id, n_sh, n_common, ratio_ppm), docs with >= 1
    shingle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids_out, sh_out = [], []
        for i, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            words = _WORD.findall((x or "").lower())
            seen = set()
            for p in range(len(words) - _CSR_K + 1):
                s = " ".join(words[p:p + _CSR_K])
                if s not in seen:
                    seen.add(s)
                    ids_out.append(i)
                    sh_out.append(s)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
             for s in sh_out), dtype=np.int64, count=len(sh_out))
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "shingle": pa.array(sh_out, pa.string()),
            "_kb": pa.array(h % 256, pa.int64()),
        })

    def doc_partials(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("shingle", sort=False)["doc_id"].transform("size")
        out = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "common": (df.to_numpy() >= _CSR_DF).astype(np.int64),
        })
        p = out.groupby("doc_id", sort=False).agg(
            n_sh=("common", "size"), n_common=("common", "sum")
        ).reset_index()
        return p.astype({"doc_id": "int64", "n_sh": "int64",
                         "n_common": "int64"})

    parts = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(_pd_arrow(doc_partials), batch_format="pandas")
    )
    agg = _bucketed_agg(parts, ["doc_id"],
                        {"n_sh": ("n_sh", "sum"),
                         "n_common": ("n_common", "sum")})

    def finish(t: pa.Table) -> pa.Table:
        n_sh = t.column("n_sh").to_numpy(zero_copy_only=False).astype(np.int64)
        n_c = t.column("n_common").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "n_sh": pa.array(n_sh, pa.int64()),
            "n_common": pa.array(n_c, pa.int64()),
            "ratio_ppm": pa.array(n_c * 1_000_000 // n_sh, pa.int64()),
        })

    out = agg.map_batches(finish, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)


SQL_COMMON_SHINGLE_RATIO = r"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
        FROM w WHERE len(ws) >= 3)
), df AS (
  SELECT s, count(*) AS df FROM sh GROUP BY 1
)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_sh,
       CAST(sum(CASE WHEN df.df >= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_common,
       CAST(sum(CASE WHEN df.df >= 10 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS ratio_ppm
FROM sh JOIN df ON df.s = sh.s
GROUP BY sh.doc_id ORDER BY sh.doc_id
"""


MIXGRAPH_REGISTRY = {
    "wcc_sizes": (wcc_sizes, SQL_WCC_SIZES),
    "host_graph_rank": (host_graph_rank, SQL_HOST_GRAPH_RANK),
    "temperature_mix": (temperature_mix, SQL_TEMPERATURE_MIX),
    "label_propagation_2r": (label_propagation_2r, SQL_LABEL_PROPAGATION_2R),
    "common_shingle_ratio": (common_shingle_ratio, SQL_COMMON_SHINGLE_RATIO),
}
