"""Operator batch 18 — data-governance and table-maintenance operators.

Reference anchors: the reference has no governance surface (its exports are
plain CSV/JSON dumps, `src/exporters/data_exporter.py`); these add the
audits a 100-TB corpus custodian runs before shipping data:

- kanon_violations: k-ANONYMITY audit — quasi-identifier groups smaller
  than k are re-identification risks (Sweeney 2002); counts risky groups
  and rows per nation without ever collecting the groups themselves.
- fd_violation_audit: functional-dependency profiling (the Tane/Metanome
  family) — candidate FDs lhs→rhs are checked by counting lhs keys bound
  to >1 distinct rhs, the schema-inference / data-quality primitive.
- kcore_peel: iterative k-core decomposition over the derived link graph
  (Matula & Beck 1983 peeling) — 4 unrolled rounds, per-round survivor
  census; the spam-farm / link-ring detection shape.
- compaction_plan: small-file compaction planner — per-source doc stream
  bin-packed into target-size output files by prefix-sum offset; the
  data-lake maintenance step that keeps block sizes healthy for reads.

All integer-exact; floor() (not //) in the SQL twins — DuckDB's // truncates
toward zero on negatives where numpy floor-divides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .graphops import _make_edges_fn, _n_docs
from .queries import _bucketed_agg, _pd_arrow, _read

_KANON_K = 5
_KANON_BAND = 100_000  # acctbal cents per quasi-identifier band ($1000)

_FD_CANDIDATES = [
    ("brand->type", "p_brand", "p_type"),
    ("type->brand", "p_type", "p_brand"),
    ("brand->size", "p_brand", "p_size"),
    ("name->brand", "p_name", "p_brand"),
]

_KCORE_K = 6
_KCORE_ROUNDS = 4

_COMPACT_TARGET = 2_000  # chars per planned output file


# ---------------------------------------------------------------------------
# kanon_violations
# ---------------------------------------------------------------------------


def kanon_violations(sf_dir: str):
    """Per-nation k-anonymity audit over the quasi-identifier triple
    (nation, market segment, $1000 account-balance band): how many QI
    groups have fewer than k=5 members, and how many rows sit in them.

    Scale shape: ONE bucketed QI-group count (row-sized key domain), then
    a bounded per-nation rollup — the risky rows are counted in place,
    never shipped."""
    ds = _read(sf_dir, "customer",
               columns=["c_nationkey", "c_mktsegment", "c_acctbal"])

    def qi(t: pa.Table) -> pa.Table:
        cents = np.floor(t["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({
            "nat": pc.cast(t["c_nationkey"], pa.int64()),
            "seg": t["c_mktsegment"],
            "band": pa.array(cents // _KANON_BAND, pa.int64()),
            "n": pa.array(np.ones(t.num_rows, np.int64)),
        })

    groups = _bucketed_agg(
        ds.map_batches(qi, batch_format="pyarrow"),
        ["nat", "seg", "band"], {"n": ("n", "sum")},
    )

    def per_nation(t: pa.Table) -> pa.Table:
        small = pc.less(t["n"], _KANON_K)
        return pa.table({
            "nat": t["nat"],
            "small_groups": pc.cast(small, pa.int64()),
            "risk_rows": pc.if_else(small, t["n"], pa.scalar(0, pa.int64())),
        })

    return _bucketed_agg(
        groups.map_batches(per_nation, batch_format="pyarrow"),
        ["nat"],
        {"small_groups": ("small_groups", "sum"),
         "risk_rows": ("risk_rows", "sum")},
    ).sort("nat")


SQL_KANON_VIOLATIONS = f"""
WITH qi AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
         CAST(floor(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)
                    / {_KANON_BAND}.0) AS BIGINT) AS band,
         count(*) AS n
  FROM customer GROUP BY 1, 2, 3
)
SELECT nat,
       CAST(sum(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS small_groups,
       CAST(sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
         AS risk_rows
FROM qi GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# fd_violation_audit
# ---------------------------------------------------------------------------


def fd_violation_audit(sf_dir: str):
    """Candidate functional dependencies over `part`: for each lhs→rhs,
    the number of lhs keys, the keys bound to more than one distinct rhs
    (FD violations), and the rows living under violating keys.

    Scale shape: one map emits (fd, lhs, rhs) rows for all candidates at
    once; two bucketed folds — (fd,lhs,rhs) counts, then (fd,lhs) distinct
    census — and a bounded per-fd rollup. No per-candidate rescans."""
    cols = sorted({c for _, a, b in _FD_CANDIDATES for c in (a, b)})
    ds = _read(sf_dir, "part", columns=cols)

    def explode(t: pa.Table) -> pa.Table:
        fds, lhs, rhs, n = [], [], [], []
        for fd, a, b in _FD_CANDIDATES:
            av = pc.cast(t[a], pa.string()).to_pylist()
            bv = pc.cast(t[b], pa.string()).to_pylist()
            fds.extend([fd] * t.num_rows)
            lhs.extend(av)
            rhs.extend(bv)
        return pa.table({
            "fd": pa.array(fds, pa.string()),
            "lhs": pa.array(lhs, pa.string()),
            "rhs": pa.array(rhs, pa.string()),
            "n": pa.array(np.ones(len(fds), np.int64)),
        })

    pair_counts = _bucketed_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["fd", "lhs", "rhs"], {"n": ("n", "sum")},
    )

    def key_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "fd": t["fd"],
            "lhs": t["lhs"],
            "n_rhs": pa.array(np.ones(t.num_rows, np.int64)),
            "rows": t["n"],
        })

    keys = _bucketed_agg(
        pair_counts.map_batches(key_rows, batch_format="pyarrow"),
        ["fd", "lhs"], {"n_rhs": ("n_rhs", "sum"), "rows": ("rows", "sum")},
    )

    def rollup(t: pa.Table) -> pa.Table:
        viol = pc.greater(t["n_rhs"], 1)
        return pa.table({
            "fd": t["fd"],
            "lhs_keys": pa.array(np.ones(t.num_rows, np.int64)),
            "violating_keys": pc.cast(viol, pa.int64()),
            "violating_rows": pc.if_else(viol, t["rows"],
                                         pa.scalar(0, pa.int64())),
        })

    return _bucketed_agg(
        keys.map_batches(rollup, batch_format="pyarrow"),
        ["fd"],
        {"lhs_keys": ("lhs_keys", "sum"),
         "violating_keys": ("violating_keys", "sum"),
         "violating_rows": ("violating_rows", "sum")},
    ).sort("fd")


def _fd_sql() -> str:
    arms = []
    for fd, a, b in _FD_CANDIDATES:
        arms.append(
            f"SELECT '{fd}' AS fd, CAST({a} AS VARCHAR) AS lhs,"
            f" CAST({b} AS VARCHAR) AS rhs FROM part"
        )
    return f"""
WITH pairs AS ({" UNION ALL ".join(arms)}),
keys AS (
  SELECT fd, lhs, count(DISTINCT rhs) AS n_rhs, count(*) AS rows_
  FROM pairs GROUP BY 1, 2
)
SELECT fd, CAST(count(*) AS BIGINT) AS lhs_keys,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_keys,
       CAST(sum(CASE WHEN n_rhs > 1 THEN rows_ ELSE 0 END) AS BIGINT)
         AS violating_rows
FROM keys GROUP BY 1 ORDER BY 1
"""


SQL_FD_VIOLATION_AUDIT = _fd_sql()


# ---------------------------------------------------------------------------
# kcore_peel
# ---------------------------------------------------------------------------


def kcore_peel(sf_dir: str):
    """4-round k-core peeling (k=6) over the UNDIRECTED distinct edge set
    of the derived link graph: per round, the survivor count and the
    doc-id checksum of the surviving core.

    Scale shape: undirected edges deduped by ONE bucketed fold and
    materialized once; each round broadcasts the survivor bitmap (1 B/node
    — the same <5M-node broadcast regime as pagerank_topk, with
    `graphops._pagerank_join` documenting the join-regime switch) and folds
    per-block degree partials into a dense array, exactly PPR's inflow
    discipline."""
    n = _n_docs(sf_dir)

    edges_raw = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(_make_edges_fn(n), batch_format="pyarrow")
    )

    def norm(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return pa.table({
            "a": pa.array(np.minimum(s, d), pa.int64()),
            "b": pa.array(np.maximum(s, d), pa.int64()),
            "n": pa.array(np.ones(len(s), np.int64)),
        })

    edges_u = _bucketed_agg(
        edges_raw.map_batches(norm, batch_format="pyarrow"),
        ["a", "b"], {"n": ("n", "sum")},
    ).select_columns(["a", "b"]).materialize()

    surv = np.ones(n, dtype=bool)
    rounds, survivors, id_sums = [], [], []
    for r in range(1, _KCORE_ROUNDS + 1):
        ref = ray.put(surv)

        def deg_partial(t: pa.Table) -> pa.Table:
            s = ray.get(ref)
            a = t["a"].to_numpy()
            b = t["b"].to_numpy()
            keep = s[a] & s[b]
            acc = np.bincount(a[keep], minlength=n)
            acc += np.bincount(b[keep], minlength=n)
            nz = np.nonzero(acc)[0]
            return pa.table({
                "node": pa.array(nz, pa.int64()),
                "d": pa.array(acc[nz], pa.int64()),
            })

        deg = np.zeros(n, dtype=np.int64)
        for tbl in edges_u.map_batches(
            deg_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            if tbl.num_rows:
                np.add.at(deg, tbl["node"].to_numpy(), tbl["d"].to_numpy())
        surv = deg >= _KCORE_K
        rounds.append(r)
        survivors.append(int(surv.sum()))
        id_sums.append(int(np.flatnonzero(surv).sum()))
    return pa.table({
        "round": pa.array(rounds, pa.int64()),
        "survivors": pa.array(survivors, pa.int64()),
        "id_sum": pa.array(id_sums, pa.int64()),
    })


def _kcore_sql() -> str:
    parts = [
        "WITH nodes AS (SELECT doc_id FROM documents),",
        "nn AS (SELECT count(*) AS n FROM documents),",
        "de AS (SELECT doc_id AS src, (7*doc_id + j.j) % nn.n AS dst",
        "  FROM nodes CROSS JOIN nn CROSS JOIN (SELECT unnest([1,2,3]) AS j) j",
        "  WHERE (7*doc_id + j.j) % nn.n != doc_id),",
        "ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b"
        " FROM de),",
        "s0 AS (SELECT doc_id AS node FROM nodes),",
    ]
    for i in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"d{i} AS (SELECT node, count(*) AS d FROM ("
            f" SELECT a AS node FROM ue"
            f"  WHERE a IN (SELECT node FROM s{i-1})"
            f"    AND b IN (SELECT node FROM s{i-1})"
            f" UNION ALL SELECT b AS node FROM ue"
            f"  WHERE a IN (SELECT node FROM s{i-1})"
            f"    AND b IN (SELECT node FROM s{i-1})) GROUP BY 1),"
        )
        parts.append(
            f"s{i} AS (SELECT node FROM d{i} WHERE d >= {_KCORE_K}),"
        )
    sels = [
        f"SELECT {i} AS round, count(*) AS survivors,"
        f" CAST(coalesce(sum(node), 0) AS BIGINT) AS id_sum FROM s{i}"
        for i in range(1, _KCORE_ROUNDS + 1)
    ]
    body = " UNION ALL ".join(sels)
    return "\n".join(parts)[:-1] + f"\nSELECT * FROM ({body}) ORDER BY round"


SQL_KCORE_PEEL = _kcore_sql()


# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------


def compaction_plan(sf_dir: str):
    """Small-file compaction plan: per source, documents in doc_id order
    are bin-packed into output files of ~2000 chars by prefix-sum start
    offset (file_idx = floor(start / target)); the plan is the bounded
    (source, file_idx) rollup with row and char counts.

    Scale shape: per-source prefix sums inside `map_groups` over a
    source-keyed shuffle — sources are a bounded domain (categories rule),
    so each group is one worker's sort+cumsum; the emitted plan is
    output-sized."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def plan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        chars = g["n_chars"].to_numpy(np.int64)
        start = np.concatenate([[0], np.cumsum(chars)[:-1]])
        fidx = start // _COMPACT_TARGET
        out = pd.DataFrame({
            "source": g["source"].to_numpy(),
            "file_idx": fidx,
            "n_docs": np.ones(len(g), np.int64),
            "chars": chars,
        })
        return (
            out.groupby(["source", "file_idx"], as_index=False)
            .agg(n_docs=("n_docs", "sum"), chars=("chars", "sum"))
        )

    return (
        ds.groupby("source")
        .map_groups(_pd_arrow(plan), batch_format="pandas")
        .sort(["source", "file_idx"])
    )


SQL_COMPACTION_PLAN = f"""
WITH offs AS (
  SELECT source,
         coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start,
         n_chars
  FROM documents
), tagged AS (
  SELECT source, start // {_COMPACT_TARGET} AS file_idx, n_chars FROM offs
)
SELECT source, CAST(file_idx AS BIGINT) AS file_idx,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM tagged GROUP BY 1, 2 ORDER BY 1, 2
"""


GOVERNANCE_REGISTRY = {
    "kanon_violations": (kanon_violations, SQL_KANON_VIOLATIONS),
    "fd_violation_audit": (fd_violation_audit, SQL_FD_VIOLATION_AUDIT),
    "kcore_peel": (kcore_peel, SQL_KCORE_PEEL),
    "compaction_plan": (compaction_plan, SQL_COMPACTION_PLAN),
}
