"""Link-graph and snapshot operators, round 3 batch 4: iterative PageRank
over a link graph, snapshot-to-snapshot corpus diff, exact heavy hitters via
two-pass candidate generation, and per-session transition counts.

These cover the graph/delta side of a web-scale crawl engine the relational
suite doesn't: ranking pages by link structure (the canonical iterative
shuffle workload), diffing two crawl epochs to schedule recrawls, and the
sketch-then-verify pattern for hot-key detection. Every operator is
oracle-backed; all arithmetic is integer end-to-end (floor division, no
floats) so Ray and DuckDB agree bit-for-bit.

Scale shapes (details per docstring):
- pagerank_topk: auto-switch on node count. Small rank state: dense rank
  vector broadcast per iteration, ONE map + ONE bucketed inflow reduce.
  Large: per iteration ONE hash join (edges ⋈ ranks on src) + ONE
  groupby(dst) sum + ONE left join back to nodes — the textbook distributed
  PageRank step; k iterations = k rounds of bounded shuffles, never an
  all-pairs or a driver materialization. Rank state lives in a Dataset.
- snapshot_diff: tagged union + ONE groupby — no outer join; min/max hash
  aggregates decide added/removed/changed in a single reduce.
- heavy_hitters: block-local frequency filter (the Misra–Gries pigeonhole:
  any key with global freq > n/K exceeds n_b/K in at least one block) →
  tiny candidate broadcast → exact second-pass count of candidates only.
- transition_counts: per-user lag pairs with in-group partial aggregation,
  then a groupby over the (tiny) pair domain.

Reference parity anchors: the reference keeps per-domain crawl statistics
and re-crawl scheduling in `src/crawler/web_crawler.py` (priority recompute
per cycle) — pagerank/snapshot_diff are the scale-out generalizations of
that read path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .queries import _bucketed_agg, _read, _pd_arrow

# -- pagerank over a deterministic link graph --------------------------------

# PageRank constants, mirrored literally in the SQL oracle: total integer
# mass, damping 85/100, 3 power iterations, 3 out-links per page.
_PR_MASS = 1_000_000_000_000
_PR_ITERS = 3
# rank state is two int64 per node; below this node count it is cheaper to
# broadcast the dense rank vector (8 B/node ≈ 40 MB at the cap) than to pay
# two hash-join shuffle pools per iteration — same auto-switch pattern as
# dedup.PAIR_BROADCAST_MAX. Beyond it, the join path is the only shape that
# scales (rank state no longer fits a worker heap).
_PR_BCAST_MAX_NODES = 5_000_000


def _n_docs(sf_dir: str) -> int:
    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _outdeg(src: np.ndarray, n: int) -> np.ndarray:
    """Out-degree after self-loop removal: dst_j = (7*src + j) % n for
    j in 1..3; dst_j == src iff (6*src + j) % n == 0, at most one j."""
    deg = np.full(len(src), 3, dtype=np.int64)
    for j in (1, 2, 3):
        deg -= ((6 * src + j) % n == 0).astype(np.int64)
    return deg


def pagerank_topk(sf_dir: str):
    """Top-20 documents by 3-iteration integer PageRank over the derived
    link graph (page d links to (7d+j) % n, j=1..3, self-loops dropped).
    Integer mass (10^12 split evenly, damping 85/100 with floor division)
    keeps both engines bit-identical — no float sum-order hazard.

    Auto-switch on node count (pytest pins both paths equal): below
    _PR_BCAST_MAX_NODES the dense rank vector is broadcast each iteration
    and the step is ONE map + ONE bucketed inflow reduce (suite timing
    8.9 s → ~2 s at sf0.1, where two hash-join shuffle pools per iteration
    were pure overhead on a 15k-edge graph); above it, ranks stay a
    Dataset re-derived by edges.join(ranks, on=src) → groupby(dst).sum →
    nodes left-join inflow — the exact shuffle pattern a 10^10-node link
    graph needs."""
    n = _n_docs(sf_dir)
    if n <= _PR_BCAST_MAX_NODES:
        return _pagerank_broadcast(sf_dir, n)
    return _pagerank_join(sf_dir, n)


def _pagerank_broadcast(sf_dir: str, n: int):
    """Small-rank-state regime: ranks live in a dense numpy vector indexed
    by doc_id (ids are 0..n-1 by construction), ray.put once per iteration
    (zero-copy plasma reads in every task); edges stream through one map
    (contrib lookup) and one bucketed dst reduce; the n-row inflow comes
    back to the driver to fold the next vector. O(n) driver state — gated
    by the threshold above."""
    base = _PR_MASS // n
    edges = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(_make_edges_fn(n), batch_format="pyarrow")
        .materialize()
    )
    ranks = np.full(n, base, dtype=np.int64)
    for _ in range(_PR_ITERS):
        ref = ray.put(ranks)

        def partial_inflow(t: pa.Table) -> pa.Table:
            # block-local inflow fold: bincount over float64 is EXACT here
            # (per-dst sums are bounded by the conserved total mass 10^12
            # < 2^53), so only the nonzero slice of each block's inflow
            # vector travels — no shuffle at all in this regime
            r = ray.get(ref)
            src = t.column("src").to_numpy()
            dst = t.column("dst").to_numpy()
            c = (r[src] // _outdeg(src, n)).astype(np.float64)
            s = np.bincount(dst, weights=c, minlength=n).astype(np.int64)
            nz = np.nonzero(s)[0]
            return pa.table({
                "dst": pa.array(nz, pa.int64()),
                "s": pa.array(s[nz], pa.int64()),
            })

        s = np.zeros(n, dtype=np.int64)
        # iter_batches, not to_arrow_refs: empty upstream blocks can surface
        # as empty PANDAS blocks that to_arrow_refs returns unconverted.
        # np.add.at, not fancy-index +=: iter_batches coalesces several
        # tasks' partials into one batch, so a dst can repeat WITHIN a
        # batch and += silently keeps only the last occurrence
        for tbl in edges.map_batches(
            partial_inflow, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            if tbl.num_rows:
                np.add.at(s, tbl["dst"].to_numpy(), tbl["s"].to_numpy())
        ranks = (15 * base + 85 * s) // 100
    order = np.lexsort((np.arange(n), -ranks))[:20]
    return pd.DataFrame({"doc_id": order.astype("int64"),
                         "rank": ranks[order].astype("int64")})


def _make_edges_fn(n: int):
    def make_edges(t: pa.Table) -> pa.Table:
        src = t.column("doc_id").to_numpy()
        srcs, dsts = [], []
        for j in (1, 2, 3):
            dst = (7 * src + j) % n
            keep = dst != src
            srcs.append(src[keep])
            dsts.append(dst[keep])
        return pa.table({
            "src": np.concatenate(srcs), "dst": np.concatenate(dsts),
        })

    return make_edges


def _pagerank_join(sf_dir: str, n: int):
    """Join-regime PageRank: rank state stays a Dataset.

    Iteration discipline: edges and ranks are MATERIALIZED once per round
    (Pregel-style superstep barrier). Both are required, not a convenience:
    lazy chaining would (a) re-execute every earlier iteration's shuffles
    through lineage each round, and (b) stack k×2 concurrent hash-shuffle
    aggregator pools in one streaming execution, which starves the executor
    below ~8 cores. Rank state is O(nodes) — two int64 columns — so the
    barrier holds at any scale where PageRank itself is feasible."""
    base = _PR_MASS // n

    nodes = _read(sf_dir, "documents", columns=["doc_id"]).materialize()
    edges = nodes.map_batches(
        _make_edges_fn(n), batch_format="pyarrow").materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "rank": np.full(len(t), base, dtype=np.int64),
        }),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(_PR_ITERS):
        joined = edges.join(
            ranks, "inner", num_partitions=8,
            on=("src",), right_on=("doc_id",),
        )

        def contrib(t: pa.Table) -> pa.Table:
            src = t.column("src").to_numpy()
            rank = t.column("rank").to_numpy()
            return pa.table({
                "dst": t.column("dst"),
                "contrib": rank // _outdeg(src, n),
            })

        # dst domain = node count (row-sized) -> bucketed combiner
        inflow = _bucketed_agg(
            joined.map_batches(contrib, batch_format="pyarrow"),
            ["dst"], {"s": ("contrib", "sum")},
        )
        with_in = nodes.join(
            inflow, "left_outer", num_partitions=8,
            on=("doc_id",), right_on=("dst",),
        )

        def step(t: pa.Table) -> pa.Table:
            s = pc.fill_null(pc.cast(t.column("s"), pa.int64()), 0).to_numpy()
            return pa.table({
                "doc_id": t.column("doc_id"),
                "rank": (15 * base + 85 * s) // 100,
            })

        ranks = with_in.map_batches(step, batch_format="pyarrow").materialize()

    return (
        ranks.sort(["rank", "doc_id"], descending=[True, False])
        .limit(20).to_pandas()
    )


def _pagerank_sql() -> str:
    parts = [
        "WITH nodes AS (SELECT doc_id FROM documents),",
        "nn AS (SELECT count(*) AS n FROM documents),",
        "edges AS (SELECT doc_id AS src, (7*doc_id + j.j) % nn.n AS dst",
        "  FROM nodes CROSS JOIN nn CROSS JOIN (SELECT unnest([1,2,3]) AS j) j",
        "  WHERE (7*doc_id + j.j) % nn.n != doc_id),",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),",
        f"r0 AS (SELECT doc_id, {_PR_MASS} // nn.n AS rank FROM nodes CROSS JOIN nn),",
    ]
    for i in range(_PR_ITERS):
        tail = "," if i + 1 < _PR_ITERS else ""
        parts.append(
            f"r{i+1} AS (SELECT nodes.doc_id, CAST((15*({_PR_MASS} // nn.n)"
            f" + 85*coalesce(infl.s, 0)) // 100 AS BIGINT) AS rank"
            " FROM nodes CROSS JOIN nn LEFT JOIN"
            f" (SELECT e.dst, sum(r{i}.rank // deg.outdeg) AS s"
            f"  FROM edges e JOIN r{i} ON e.src = r{i}.doc_id"
            "   JOIN deg ON deg.src = e.src GROUP BY 1) infl"
            f" ON infl.dst = nodes.doc_id){tail}"
        )
    parts.append(
        f"SELECT doc_id, rank FROM r{_PR_ITERS}"
        " ORDER BY rank DESC, doc_id LIMIT 20"
    )
    return "\n".join(parts)


SQL_PAGERANK_TOPK = _pagerank_sql()


# -- snapshot diff (crawl epoch N vs N+1) -------------------------------------


def snapshot_diff(sf_dir: str):
    """Diff two corpus snapshots into (doc_id, status ∈ added/removed/
    changed) — the recrawl-scheduling primitive: epoch N+1 is derived
    deterministically from epoch N (docs with id%10==3 vanish, id%10==2
    change content, id%10==4 spawn a new doc at id+n).

    Shape: NO outer join — both snapshots map to (doc_id, code, h=md5) rows,
    concat, ONE groupby(doc_id) with Sum(code)/Min(h)/Max(h) decides the
    status vectorized (code sum 1=removed, 2=added, 3=present in both where
    min(h)!=max(h) means changed). One shuffle of already-reduced rows."""
    n = _n_docs(sf_dir)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        out_id, out_code, out_h = [], [], []
        for i, txt in zip(ids, texts):
            h_old = hashlib.md5(txt.encode()).hexdigest()
            out_id.append(int(i)); out_code.append(1); out_h.append(h_old)
            m = i % 10
            if m != 3:  # survives into the new snapshot
                h_new = (hashlib.md5((txt + ".v2").encode()).hexdigest()
                         if m == 2 else h_old)
                out_id.append(int(i)); out_code.append(2); out_h.append(h_new)
            if m == 4:  # spawns a brand-new doc in the new snapshot
                nid = int(i) + n
                out_id.append(nid); out_code.append(2)
                out_h.append(hashlib.md5(str(nid).encode()).hexdigest())
        return pa.table({
            "doc_id": np.asarray(out_id, dtype=np.int64),
            "code": np.asarray(out_code, dtype=np.int64),
            "h": out_h,
        })

    g = (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("code", alias_name="present"),
                   Min("h", alias_name="hmin"),
                   Max("h", alias_name="hmax"))
    )

    def status(t: pa.Table) -> pa.Table:
        present = t.column("present").to_numpy()
        hmin = t.column("hmin").to_numpy(zero_copy_only=False)
        hmax = t.column("hmax").to_numpy(zero_copy_only=False)
        st = np.where(present == 1, "removed",
                      np.where(present == 2, "added", "changed"))
        keep = (present != 3) | (hmin != hmax)
        return pa.table({
            "doc_id": t.column("doc_id").filter(pa.array(keep)),
            "status": pa.array(st[keep]),
        })

    return g.map_batches(status, batch_format="pyarrow").to_pandas()


SQL_SNAPSHOT_DIFF = """
WITH nn AS (SELECT count(*) AS n FROM documents),
old AS (SELECT doc_id, md5(text) AS h FROM documents),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 2 THEN md5(text || '.v2') ELSE md5(text) END AS h
  FROM documents WHERE doc_id % 10 != 3
  UNION ALL
  SELECT doc_id + nn.n, md5(CAST(doc_id + nn.n AS VARCHAR))
  FROM documents CROSS JOIN nn WHERE doc_id % 10 = 4
),
u AS (SELECT doc_id, 1 AS code, h FROM old
      UNION ALL SELECT doc_id, 2, h FROM new),
g AS (SELECT doc_id, sum(code) AS present, min(h) AS hmin, max(h) AS hmax
      FROM u GROUP BY 1)
SELECT doc_id,
       CASE WHEN present = 1 THEN 'removed'
            WHEN present = 2 THEN 'added' ELSE 'changed' END AS status
FROM g WHERE present != 3 OR hmin != hmax
"""


# -- exact heavy hitters (two-pass sketch-then-verify) ------------------------

_HH_K = 32  # heavy = frequency > n / K


def heavy_hitters(sf_dir: str):
    """Exact heavy hitters over a skewed derived key (floor(sqrt(user_id)) —
    bucket b covers ~2b+1 users, so frequency grows linearly in b): keys
    with global count*K > n, with exact counts.

    Two passes, the scale shape for hot-key detection on 10^10 rows:
    pass 1 keeps keys whose BLOCK-local freq > n_b/K (Misra–Gries
    pigeonhole: a globally heavy key must be locally heavy somewhere), so
    the candidate set is ≤ K per block regardless of key cardinality; the
    tiny candidate list broadcasts, and pass 2 exact-counts candidates only.
    No full-cardinality groupby ever happens."""
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    ev = _read(sf_dir, "events", columns=["user_id"])

    def key_of(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        return pa.table({
            "hh_key": np.floor(np.sqrt(u.astype(np.float64))).astype(np.int64)
        })

    keyed = ev.map_batches(key_of, batch_format="pyarrow")

    def local_heavy(t: pa.Table) -> pa.Table:
        k = t.column("hh_key").to_numpy()
        vals, cnts = np.unique(k, return_counts=True)
        cand = vals[cnts * _HH_K > len(k)]
        return pa.table({"hh_key": cand})

    cand = set(
        keyed.map_batches(local_heavy, batch_format="pyarrow")
        .to_pandas()["hh_key"]
    )
    cand_ref = ray.put(np.array(sorted(cand), dtype=np.int64))

    def filt(t: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        k = t.column("hh_key").to_numpy()
        return pa.table({"hh_key": k[np.isin(k, c)]})

    counts = (
        keyed.map_batches(filt, batch_format="pyarrow")
        .groupby("hh_key").aggregate(Count(alias_name="cnt"))
    )
    out = counts.to_pandas()
    out = out[out["cnt"] * _HH_K > n].reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    return out


SQL_HEAVY_HITTERS = f"""
WITH k AS (
  SELECT CAST(floor(sqrt(user_id)) AS BIGINT) AS hh_key FROM events
)
SELECT hh_key, count(*) AS cnt FROM k GROUP BY 1
HAVING count(*) * {_HH_K} > (SELECT count(*) FROM events)
"""


# -- per-user event-type transitions (lag pairs) -------------------------------


def transition_counts(sf_dir: str):
    """Global (prev_type, next_type) transition counts over each user's
    time-ordered event stream — the Markov-chain read on session data.

    Per-user lag runs inside groupby(user_id).map_groups with IN-GROUP
    partial aggregation (each group emits its pair counts, not its pairs),
    then one groupby over the tiny type×type domain sums partials — the
    combiner-before-shuffle rule."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"prev_type": [], "next_type": [], "c": []})
        df = pd.DataFrame({"prev_type": t[:-1], "next_type": t[1:]})
        out = df.value_counts().reset_index(name="c")
        return out

    partial = ev.groupby("user_id").map_groups(_pd_arrow(pairs), batch_format="pandas")
    out = (
        partial.groupby(["prev_type", "next_type"])
        .aggregate(Sum("c", alias_name="cnt"))
        .to_pandas()
    )
    out["cnt"] = out["cnt"].astype("int64")
    return out


SQL_TRANSITION_COUNTS = """
WITH w AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS prev_type, event_type AS next_type, count(*) AS cnt
FROM w WHERE prev IS NOT NULL GROUP BY 1, 2
"""


# -- co-occurrence-graph suite (shares statops._coorder_edges) ----------------

# the distinct-edge CTE every co-order SQL oracle starts from
_SQL_PAIRS = """
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""


def degree_histogram(sf_dir: str):
    """Degree distribution of the part co-occurrence graph: how many nodes
    have each degree. Two groupbys over already-reduced keys: endpoints
    (map-side concat of u and v columns) -> per-node degree -> per-degree
    node count. The graph-health read every link-analysis pipeline runs
    first; the histogram domain is bounded by max degree, not node count."""
    from .statops import _coorder_edges

    edges = _coorder_edges(sf_dir)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"node": t["u"]}), pa.table({"node": t["v"]})
        ])

    out = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="degree"))
        .groupby("degree").aggregate(Count(alias_name="n_nodes"))
    )
    df = out.to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


SQL_DEGREE_HISTOGRAM = f"""
WITH {_SQL_PAIRS},
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
  ) GROUP BY 1
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1
"""


def khop_reachable(sf_dir: str):
    """BFS reachability from the minimum node id: how many NEW nodes enter
    the reachable set at each hop 0..3 (min-hop semantics). The iterative
    broadcast-frontier regime: the edge entity is materialized once; each
    hop is one map_batches filter against the broadcast frontier (both
    edge directions) + one distinct groupby of the candidate neighbors.
    The visited set lives on the driver — bounded by NODE count (parts,
    not lineitems); past driver memory the same loop switches to the
    dedup.py label-propagation machinery (visited as a Dataset, anti-join
    per hop), which duplicate_of already exercises at 10^6 scale."""
    from ..stages.dedup import _fetch_broadcast
    from .statops import _coorder_edges

    edges = _coorder_edges(sf_dir)
    seed = int(edges.aggregate(Min("u"))["min(u)"])
    visited = {seed}
    frontier = np.array([seed], dtype=np.int64)
    rows = [(0, 1)]
    for hop in (1, 2, 3):
        fr_ref = ray.put(np.sort(frontier))

        def neigh(t: pa.Table, _ref=fr_ref) -> pa.Table:
            fr = _fetch_broadcast(_ref)
            u = t["u"].to_numpy()
            v = t["v"].to_numpy()
            pos_u = np.searchsorted(fr, u)
            in_u = (pos_u < len(fr)) & (fr[np.minimum(pos_u, len(fr) - 1)] == u)
            pos_v = np.searchsorted(fr, v)
            in_v = (pos_v < len(fr)) & (fr[np.minimum(pos_v, len(fr) - 1)] == v)
            return pa.table({
                "node": pa.array(np.concatenate([v[in_u], u[in_v]]), pa.int64()),
            })

        cand = (
            edges.map_batches(neigh, batch_format="pyarrow")
            .groupby("node").aggregate(Count(alias_name="_n"))
            .to_pandas()["node"].to_numpy().astype(np.int64)
        )
        new = np.array([n for n in cand.tolist() if n not in visited],
                       dtype=np.int64)
        if len(new) == 0:
            break  # no row for an empty hop (min-hop table has none either)
        visited.update(new.tolist())
        rows.append((hop, len(new)))
        frontier = new
    df = pd.DataFrame(rows, columns=["hop", "n_new"]).astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


SQL_KHOP_REACHABLE = f"""
WITH RECURSIVE {_SQL_PAIRS},
e AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
r(node, hop) AS (
  SELECT (SELECT min(u) FROM pairs), 0
  UNION
  SELECT e.v, r.hop + 1 FROM r JOIN e ON e.u = r.node WHERE r.hop < 3
),
mh AS (SELECT node, min(hop) AS hop FROM r GROUP BY 1)
SELECT hop, CAST(count(*) AS BIGINT) AS n_new FROM mh GROUP BY 1
"""


def degree_assortativity(sf_dir: str):
    """Degree assortativity of the co-occurrence graph: Pearson r over
    (deg(u), deg(v)) of every directed edge (both orientations), from
    exact integer moment sums — the corr_moments recipe on graph data.
    By symmetry sy = sx and syy = sxx, so r_ppm = floor(1e6 * (n*sxy -
    sx^2) / (n*sxx - sx^2)) — the float step is one IEEE division over
    identical integers in both engines. int64 headroom: n*sxy <
    2E * maxdeg^2 * ... stays under 2^63 through sf0.1 (bounds re-checked
    in the test data: n*sxy ~ 5e18 worst case).

    Shape: the degree table (bounded by NODE count) broadcasts; one map
    pass over edges emits per-block moment partials; one global Sum."""
    from ..stages.dedup import _fetch_broadcast
    from .statops import _coorder_edges

    edges = _coorder_edges(sf_dir)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"node": t["u"]}), pa.table({"node": t["v"]})
        ])

    deg = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="d"))
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    nodes = deg["node"].to_numpy().astype(np.int64)
    ds_arr = deg["d"].to_numpy().astype(np.int64)
    deg_ref = ray.put((nodes, ds_arr))

    def moments(t: pa.Table) -> pa.Table:
        nd, dd = _fetch_broadcast(deg_ref)
        x = dd[np.searchsorted(nd, t["u"].to_numpy())]
        y = dd[np.searchsorted(nd, t["v"].to_numpy())]
        # both orientations: (x,y) and (y,x)
        sx = int(x.sum() + y.sum())
        sxx = int((x * x).sum() + (y * y).sum())
        sxy = int(2 * (x * y).sum())
        return pa.table({
            "n": pa.array([2 * len(t)], pa.int64()),
            "sx": pa.array([sx], pa.int64()),
            "sxx": pa.array([sxx], pa.int64()),
            "sxy": pa.array([sxy], pa.int64()),
        })

    m = edges.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sxx", alias_name="sxx"), Sum("sxy", alias_name="sxy"))
    n, sx = int(m["n"]), int(m["sx"])
    sxx, sxy = int(m["sxx"]), int(m["sxy"])
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    import math
    r_ppm = math.floor(1_000_000.0 * num / float(den)) if den > 0 else None
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "den": pa.array([den], pa.int64()),
        "r_ppm": pa.array([r_ppm], pa.int64()),
    })


SQL_DEGREE_ASSORTATIVITY = f"""
WITH {_SQL_PAIRS},
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
  ) GROUP BY 1
),
dir AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
j AS (
  SELECT du.d AS x, dv.d AS y
  FROM dir JOIN deg du ON du.node = dir.u JOIN deg dv ON dv.node = dir.v
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
         sum(x*x) AS sxx, sum(x*y) AS sxy
  FROM j
)
SELECT n, CAST(n*sxy - sx*sx AS BIGINT) AS num,
       CAST(n*sxx - sx*sx AS BIGINT) AS den,
       CASE WHEN n*sxx - sx*sx > 0 THEN
         CAST(floor(1000000.0 * (n*sxy - sx*sx)
              / CAST(n*sxx - sx*sx AS DOUBLE)) AS BIGINT)
       END AS r_ppm
FROM m
"""


GRAPH_REGISTRY = {
    "pagerank_topk": (pagerank_topk, SQL_PAGERANK_TOPK),
    "snapshot_diff": (snapshot_diff, SQL_SNAPSHOT_DIFF),
    "heavy_hitters": (heavy_hitters, SQL_HEAVY_HITTERS),
    "transition_counts": (transition_counts, SQL_TRANSITION_COUNTS),
    "degree_histogram": (degree_histogram, SQL_DEGREE_HISTOGRAM),
    "khop_reachable": (khop_reachable, SQL_KHOP_REACHABLE),
    "degree_assortativity": (degree_assortativity, SQL_DEGREE_ASSORTATIVITY),
}
