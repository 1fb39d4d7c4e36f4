"""Operator batch 43 — aggregation pitfalls, weighted-quantile
classification, local graph structure and key continuity.

Reference anchors: none in the reference; these add:

- simpson_flip_audit: Simpson's-paradox detector — the SIGN of the OLS
  slope numerator between document length and distinct-term count,
  pooled vs within each source; groups whose sign contradicts the
  pooled sign are the paradox candidates every aggregate report should
  disclose.
- abc_classification: inventory ABC analysis of parts by lineitem
  revenue — class A covers the first 80% of revenue, B the next 15%, C
  the rest, with the class boundaries found by exact DISTRIBUTED
  WEIGHTED selection (revenue-bin histogram → boundary bins → refine),
  never a global sort of the part table.
- local_clustering_census: local clustering coefficients of the house
  synthetic graph (undirected view), censused in tenth-bands — the
  local companion to the suite's global triangle count.
- pk_gap_audit: primary-key continuity of doc_id — missing-id total,
  gap count and the largest gap; the bulk-load integrity read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .queries import _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")

_ABC_BINS = 1024
_ABC_CUTS_PPM = (800_000, 950_000)


# ---------------------------------------------------------------------------
# simpson_flip_audit
# ---------------------------------------------------------------------------


def simpson_flip_audit(sf_dir: str):
    """Simpson's-paradox audit: slope-numerator sign S = sign(n·Σxy −
    Σx·Σy) of length vs distinct-terms, pooled and per source; reports
    the pooled sign, how many groups agree / disagree / are flat, and
    the number of paradox flips (group sign = −pooled sign).

    Scale shape: per-(source) moment partials fold block-locally into a
    bounded source groupby; the pooled moments are the same partials
    summed — one pass, two bounded folds."""
    ds = _read(sf_dir, "documents", columns=["source", "text", "n_chars"])

    def parts(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        y = np.array([len(set(_WORD_RE.findall((t or "").lower())))
                      for t in df["text"]], np.int64)
        p = pd.DataFrame({"source": df["source"].to_numpy(),
                          "n": 1, "sx": x, "sy": y,
                          "sxy": x * y, "sxx": x * x})
        return p.groupby("source", sort=False).sum().reset_index()

    g = (
        ds.map_batches(_pd_arrow(parts), batch_format="pandas")
        .groupby("source").aggregate(
            *[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy")])
        .to_pandas()
    )

    def slope_sign(n, sx, sy, sxy):
        v = int(n) * int(sxy) - int(sx) * int(sy)
        return 0 if v == 0 else (1 if v > 0 else -1)

    pooled = slope_sign(g["n"].sum(), g["sx"].sum(), g["sy"].sum(),
                        g["sxy"].sum())
    signs = np.array([slope_sign(r["n"], r["sx"], r["sy"], r["sxy"])
                      for _, r in g.iterrows()], np.int64)
    out = pd.DataFrame({
        "pooled_sign": [np.int64(pooled)],
        "n_groups": np.int64(len(g)),
        "n_agree": np.int64(int((signs == pooled).sum())),
        "n_flat": np.int64(int((signs == 0).sum())),
        "n_flips": np.int64(int((signs == -pooled).sum())
                            if pooled else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SIMPSON_FLIP_AUDIT = """
WITH v AS (
  SELECT source, n_chars AS x,
         len(list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                                              '[a-z]+'))) AS y
  FROM documents
), g AS (
  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM v GROUP BY 1
), signs AS (
  SELECT source, sign(n * sxy - CAST(sx AS HUGEINT) * sy) AS s FROM g
), pooled AS (
  SELECT sign(sum(n) * sum(sxy) - CAST(sum(sx) AS HUGEINT) * sum(sy))
           AS ps
  FROM g
)
SELECT CAST((SELECT ps FROM pooled) AS BIGINT) AS pooled_sign,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN s = (SELECT ps FROM pooled)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
       CAST(CASE WHEN (SELECT ps FROM pooled) = 0 THEN 0
                 ELSE sum(CASE WHEN s = -(SELECT ps FROM pooled)
                               THEN 1 ELSE 0 END) END AS BIGINT)
         AS n_flips
FROM signs
"""


# ---------------------------------------------------------------------------
# abc_classification
# ---------------------------------------------------------------------------


def abc_classification(sf_dir: str):
    """ABC inventory analysis: parts ranked by lineitem revenue desc
    (ties by partkey asc); class A = the minimal prefix reaching 80% of
    total revenue, B reaches 95%, C the rest. Census per class: part
    count, revenue cents, share ppm.

    Scale shape: per-part revenue via ONE partkey-bucketed fold; the
    class boundary REVENUE VALUES come from exact distributed WEIGHTED
    selection (equal-width revenue-bin histogram of (count, revenue
    mass) → locate the bins holding the 80/95% cumulative-mass points →
    refine only those bins' parts); tie-splitting at the boundary value
    uses partkey order within the refined bin — the part table is never
    globally sorted."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["l_partkey"],
            "rc": pa.array(np.floor(
                t["l_extendedprice"].to_numpy() * 100 + 0.5
            ).astype(np.int64), pa.int64()),
        })

    from .queries import _bucketed_agg
    rev = _bucketed_agg(li.map_batches(prep, batch_format="pyarrow"),
                        ["k"], {"rc": ("rc", "sum")}).materialize()
    agg = rev.aggregate(Min("rc"), Max("rc"), Sum("rc", alias_name="t"),
                        Count()) or {}
    lo, hi = int(agg["min(rc)"]), int(agg["max(rc)"])
    total, n_parts = int(agg["t"]), int(agg["count()"])
    width = max(1, (hi - lo + _ABC_BINS) // _ABC_BINS)

    def binit(t: pa.Table) -> pa.Table:
        rc = np.asarray(t["rc"].to_numpy(), np.int64)
        return pa.table({
            "bin": pa.array((rc - lo) // width, pa.int64()),
            "c": pa.array(np.ones(len(rc), np.int64)),
            "m": pa.array(rc, pa.int64()),
        })

    hist = (
        rev.map_batches(binit, batch_format="pyarrow")
        .groupby("bin").aggregate(Sum("c", alias_name="c"),
                                  Sum("m", alias_name="m"))
        .to_pandas().sort_values("bin", ascending=False)
    )
    # cumulative revenue mass from the TOP (largest revenue bin first)
    cum_m = hist["m"].cumsum().to_numpy(np.int64)
    bins_desc = hist["bin"].to_numpy(np.int64)
    thresholds = [total * p // 1_000_000 for p in _ABC_CUTS_PPM]
    need_bins = {int(bins_desc[int(np.searchsorted(cum_m, th,
                                                   side="left"))])
                 for th in thresholds}

    def pick(t: pa.Table) -> pa.Table:
        rc = np.asarray(t["rc"].to_numpy(), np.int64)
        k = np.asarray(t["k"].to_numpy(), np.int64)
        m = np.isin((rc - lo) // width, list(need_bins))
        return pa.table({"k": pa.array(k[m], pa.int64()),
                         "rc": pa.array(rc[m], pa.int64())})

    refined = rev.map_batches(pick, batch_format="pyarrow").to_pandas() \
        .sort_values(["rc", "k"], ascending=[False, True])

    # walk: mass above each needed bin + within-bin refined order gives
    # the exact number of parts in each class prefix
    counts = {}
    for th, ppm in zip(thresholds, _ABC_CUTS_PPM):
        bi = int(np.searchsorted(cum_m, th, side="left"))
        b = int(bins_desc[bi])
        above_m = int(cum_m[bi - 1]) if bi > 0 else 0
        above_c = int(hist["c"].to_numpy()[:bi].sum())
        inb = refined[(refined["rc"] - lo) // width == b]
        run, cnt = above_m, above_c
        for _, r in inb.iterrows():
            if run >= th:
                break
            run += int(r["rc"])
            cnt += 1
        counts[ppm] = (cnt, run)
    a_c, a_m = counts[_ABC_CUTS_PPM[0]]
    ab_c, ab_m = counts[_ABC_CUTS_PPM[1]]
    rows = [
        ("A", a_c, a_m),
        ("B", ab_c - a_c, ab_m - a_m),
        ("C", n_parts - ab_c, total - ab_m),
    ]
    out = pd.DataFrame(rows, columns=["abc", "n_parts", "revenue_cents"])
    out["share_ppm"] = (out["revenue_cents"].astype(object) * 1_000_000
                        // total).astype("int64")
    for c in ("n_parts", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ABC_CLASSIFICATION = f"""
WITH rev AS (
  SELECT l_partkey AS k,
         sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS rc
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(rc) AS t, count(*) AS n FROM rev),
ranked AS (
  SELECT k, rc, sum(rc) OVER (ORDER BY rc DESC, k) AS cum
  FROM rev
), classed AS (
  SELECT rc,
         CASE WHEN cum - rc < (SELECT t FROM tot)
                              * {_ABC_CUTS_PPM[0]} // 1000000 THEN 'A'
              WHEN cum - rc < (SELECT t FROM tot)
                              * {_ABC_CUTS_PPM[1]} // 1000000 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rc) AS BIGINT) AS revenue_cents,
       CAST(sum(rc) * 1000000 // (SELECT t FROM tot) AS BIGINT)
         AS share_ppm
FROM classed GROUP BY abc ORDER BY abc
"""


# ---------------------------------------------------------------------------
# local_clustering_census
# ---------------------------------------------------------------------------


def local_clustering_census(sf_dir: str):
    """Local clustering coefficients of the house synthetic graph viewed
    UNDIRECTED (edges src ↔ (7·src+j) mod n, j = 1..3): per node,
    cc = 2·links_among_neighbors / (deg·(deg−1)); censused in
    tenth-bands (band = cc_ppm // 100000, nodes with deg < 2 banded -1).

    Scale shape: adjacency folds per node in ONE node-bucketed shuffle
    (undirected degree ≤ 6 by the formula); the neighbor-link test is
    formulaic arithmetic in-bucket — no second join."""
    nodes = _read(sf_dir, "documents", columns=["doc_id"]).materialize()
    n = nodes.count()

    def undirected(t: pa.Table) -> pa.Table:
        src = np.asarray(t["doc_id"].to_numpy(), np.int64)
        a_l, b_l = [], []
        for j in (1, 2, 3):
            dst = (7 * src + j) % n
            keep = dst != src
            a_l += [src[keep], dst[keep]]
            b_l += [dst[keep], src[keep]]
        a = np.concatenate(a_l)
        b = np.concatenate(b_l)
        return pa.table({
            "node": pa.array(a, pa.int64()),
            "nbr": pa.array(b, pa.int64()),
            "_kb": pa.array(a & 255, pa.int64()),
        })

    def cc(g: pd.DataFrame) -> pd.DataFrame:
        bands = []
        for _, grp in g.groupby("node"):
            nbrs = np.unique(grp["nbr"].to_numpy(np.int64))
            d = len(nbrs)
            if d < 2:
                bands.append(-1)
                continue
            links = 0
            ns = set(nbrs.tolist())
            for u in nbrs:
                for j in (1, 2, 3):
                    v = (7 * int(u) + j) % n
                    if v != u and v in ns:
                        links += 1  # each directed formula edge once
            # undirected links among neighbors: formula edges u->v with
            # both in ns, counted once per direction -> pairs may double
            # only if both directions exist; use ppm of 2L/(d(d-1)) with
            # L = directed count (the shared convention)
            cc_ppm = links * 1_000_000 // (d * (d - 1))
            bands.append(min(cc_ppm // 100_000, 10))
        b, c = np.unique(np.array(bands, np.int64), return_counts=True)
        return pd.DataFrame({"band": b, "n_nodes": c.astype(np.int64)})

    out = (
        nodes.map_batches(undirected, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(cc), batch_format="pandas")
        .groupby("band").sum("n_nodes")
        .to_pandas()
    )
    out.columns = ["band", "n_nodes"]
    out = out.sort_values("band").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LOCAL_CLUSTERING_CENSUS = """
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
  SELECT doc_id AS a, (7 * doc_id + j) % (SELECT c FROM n) AS b
  FROM documents, (SELECT unnest([1, 2, 3]) AS j)
  WHERE (7 * doc_id + j) % (SELECT c FROM n) != doc_id
), und AS (
  SELECT a AS node, b AS nbr FROM e
  UNION
  SELECT b, a FROM e
), deg AS (
  SELECT node, count(*) AS d FROM und GROUP BY 1
), links AS (
  SELECT u1.node, count(*) AS l
  FROM und u1 JOIN e ON e.a = u1.nbr
  JOIN und u2 ON u2.node = u1.node AND u2.nbr = e.b
  WHERE e.b != u1.nbr
  GROUP BY 1
), cc AS (
  SELECT deg.node,
         CASE WHEN deg.d < 2 THEN -1
              ELSE least(coalesce(links.l, 0) * 1000000
                         // (deg.d * (deg.d - 1)) // 100000, 10) END
           AS band
  FROM deg LEFT JOIN links ON links.node = deg.node
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM cc GROUP BY band ORDER BY band
"""


# ---------------------------------------------------------------------------
# pk_gap_audit
# ---------------------------------------------------------------------------


def pk_gap_audit(sf_dir: str):
    """Primary-key continuity of doc_id: total ids missing from
    [min, max], the number of gap runs and the largest gap — the
    bulk-load integrity read.

    Scale shape: one sort of the narrow id column, then each BLOCK scans
    its own sorted ids for internal gaps and emits one summary row
    (min, max, count, runs, max gap); the driver reconciles only the
    bounded per-block boundaries — ids never leave the cluster."""
    ds = _read(sf_dir, "documents", columns=["doc_id"]) \
        .sort("doc_id").materialize()

    def block_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # Ray's sort may emit empty blocks
            return pa.table({k: pa.array([], pa.int64())
                             for k in ("mn", "mx", "n", "runs", "mg")})
        ids = np.sort(np.asarray(t["doc_id"].to_numpy(), np.int64))
        d = np.diff(ids)
        gaps = d[d > 1] - 1
        return pa.table({
            "mn": pa.array([int(ids[0])], pa.int64()),
            "mx": pa.array([int(ids[-1])], pa.int64()),
            "n": pa.array([len(ids)], pa.int64()),
            "runs": pa.array([len(gaps)], pa.int64()),
            "mg": pa.array([int(gaps.max()) if len(gaps) else 0],
                           pa.int64()),
        })

    parts = ds.map_batches(block_stats, batch_size=None,
                           batch_format="pyarrow").to_pandas() \
        .sort_values("mn").reset_index(drop=True)
    lo, hi = int(parts["mn"].iloc[0]), int(parts["mx"].iloc[-1])
    n = int(parts["n"].sum())
    runs = int(parts["runs"].sum())
    mg = int(parts["mg"].max())
    # boundary gaps between consecutive sorted blocks
    for i in range(1, len(parts)):
        b = int(parts["mn"].iloc[i]) - int(parts["mx"].iloc[i - 1]) - 1
        if b > 0:
            runs += 1
            mg = max(mg, b)
    out = pd.DataFrame({
        "n_ids": [np.int64(n)],
        "missing_total": np.int64(hi - lo + 1 - n),
        "n_gap_runs": np.int64(runs),
        "max_gap": np.int64(mg),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_PK_GAP_AUDIT = """
WITH s AS (
  SELECT doc_id, lag(doc_id) OVER (ORDER BY doc_id) AS prev
  FROM documents
), g AS (
  SELECT doc_id - prev - 1 AS gap FROM s
  WHERE prev IS NOT NULL AND doc_id - prev > 1
)
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_ids,
       CAST((SELECT max(doc_id) - min(doc_id) + 1 - count(*)
             FROM documents) AS BIGINT) AS missing_total,
       CAST((SELECT count(*) FROM g) AS BIGINT) AS n_gap_runs,
       CAST((SELECT coalesce(max(gap), 0) FROM g) AS BIGINT) AS max_gap
"""


PARADOXOPS_REGISTRY = {
    "simpson_flip_audit": (simpson_flip_audit, SQL_SIMPSON_FLIP_AUDIT),
    "abc_classification": (abc_classification, SQL_ABC_CLASSIFICATION),
    "local_clustering_census": (local_clustering_census,
                                SQL_LOCAL_CLUSTERING_CENSUS),
    "pk_gap_audit": (pk_gap_audit, SQL_PK_GAP_AUDIT),
}
