"""Operator batch 44 — learned-index feasibility, metric-learning QA,
forecast baselines and audit sampling.

Reference anchors: none in the reference; these add:

- learned_index_audit: the RMI-lite feasibility read — predict each
  doc_id's rank by linear interpolation between min and max, measure the
  EXACT position error against true ranks computed distributedly (bin
  histogram → broadcast prefix → in-bin rank inside a bounded bin
  shuffle, never a global sort); error census in bands.
- triplet_violation_audit: metric-learning sanity — over consecutive
  vec_id windows (i, i+1, i+2) forming (anchor, positive, negative)
  triplets (label(i+1) = label(i) ≠ label(i+2)), the share where
  d²(a,p) ≥ d²(a,n) in quantized integer distances.
- seasonal_naive_mae: the forecast-eval floor — mean absolute error of
  the lag-7 seasonal-naive forecast over the second half of the dense
  daily series, per event type, in milli-events.
- monetary_unit_sample: classic audit selection — systematic sampling
  on CUMULATIVE order cents (interval T = total // 20, orderkey order)
  via a distributed two-pass prefix scan (per-block sums → broadcast
  offsets → in-block pick); big orders are proportionally more likely
  to be selected, the point of MUS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .engineops import _DAY_US
from .queries import _pd_arrow, _read

_LI_BINS = 1024
_MUS_K = 20


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# learned_index_audit
# ---------------------------------------------------------------------------


def learned_index_audit(sf_dir: str):
    """Learned-index (linear-interpolation) position error over sorted
    doc_ids: pred(id) = (id − lo)·(n − 1) // (hi − lo); error =
    |pred − rank| with rank = |{smaller ids}| computed distributedly;
    censused in bands (0, 1-10, 11-100, 101-1000, >1000 as bands
    0,1,2,3,4) plus the max error as a summary column.

    Scale shape: a bounded 1024-bin histogram broadcasts the
    below-bin prefix; exact in-bin ranks come from ONE bin-keyed
    shuffle whose groups are ≈ n/1024 rows; the census is bounded."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    agg = ds.aggregate(Min("doc_id"), Max("doc_id"), Count())
    lo, hi, n = (int(agg["min(doc_id)"]), int(agg["max(doc_id)"]),
                 int(agg["count()"]))
    width = max(1, (hi - lo + _LI_BINS) // _LI_BINS)

    def binit(t: pa.Table) -> pa.Table:
        b = (np.asarray(t["doc_id"].to_numpy(), np.int64) - lo) // width
        return pa.table({"bin": pa.array(b, pa.int64())})

    hist = (
        ds.map_batches(binit, batch_format="pyarrow")
        .groupby("bin").aggregate(Count(alias_name="c"))
        .to_pandas().sort_values("bin")
    )
    bins = hist["bin"].to_numpy(np.int64)
    below = np.concatenate([[0], np.cumsum(hist["c"].to_numpy(np.int64))
                            [:-1]])
    bmap = dict(zip(bins.tolist(), below.tolist()))

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(), np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "bin": pa.array((ids - lo) // width, pa.int64()),
        })

    def rank_err(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        base = bmap[int(g["bin"].iloc[0])]
        ranks = base + np.arange(len(ids))
        pred = (ids - lo) * (n - 1) // max(hi - lo, 1)
        err = np.abs(pred - ranks)
        band = np.select([err == 0, err <= 10, err <= 100, err <= 1000],
                         [0, 1, 2, 3], default=4)
        b, c = np.unique(band, return_counts=True)
        out = pd.DataFrame({"band": b, "n_ids": c.astype(np.int64)})
        out["max_err"] = np.int64(err.max() if len(err) else 0)
        return out

    parts = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bin").map_groups(_pd_arrow(rank_err),
                                   batch_format="pandas")
        .to_pandas()
    )
    max_err = int(parts["max_err"].max()) if len(parts) else 0
    out = parts.groupby("band")["n_ids"].sum().reset_index() \
        .sort_values("band").reset_index(drop=True)
    out["max_err"] = np.int64(max_err)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LEARNED_INDEX_AUDIT = """
WITH lims AS (
  SELECT min(doc_id) AS lo, max(doc_id) AS hi, count(*) AS n
  FROM documents
), r AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rank,
         (doc_id - (SELECT lo FROM lims)) * ((SELECT n FROM lims) - 1)
           // greatest((SELECT hi - lo FROM lims), 1) AS pred
  FROM documents
), e AS (
  SELECT abs(pred - rank) AS err FROM r
), banded AS (
  SELECT CASE WHEN err = 0 THEN 0 WHEN err <= 10 THEN 1
              WHEN err <= 100 THEN 2 WHEN err <= 1000 THEN 3
              ELSE 4 END AS band
  FROM e
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_ids,
       CAST((SELECT max(err) FROM e) AS BIGINT) AS max_err
FROM banded GROUP BY band ORDER BY band
"""


# ---------------------------------------------------------------------------
# triplet_violation_audit
# ---------------------------------------------------------------------------


def triplet_violation_audit(sf_dir: str):
    """Metric-learning triplet QA: over consecutive vec_id windows
    (i, i+1, i+2) where label(i) = label(i+1) ≠ label(i+2), the triplet
    (anchor, positive, negative) VIOLATES if d²(a,p) ≥ d²(a,n) in
    integer-millionth quantized distances. One row: triplets found,
    violations, rate ppm.

    Scale shape: the window forms in ONE anchor-bucketed shuffle of the
    three shifted id streams (the suite's sliding-window concat trick);
    distances are vectorized in-bucket."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding",
                                               "label"])

    def shifted(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_numpy(), np.int64)
        lab = np.asarray(t["label"].to_numpy(), np.int64)
        mat = np.stack([np.asarray(v, np.float64)
                        for v in t["embedding"].to_pylist()])
        q = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        cols = {"anchor": [], "role": [], "label": [], "vid": []}
        qcols = [[] for _ in range(q.shape[1])]
        for role in (0, 1, 2):  # row i contributes to anchors i, i-1, i-2
            cols["anchor"].append(ids - role)
            cols["role"].append(np.full(len(ids), role, np.int64))
            cols["label"].append(lab)
            cols["vid"].append(ids)
            for d in range(q.shape[1]):
                qcols[d].append(q[:, d])
        tbl = {k: pa.array(np.concatenate(v), pa.int64())
               for k, v in cols.items()}
        tbl["_kb"] = pa.array(np.concatenate(cols["anchor"]) & 255,
                              pa.int64())
        for d in range(q.shape[1]):
            tbl[f"q{d}"] = pa.array(np.concatenate(qcols[d]), pa.int64())
        return pa.table(tbl)

    dim = 64

    def judge(g: pd.DataFrame) -> pd.DataFrame:
        trip, viol = 0, 0
        qnames = [f"q{d}" for d in range(dim)]
        for _, w in g.groupby("anchor"):
            if len(w) != 3 or set(w["role"]) != {0, 1, 2}:
                continue
            w = w.set_index("role")
            la, lp, ln_ = (int(w.loc[0, "label"]), int(w.loc[1, "label"]),
                           int(w.loc[2, "label"]))
            if not (la == lp and la != ln_):
                continue
            qa = w.loc[0, qnames].to_numpy(np.int64).astype(object)
            qp = w.loc[1, qnames].to_numpy(np.int64).astype(object)
            qn = w.loc[2, qnames].to_numpy(np.int64).astype(object)
            dp = int(sum((qa - qp) ** 2))
            dn = int(sum((qa - qn) ** 2))
            trip += 1
            viol += 1 if dp >= dn else 0
        return pd.DataFrame({"trip": [np.int64(trip)],
                             "viol": np.int64(viol)})

    agg = (
        emb.map_batches(shifted, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(judge), batch_format="pandas")
        .aggregate(Sum("trip", alias_name="t"), Sum("viol", alias_name="v"))
        or {})
    t, v = int(agg.get("t") or 0), int(agg.get("v") or 0)
    out = pd.DataFrame({
        "n_triplets": [np.int64(t)],
        "violations": np.int64(v),
        "violation_ppm": np.int64(v * 1_000_000 // t if t else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_TRIPLET_VIOLATION_AUDIT = """
WITH q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
           AS qe
  FROM embeddings
), trip AS (
  SELECT a.qe AS qa, p.qe AS qp, ng.qe AS qn
  FROM q a JOIN q p ON p.vec_id = a.vec_id + 1
  JOIN q ng ON ng.vec_id = a.vec_id + 2
  WHERE a.label = p.label AND a.label != ng.label
), d AS (
  SELECT list_sum(list_transform(generate_series(1, 64),
           i -> (qa[i] - qp[i]) * (qa[i] - qp[i]))) AS dp,
         list_sum(list_transform(generate_series(1, 64),
           i -> (qa[i] - qn[i]) * (qa[i] - qn[i]))) AS dn
  FROM trip
)
SELECT CAST(count(*) AS BIGINT) AS n_triplets,
       CAST(sum(CASE WHEN dp >= dn THEN 1 ELSE 0 END) AS BIGINT)
         AS violations,
       CAST(CASE WHEN count(*) = 0 THEN 0
                 ELSE sum(CASE WHEN dp >= dn THEN 1 ELSE 0 END)
                      * 1000000 // count(*) END AS BIGINT)
         AS violation_ppm
FROM d
"""


# ---------------------------------------------------------------------------
# seasonal_naive_mae
# ---------------------------------------------------------------------------


def seasonal_naive_mae(sf_dir: str):
    """Forecast-eval floor per event type: the lag-7 seasonal-naive
    forecast x̂_t = x_{t−7} evaluated over the SECOND half of the dense
    daily series — MAE in milli-events/day plus the total absolute
    error. Any real forecaster must beat this number.

    Scale shape: bounded (type, day) groupby → vectorized scan."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
        })

    daily = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    nd = hi - lo + 1
    start = nd // 2  # second half indices [start, nd)
    rows = []
    for etype, g in daily.groupby("event_type"):
        x = np.zeros(nd, np.int64)
        x[g["day"].to_numpy(np.int64) - lo] = g["c"].to_numpy(np.int64)
        idx = np.arange(max(start, 7), nd)
        err = np.abs(x[idx] - x[idx - 7])
        rows.append((etype, len(idx), int(err.sum()),
                     int(err.sum()) * 1000 // len(idx) if len(idx) else 0))
    out = pd.DataFrame(rows, columns=["event_type", "n_days",
                                      "total_abs_err", "mae_milli"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in ("n_days", "total_abs_err", "mae_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SEASONAL_NAIVE_MAE = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (
  SELECT min(day) AS lo, max(day) AS hi,
         max(day) - min(day) + 1 AS nd FROM d
), spine AS (
  SELECT t.event_type, s.i
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(generate_series(
    0, (SELECT nd FROM lims) - 1)) AS i) s
), dense AS (
  SELECT sp.event_type, sp.i, coalesce(d.c, 0) AS x
  FROM spine sp LEFT JOIN d
    ON d.event_type = sp.event_type
   AND d.day = (SELECT lo FROM lims) + sp.i
), err AS (
  SELECT a.event_type, abs(a.x - b.x) AS e
  FROM dense a JOIN dense b
    ON b.event_type = a.event_type AND b.i = a.i - 7
  WHERE a.i >= greatest((SELECT nd FROM lims) // 2, 7)
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(e) AS BIGINT) AS total_abs_err,
       CAST(sum(e) * 1000 // count(*) AS BIGINT) AS mae_milli
FROM err GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# monetary_unit_sample
# ---------------------------------------------------------------------------


def monetary_unit_sample(sf_dir: str):
    """Monetary-unit (dollar-unit) audit sampling: orders in orderkey
    order carry cumulative cent ranges; with interval T = total // 20,
    an order is selected iff its range contains a multiple of T
    (t = 1..20) — big orders are proportionally likelier, the point of
    MUS. Output: the selected orderkeys with their cents and the number
    of sampling hits each absorbs.

    Scale shape: a distributed two-pass prefix scan — per-block cent
    sums (orderkey-ordered blocks) fold to broadcast block offsets; the
    second pass computes in-block cumulative ranges and picks
    selections. No global sort: the table is sorted once on a 2-int64-column
    projection, then both passes scan whole blocks vectorized."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["o_orderkey"],
            "oc": pa.array(_cents(t["o_totalprice"].to_numpy()), pa.int64()),
        })

    # materialize in orderkey order: sort once on the narrow 2-col table
    ordered = orders.map_batches(prep, batch_format="pyarrow") \
        .sort("k").materialize()
    total = int((ordered.aggregate(Sum("oc", alias_name="t")) or {})
                .get("t") or 0)
    interval = total // _MUS_K

    # pass 1: per-block (first key, block sum) -> broadcast offsets.
    # After sort("k") + materialize, blocks hold contiguous key ranges
    # and map_batches with batch_size=None sees whole blocks, so both
    # passes observe identical batching.
    def block_sum(t: pa.Table) -> pa.Table:
        k = np.asarray(t["k"].to_numpy(), np.int64)
        oc = np.asarray(t["oc"].to_numpy(), np.int64)
        return pa.table({"mink": pa.array([int(k.min())], pa.int64()),
                         "s": pa.array([int(oc.sum())], pa.int64())})

    parts = ordered.map_batches(block_sum, batch_size=None,
                                batch_format="pyarrow").to_pandas() \
        .sort_values("mink")
    offs = dict(zip(parts["mink"].tolist(),
                    (parts["s"].cumsum() - parts["s"]).tolist()))

    def pick(t: pa.Table) -> pa.Table:
        k = np.asarray(t["k"].to_numpy(), np.int64)
        oc = np.asarray(t["oc"].to_numpy(), np.int64)
        off = offs[int(k.min())]
        cum = off + np.cumsum(oc)
        start = cum - oc
        t_lo = start // interval
        t_hi = cum // interval  # points t*T with start < t*T <= cum
        hits = np.minimum(t_hi, _MUS_K) - t_lo
        sel = (hits > 0) & (t_lo < _MUS_K)
        return pa.table({
            "o_orderkey": pa.array(k[sel], pa.int64()),
            "cents": pa.array(oc[sel], pa.int64()),
            "n_hits": pa.array(hits[sel], pa.int64()),
        })

    out = ordered.map_batches(pick, batch_size=None,
                              batch_format="pyarrow").to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MONETARY_UNIT_SAMPLE = f"""
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS oc
  FROM orders
), tot AS (SELECT sum(oc) // {_MUS_K} AS interval FROM o),
c AS (
  SELECT k, oc,
         sum(oc) OVER (ORDER BY k) AS cum
  FROM o
), hits AS (
  SELECT k, oc,
         least(cum // (SELECT interval FROM tot), {_MUS_K})
           - (cum - oc) // (SELECT interval FROM tot) AS h,
         (cum - oc) // (SELECT interval FROM tot) AS tl
  FROM c
)
SELECT CAST(k AS BIGINT) AS o_orderkey, CAST(oc AS BIGINT) AS cents,
       CAST(h AS BIGINT) AS n_hits
FROM hits WHERE h > 0 AND tl < {_MUS_K} ORDER BY k
"""


SYSOPS_REGISTRY = {
    "learned_index_audit": (learned_index_audit, SQL_LEARNED_INDEX_AUDIT),
    "triplet_violation_audit": (triplet_violation_audit,
                                SQL_TRIPLET_VIOLATION_AUDIT),
    "seasonal_naive_mae": (seasonal_naive_mae, SQL_SEASONAL_NAIVE_MAE),
    "monetary_unit_sample": (monetary_unit_sample, SQL_MONETARY_UNIT_SAMPLE),
}
