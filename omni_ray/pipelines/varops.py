"""Operator batch 35 — variance structure: CUPED leverage, session
threshold sensitivity, class separation and variance decomposition.

Reference anchors: none in the reference (its analytics stop at counts);
these add the variance-accounting reads:

- cuped_audit: the CUPED pre/post covariance structure over per-user
  purchase cents (pre = first half of the day range, post = second):
  scaled integer moments and rho²_ppm = cov²·10⁶ / (var_pre·var_post) —
  the variance-reduction factor an experimenter gets from regression
  adjustment.
- gap_threshold_sweep: session counts under 15/30/60-minute inactivity
  thresholds in ONE pass — the sensitivity table behind every
  sessionization constant.
- class_separation_matrix: pairwise squared distances between the label
  centroids of the embedding table (centroid dims floor-divided in both
  engines) — the inter-class separation read behind any classifier
  sanity check.
- anova_eta_sources: one-way variance decomposition of document length
  by source: eta²_ppm = (Σ_g ⌊n·S_g²/n_g⌋ − T²)·10⁶ / (n·Σx² − T²)
  (floor-per-group is the documented shared convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .engineops import _DAY_US
from .queries import _bucketed_agg, _pd_arrow, _read

_GAP_THRESHOLDS_S = (900, 1800, 3600)
_EMB_DIM = 64


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# cuped_audit
# ---------------------------------------------------------------------------


def cuped_audit(sf_dir: str):
    """CUPED leverage: per purchasing user, pre = purchase cents in the
    first half of the global day range (day ≤ (lo+hi)//2), post = the
    rest; with scaled moments C = n·Σxy − Σx·Σy, Vx = n·Σx² − (Σx)²,
    Vy likewise, rho2_ppm = C²·10⁶ // (Vx·Vy) — the fraction of post
    variance a CUPED adjustment removes.

    Scale shape: per-user (pre, post) via ONE user-bucketed fold; the
    moments are one global aggregate over per-block partials. (At
    petabyte user counts C² needs >128 bits — normalize the cents scale
    first; exact at any tested sf.)"""
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type",
                                          "value"])

    def days(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            "cents": pa.array(_cents(t["value"].to_numpy()), pa.int64()),
        })

    dd = ev.map_batches(days, batch_format="pyarrow").materialize()
    agg = dd.aggregate(Min("day"), Max("day")) or {}
    mid = (int(agg["min(day)"]) + int(agg["max(day)"])) // 2

    def halves(t: pa.Table) -> pa.Table:
        d = np.asarray(t["day"].to_numpy(), np.int64)
        c = np.asarray(t["cents"].to_numpy(), np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "pre": pa.array(np.where(d <= mid, c, 0), pa.int64()),
            "post": pa.array(np.where(d > mid, c, 0), pa.int64()),
        })

    per_user = _bucketed_agg(
        dd.map_batches(halves, batch_format="pyarrow"), ["user_id"],
        {"x": ("pre", "sum"), "y": ("post", "sum")})

    def moments(t: pa.Table) -> pa.Table:
        x = np.asarray(t["x"].to_numpy(), np.int64).astype(object)
        y = np.asarray(t["y"].to_numpy(), np.int64).astype(object)
        return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in {
            "n": len(x), "sx": sum(x), "sy": sum(y),
            "sxx": sum(v * v for v in x), "syy": sum(v * v for v in y),
            "sxy": sum(a * b for a, b in zip(x, y)),
        }.items()})

    m = per_user.map_batches(moments, batch_format="pyarrow") \
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]) or {}
    n = int(m.get("n") or 0)
    sx, sy = int(m.get("sx") or 0), int(m.get("sy") or 0)
    sxx, syy = int(m.get("sxx") or 0), int(m.get("syy") or 0)
    sxy = int(m.get("sxy") or 0)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    rho2 = cov * cov * 1_000_000 // (vx * vy) if vx and vy else 0
    out = pd.DataFrame({
        "n_users": [np.int64(n)],
        "mean_pre_cents": np.int64(sx // n if n else 0),
        "mean_post_cents": np.int64(sy // n if n else 0),
        "cov_sign": np.int64(0 if cov == 0 else (1 if cov > 0 else -1)),
        "rho2_ppm": np.int64(rho2),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CUPED_AUDIT = f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), lims AS (SELECT (min(day) + max(day)) // 2 AS mid FROM p),
u AS (
  SELECT user_id,
         sum(CASE WHEN day <= (SELECT mid FROM lims)
                  THEN cents ELSE 0 END) AS x,
         sum(CASE WHEN day > (SELECT mid FROM lims)
                  THEN cents ELSE 0 END) AS y
  FROM p GROUP BY 1
), m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM u
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(sx // n AS BIGINT) AS mean_pre_cents,
       CAST(sy // n AS BIGINT) AS mean_post_cents,
       CAST(sign(n * sxy - sx * sy) AS BIGINT) AS cov_sign,
       CAST(CASE WHEN (n * sxx - CAST(sx AS HUGEINT) * sx) = 0
                   OR (n * syy - CAST(sy AS HUGEINT) * sy) = 0 THEN 0
            ELSE (n * sxy - CAST(sx AS HUGEINT) * sy)
                 * (n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
                 // ((n * sxx - CAST(sx AS HUGEINT) * sx)
                     * (n * syy - CAST(sy AS HUGEINT) * sy))
            END AS BIGINT) AS rho2_ppm
FROM m
"""


# ---------------------------------------------------------------------------
# gap_threshold_sweep
# ---------------------------------------------------------------------------


def gap_threshold_sweep(sf_dir: str):
    """Sessionization sensitivity in ONE pass: for inactivity thresholds
    of 15/30/60 minutes, the total session count (users + inter-event
    gaps above the threshold) and events-per-session in milli.

    Scale shape: per-user sorted gap census inside ONE user-bucketed
    shuffle emitting 3 counters per user; bounded aggregate after."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            us = u["us"].to_numpy(np.int64)[order]
            d = np.diff(us)
            row = {"n_events": len(us), "n_users": 1}
            for t_s in _GAP_THRESHOLDS_S:
                row[f"brk{t_s}"] = int((d > t_s * 1_000_000).sum())
            rows.append(row)
        return pd.DataFrame(rows) if rows else pd.DataFrame(
            {k: pd.Series([], "int64")
             for k in ["n_events", "n_users"]
             + [f"brk{t}" for t in _GAP_THRESHOLDS_S]})

    cols = ["n_events", "n_users"] + [f"brk{t}" for t in _GAP_THRESHOLDS_S]
    agg = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(gaps), batch_format="pandas")
        .aggregate(*[Sum(c, alias_name=c) for c in cols]) or {}
    )
    total_ev = int(agg.get("n_events") or 0)
    n_users = int(agg.get("n_users") or 0)
    rows = []
    for t_s in _GAP_THRESHOLDS_S:
        n_sess = n_users + int(agg.get(f"brk{t_s}") or 0)
        rows.append((t_s, n_sess,
                     total_ev * 1000 // n_sess if n_sess else 0))
    out = pd.DataFrame(rows, columns=["threshold_s", "n_sessions",
                                      "events_per_session_milli"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _gap_sql() -> str:
    ths = ", ".join(f"({t})" for t in _GAP_THRESHOLDS_S)
    return f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), th(t) AS (VALUES {ths}),
counts AS (
  SELECT th.t,
         (SELECT count(DISTINCT user_id) FROM events)
           + sum(CASE WHEN seq.prev IS NOT NULL
                       AND seq.us - seq.prev > CAST(th.t AS BIGINT) * 1000000
                      THEN 1 ELSE 0 END) AS n_sess,
         (SELECT count(*) FROM events) AS n_ev
  FROM th CROSS JOIN seq GROUP BY th.t
)
SELECT CAST(t AS BIGINT) AS threshold_s,
       CAST(n_sess AS BIGINT) AS n_sessions,
       CAST(n_ev * 1000 // n_sess AS BIGINT) AS events_per_session_milli
FROM counts ORDER BY t
"""


SQL_GAP_THRESHOLD_SWEEP = _gap_sql()


# ---------------------------------------------------------------------------
# class_separation_matrix
# ---------------------------------------------------------------------------


def class_separation_matrix(sf_dir: str):
    """Pairwise squared distance between label centroids of the embedding
    table: embeddings quantized to integer millionths, centroid dims =
    trunc(Σq/n_g) (the shared truncating-division convention), dist2_scaled =
    Σ(c_a − c_b)² // 10⁶. The inter-class separation table.

    Scale shape: per-block partial (label, dim-sums, count) folds into a
    bounded label groupby; the 45-pair distance scan runs on the bounded
    centroid table."""
    emb = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        lab = np.asarray(t["label"].to_numpy(), np.int64)
        mat = np.stack([np.asarray(v, np.float64)
                        for v in t["embedding"].to_pylist()])
        q = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        cols = {"label": [], "cnt": []}
        for i in range(_EMB_DIM):
            cols[f"s{i}"] = []
        for lb in np.unique(lab):
            m = lab == lb
            cols["label"].append(int(lb))
            cols["cnt"].append(int(m.sum()))
            s = q[m].sum(axis=0)
            for i in range(_EMB_DIM):
                cols[f"s{i}"].append(int(s[i]))
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})

    cent = (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby("label").aggregate(
            Sum("cnt", alias_name="cnt"),
            *[Sum(f"s{i}", alias_name=f"s{i}") for i in range(_EMB_DIM)])
        .to_pandas().sort_values("label").reset_index(drop=True)
    )
    labs = cent["label"].to_numpy(np.int64)
    cnt = cent["cnt"].to_numpy(np.int64)
    sums = cent[[f"s{i}" for i in range(_EMB_DIM)]].to_numpy(np.int64)
    # truncate-toward-zero per dim — DuckDB's // semantics (sums can be
    # negative; Python floor would diverge there)
    cents = np.where(sums < 0, -((-sums) // cnt[:, None]),
                     sums // cnt[:, None])
    rows = []
    for i in range(len(labs)):
        for j in range(i + 1, len(labs)):
            d = cents[i].astype(object) - cents[j].astype(object)
            rows.append((int(labs[i]), int(labs[j]),
                         int(sum(v * v for v in d)) // 10 ** 6))
    out = pd.DataFrame(rows, columns=["label_a", "label_b",
                                      "dist2_scaled"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CLASS_SEPARATION_MATRIX = f"""
WITH q AS (
  SELECT CAST(label AS BIGINT) AS label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qe
  FROM embeddings
), flat AS (
  SELECT label, i, qe[i] AS v
  FROM q, unnest(generate_series(1, {_EMB_DIM})) g(i)
), cent AS (
  SELECT label, i, sum(v) // count(*) AS c FROM flat GROUP BY 1, 2
), pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(CAST(a.c - b.c AS HUGEINT) * (a.c - b.c)) AS d2
  FROM cent a JOIN cent b ON b.label > a.label AND b.i = a.i
  GROUP BY 1, 2
)
SELECT label_a, label_b,
       CAST(d2 // 1000000 AS BIGINT) AS dist2_scaled
FROM pairs ORDER BY label_a, label_b
"""


# ---------------------------------------------------------------------------
# anova_eta_sources
# ---------------------------------------------------------------------------


def anova_eta_sources(sf_dir: str):
    """One-way variance decomposition of n_chars by source: with group
    sums S_g, sizes n_g, total T over n docs, A = Σ_g ⌊n·S_g²/n_g⌋ (the
    documented floor-per-group convention), eta2_ppm = (A − T²)·10⁶ //
    (n·Σx² − T²). High eta² ⇒ source explains document length.

    Scale shape: one bounded source groupby for (S_g, n_g, Σx²); the
    decomposition is a bounded driver fold."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        v = np.asarray(t["n_chars"].to_numpy(), np.int64)
        return pa.table({
            "source": t["source"],
            "s": pa.array(v, pa.int64()),
            "ss": pa.array(v * v, pa.int64()),
            "one": pa.array(np.ones(len(v), np.int64)),
        })

    g = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("source").aggregate(
            Sum("s", alias_name="sg"), Sum("ss", alias_name="ssg"),
            Sum("one", alias_name="ng"))
        .to_pandas()
    )
    n = int(g["ng"].sum())
    t_sum = int(g["sg"].sum())
    sxx = int(g["ssg"].sum())
    a = sum(n * int(r["sg"]) ** 2 // int(r["ng"]) for _, r in g.iterrows())
    ssb = a - t_sum * t_sum
    sst = n * sxx - t_sum * t_sum
    out = pd.DataFrame({
        "n_docs": [np.int64(n)],
        "n_groups": np.int64(len(g)),
        "eta2_ppm": np.int64(ssb * 1_000_000 // sst if sst else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ANOVA_ETA_SOURCES = """
WITH g AS (
  SELECT source, sum(n_chars) AS sg,
         sum(CAST(n_chars AS HUGEINT) * n_chars) AS ssg,
         count(*) AS ng
  FROM documents GROUP BY 1
), tot AS (
  SELECT sum(ng) AS n, sum(sg) AS t, sum(ssg) AS sxx,
         count(*) AS k FROM g
), a AS (
  SELECT sum((SELECT n FROM tot) * CAST(sg AS HUGEINT) * sg // ng) AS a
  FROM g
)
SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_docs,
       CAST((SELECT k FROM tot) AS BIGINT) AS n_groups,
       CAST(CASE WHEN (SELECT n FROM tot) * (SELECT sxx FROM tot)
                      - CAST((SELECT t FROM tot) AS HUGEINT)
                        * (SELECT t FROM tot) = 0 THEN 0
            ELSE ((SELECT a FROM a)
                  - CAST((SELECT t FROM tot) AS HUGEINT)
                    * (SELECT t FROM tot)) * 1000000
                 // ((SELECT n FROM tot) * (SELECT sxx FROM tot)
                     - CAST((SELECT t FROM tot) AS HUGEINT)
                       * (SELECT t FROM tot))
            END AS BIGINT) AS eta2_ppm
FROM tot
"""


VAROPS_REGISTRY = {
    "cuped_audit": (cuped_audit, SQL_CUPED_AUDIT),
    "gap_threshold_sweep": (gap_threshold_sweep, SQL_GAP_THRESHOLD_SWEEP),
    "class_separation_matrix": (class_separation_matrix,
                                SQL_CLASS_SEPARATION_MATRIX),
    "anova_eta_sources": (anova_eta_sources, SQL_ANOVA_ETA_SOURCES),
}
