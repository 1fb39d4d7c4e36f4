"""Operator batch 39 — quasi-experiments, hot-key remediation, retry-storm
detection and originality.

Reference anchors: none in the reference; these add:

- did_audit: difference-in-differences of daily purchase vs click volume
  around the stream midpoint — the quasi-experimental read behind "did
  the thing we shipped mid-stream change purchases MORE than the
  baseline series moved?" (scaled integer daily means, exact).
- salting_plan: the remedy to bucket_skew_audit's finding — per hot user
  key (load > 4× mean), the salt factor ⌈load/mean⌉ that splits it, plus
  the projected post-salting max load.
- event_dedup_census: client-retry-storm detection — consecutive events
  of the same (user, type, cents) within 1 s, counted per type.
- originality_census: documents whose 5-gram shingles are ALL unique in
  the corpus (no overlap with any other doc) — the fully-original share
  behind crawl-quality dashboards.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .engineops import _DAY_US
from .queries import _bucketed_agg, _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")

_SALT_HOT_FACTOR = 4
_DEDUP_WINDOW_US = 1_000_000


# ---------------------------------------------------------------------------
# did_audit
# ---------------------------------------------------------------------------


def did_audit(sf_dir: str):
    """Difference-in-differences around the stream midpoint (mid =
    (lo+hi)//2, pre = day ≤ mid): treatment series = purchase daily
    counts, control = click. With day counts n_pre/n_post, the scaled
    means m = count·D // days (D = n_pre·n_post common denominator kept
    integer: we report per-period mean in MILLI events/day:
    count·1000 // days) and did_milli = (t_post − t_pre) − (c_post −
    c_pre). Exact under the shared floor convention.

    Scale shape: one bounded (type, half) groupby after a zero-shuffle
    map."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
        })

    dd = ev.map_batches(prep, batch_format="pyarrow").materialize()
    agg = dd.aggregate(Min("day"), Max("day")) or {}
    lo, hi = int(agg["min(day)"]), int(agg["max(day)"])
    mid = (lo + hi) // 2
    n_pre, n_post = mid - lo + 1, hi - mid

    def halves(t: pa.Table) -> pa.Table:
        d = np.asarray(t["day"].to_numpy(), np.int64)
        return pa.table({
            "event_type": t["event_type"],
            "half": pa.array((d > mid).astype(np.int64), pa.int64()),
        })

    counts = (
        dd.map_batches(halves, batch_format="pyarrow")
        .groupby(["event_type", "half"]).aggregate(Count(alias_name="c"))
        .to_pandas().set_index(["event_type", "half"])["c"]
    )

    def mean_milli(etype, half):
        c = int(counts.get((etype, half), 0))
        days = n_post if half else n_pre
        return c * 1000 // days if days else 0

    t_pre, t_post = mean_milli("purchase", 0), mean_milli("purchase", 1)
    c_pre, c_post = mean_milli("click", 0), mean_milli("click", 1)
    out = pd.DataFrame({
        "treat_pre_milli": [np.int64(t_pre)],
        "treat_post_milli": np.int64(t_post),
        "ctrl_pre_milli": np.int64(c_pre),
        "ctrl_post_milli": np.int64(c_post),
        "did_milli": np.int64((t_post - t_pre) - (c_post - c_pre)),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DID_AUDIT = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day FROM events
), lims AS (
  SELECT min(day) AS lo, max(day) AS hi,
         (min(day) + max(day)) // 2 AS mid
  FROM d
), c AS (
  SELECT event_type, CASE WHEN day > (SELECT mid FROM lims)
                          THEN 1 ELSE 0 END AS half, count(*) AS c
  FROM d GROUP BY 1, 2
), m AS (
  SELECT coalesce(max(CASE WHEN event_type = 'purchase' AND half = 0
                           THEN c END), 0) * 1000
           // ((SELECT mid - lo + 1 FROM lims)) AS tp,
         coalesce(max(CASE WHEN event_type = 'purchase' AND half = 1
                           THEN c END), 0) * 1000
           // ((SELECT hi - mid FROM lims)) AS tq,
         coalesce(max(CASE WHEN event_type = 'click' AND half = 0
                           THEN c END), 0) * 1000
           // ((SELECT mid - lo + 1 FROM lims)) AS cp,
         coalesce(max(CASE WHEN event_type = 'click' AND half = 1
                           THEN c END), 0) * 1000
           // ((SELECT hi - mid FROM lims)) AS cq
  FROM c
)
SELECT CAST(tp AS BIGINT) AS treat_pre_milli,
       CAST(tq AS BIGINT) AS treat_post_milli,
       CAST(cp AS BIGINT) AS ctrl_pre_milli,
       CAST(cq AS BIGINT) AS ctrl_post_milli,
       CAST((tq - tp) - (cq - cp) AS BIGINT) AS did_milli
FROM m
"""


# ---------------------------------------------------------------------------
# salting_plan
# ---------------------------------------------------------------------------


def salting_plan(sf_dir: str):
    """Hot-key remediation: over per-user event counts with mean load
    m = total // n_users, every user with load > 4·m gets a salt factor
    ⌈load/m⌉; reports the hot keys (user, load, salts) plus one summary
    row (user = -1) with the hot-key count and the projected max load
    after salting (max over hot keys of ⌈load/salts⌉, or the cold max).

    Scale shape: per-user loads via ONE user-bucketed fold; hot keys are
    output-sized (skew means few of them); per-bucket cold-max partials
    fold in a bounded aggregate."""
    ev = _read(sf_dir, "events", columns=["user_id"])
    loads = _bucketed_agg(ev, ["user_id"],
                          {"load": ("user_id", "count")}).materialize()
    tot = loads.aggregate(Sum("load", alias_name="t"),
                          Count(alias_name="n")) or {}
    total, n_users = int(tot.get("t") or 0), int(tot.get("n") or 0)
    mean = total // n_users if n_users else 0

    def split(t: pa.Table) -> pa.Table:
        ld = np.asarray(t["load"].to_numpy(), np.int64)
        u = np.asarray(t["user_id"].to_numpy(), np.int64)
        hot = ld > _SALT_HOT_FACTOR * mean
        salts = np.where(hot, -(-ld // max(mean, 1)), 1)
        cold_max = int(ld[~hot].max()) if (~hot).any() else 0
        cols = {
            "user_id": np.concatenate([u[hot], [-2]]),
            "load": np.concatenate([ld[hot], [cold_max]]),
            "salts": np.concatenate([salts[hot], [1]]),
        }
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})

    parts = loads.map_batches(split, batch_format="pyarrow").to_pandas()
    hot = parts[parts["user_id"] >= 0].copy()
    cold_max = int(parts.loc[parts["user_id"] == -2, "load"].max()) \
        if (parts["user_id"] == -2).any() else 0
    salted_max = cold_max
    for _, r in hot.iterrows():
        salted_max = max(salted_max,
                         -(-int(r["load"]) // int(r["salts"])))
    hot = hot.sort_values(["load", "user_id"],
                          ascending=[False, True])
    summary = pd.DataFrame({
        "user_id": [np.int64(-1)], "load": np.int64(salted_max),
        "salts": np.int64(len(hot)),
    })
    out = pd.concat([summary, hot[["user_id", "load", "salts"]]],
                    ignore_index=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SALTING_PLAN = f"""
WITH loads AS (
  SELECT user_id, count(*) AS load FROM events GROUP BY 1
), m AS (
  SELECT sum(load) // count(*) AS mean FROM loads
), hot AS (
  SELECT user_id, load,
         (load + greatest((SELECT mean FROM m), 1) - 1)
           // greatest((SELECT mean FROM m), 1) AS salts
  FROM loads WHERE load > {_SALT_HOT_FACTOR} * (SELECT mean FROM m)
), cold AS (
  SELECT coalesce(max(load), 0) AS cm FROM loads
  WHERE load <= {_SALT_HOT_FACTOR} * (SELECT mean FROM m)
), salted AS (
  SELECT greatest((SELECT cm FROM cold),
                  coalesce(max((load + salts - 1) // salts), 0)) AS sm,
         count(*) AS k
  FROM hot
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(load AS BIGINT) AS load,
       CAST(salts AS BIGINT) AS salts
FROM (
  SELECT -1 AS user_id, (SELECT sm FROM salted) AS load,
         (SELECT k FROM salted) AS salts
  UNION ALL
  SELECT user_id, load, salts FROM hot
) ORDER BY (user_id = -1) DESC, load DESC, user_id
"""


# ---------------------------------------------------------------------------
# event_dedup_census
# ---------------------------------------------------------------------------


def event_dedup_census(sf_dir: str):
    """Retry-storm detection: events repeating the previous event's
    (user, type, cents) within 1 second, counted per type — the census a
    client-side-retry bug shows up in.

    Scale shape: per-user ordered scan inside ONE user-bucketed shuffle;
    the census is a bounded type groupby."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "cents": pa.array(cents, pa.int64()),
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            et = u["event_type"].to_numpy()[order]
            us = u["us"].to_numpy(np.int64)[order]
            cents = u["cents"].to_numpy(np.int64)[order]
            if len(et) < 2:
                continue
            dup = ((et[1:] == et[:-1]) & (cents[1:] == cents[:-1])
                   & (us[1:] - us[:-1] <= _DEDUP_WINDOW_US))
            if dup.any():
                outs.append(pd.DataFrame({"event_type": et[1:][dup]}))
        if not outs:
            return pd.DataFrame({"event_type": pd.Series([], dtype="object")})
        return pd.concat(outs, ignore_index=True)

    dups = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(scan), batch_format="pandas")
        .groupby("event_type").aggregate(Count(alias_name="n_dups"))
        .to_pandas()
    )
    if "event_type" not in dups.columns:  # zero duplicates anywhere
        dups = pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "n_dups": pd.Series([], dtype="int64")})
    types = sorted(
        _read(sf_dir, "events", columns=["event_type"])
        .groupby("event_type").aggregate(Count(alias_name="n"))
        .to_pandas()["event_type"]
    )
    spine = pd.DataFrame({"event_type": types})
    out = spine.merge(dups, on="event_type", how="left").fillna(0)
    out["n_dups"] = out["n_dups"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_EVENT_DEDUP_CENSUS = f"""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents,
         lag(event_type) OVER w AS p_type,
         lag(epoch_us(ts)) OVER w AS p_us,
         lag(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w AS p_cents
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), dups AS (
  SELECT event_type, count(*) AS n_dups FROM seq
  WHERE p_type = event_type AND p_cents = cents
    AND us - p_us <= {_DEDUP_WINDOW_US}
  GROUP BY 1
)
SELECT t.event_type, CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups
FROM (SELECT DISTINCT event_type FROM events) t
LEFT JOIN dups d USING (event_type)
ORDER BY t.event_type
"""


# ---------------------------------------------------------------------------
# originality_census
# ---------------------------------------------------------------------------


def originality_census(sf_dir: str):
    """Fully-original documents: docs ≥ 5 words whose 5-gram shingles are
    ALL unique in the corpus. One row: eligible docs, fully-original
    count, ppm share.

    Scale shape: (shingle, doc) pairs fold through ONE shingle-bucketed
    shuffle; shingles shared by ≥ 2 docs emit their doc ids, which
    dedup through a doc-bucketed distinct fold — the tainted-doc count;
    original = eligible − tainted. No driver-side shingle or doc set."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        sh_l, doc_l = [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            ws = _WORD_RE.findall((tx or "").lower())
            hs = {int(hashlib.md5(" ".join(ws[k:k + 5]).encode())
                      .hexdigest()[:15], 16)
                  for k in range(len(ws) - 4)}
            for h in hs:
                sh_l.append(h)
                doc_l.append(did)
        p = pd.DataFrame({"sh": pd.array(sh_l, "int64"),
                          "doc_id": pd.array(doc_l, "int64")})
        p["_kb"] = (p["sh"].to_numpy(np.int64) & 255).astype(np.int64)
        return p

    pair_ds = ds.map_batches(_pd_arrow(pairs), batch_format="pandas") \
        .materialize()

    def eligible_part(t: pa.Table) -> pa.Table:
        # distinct docs present in the pair table = docs with >= 1 shingle
        d = np.unique(np.asarray(t["doc_id"].to_numpy(), np.int64))
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "_db": pa.array(d & 255, pa.int64())})

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g["doc_id"].nunique())]})

    eligible = int((
        pair_ds.map_batches(eligible_part, batch_format="pyarrow")
        .groupby("_db").map_groups(_pd_arrow(count_distinct),
                                   batch_format="pandas")
        .aggregate(Sum("n", alias_name="n")) or {}).get("n") or 0)

    def tainted_docs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["sh", "doc_id"])
        vc = d.groupby("sh", sort=False)["doc_id"].nunique()
        shared = set(vc[vc >= 2].index)
        t = d[d["sh"].isin(shared)]["doc_id"].unique()
        return pd.DataFrame({"doc_id": pd.array(t, "int64"),
                             "_db": (t & 255).astype(np.int64)})

    tainted = int((
        pair_ds.groupby("_kb")
        .map_groups(_pd_arrow(tainted_docs), batch_format="pandas")
        .groupby("_db").map_groups(_pd_arrow(count_distinct),
                                   batch_format="pandas")
        .aggregate(Sum("n", alias_name="n")) or {}).get("n") or 0)

    orig = eligible - tainted
    out = pd.DataFrame({
        "eligible_docs": [np.int64(eligible)],
        "fully_original": np.int64(orig),
        "original_ppm": np.int64(orig * 1_000_000 // eligible
                                 if eligible else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ORIGINALITY_CENSUS = """
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, h
  FROM (SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(ws) - 4, 0)),
                 k -> CAST(('0x' || substr(md5(ws[k] || ' ' || ws[k+1] ||
                       ' ' || ws[k+2] || ' ' || ws[k+3] || ' ' || ws[k+4]),
                       1, 15)) AS BIGINT))) AS h
        FROM w)
), shared AS (
  SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), tainted AS (
  SELECT DISTINCT doc_id FROM sh JOIN shared USING (h)
), e AS (SELECT count(DISTINCT doc_id) AS eligible FROM sh),
t AS (SELECT count(*) AS tainted FROM tainted)
SELECT CAST((SELECT eligible FROM e) AS BIGINT) AS eligible_docs,
       CAST((SELECT eligible FROM e) - (SELECT tainted FROM t)
            AS BIGINT) AS fully_original,
       CAST(((SELECT eligible FROM e) - (SELECT tainted FROM t)) * 1000000
            // (SELECT eligible FROM e) AS BIGINT) AS original_ppm
FROM e
"""


REMEDYOPS_REGISTRY = {
    "did_audit": (did_audit, SQL_DID_AUDIT),
    "salting_plan": (salting_plan, SQL_SALTING_PLAN),
    "event_dedup_census": (event_dedup_census, SQL_EVENT_DEDUP_CENSUS),
    "originality_census": (originality_census, SQL_ORIGINALITY_CENSUS),
}
