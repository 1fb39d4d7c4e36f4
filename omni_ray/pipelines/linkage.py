"""Behavioral-linkage / privacy-planning / robust-fit operators (round 4,
batch 71):

- path_edit_distance_pairs: Levenshtein distances between the corpus's
  top-10 user path signatures (day-ordered event-type initials, capped at
  12 chars) — the behavioral-clustering read on top of the signature
  census (user_path_signature's convention). The pair set is top-k ×
  top-k (bounded driver DP); only the signature census touches the fact
  table. The DuckDB twin uses its native levenshtein(), so a green hash
  cross-validates our DP implementation against an independent one.
- kanon_generalization_plan: the k-anonymity generalization ladder — at
  each coarsening level of the (user, time) quasi-identifier
  (L0 exact day … L3 user//1000 + month), how many QI groups fall below
  k = 5 and how many rows sit in them. The privacy-planning twin of
  kanon_violations: that op counts one level, this one derives WHICH
  level first clears the bar. QI domains are row-sized at L0 →
  _bucketed_agg; the per-level summary is bounded.
- ransac_daily_trend: deterministic RANSAC line fit on the daily count
  series — every ordered day pair proposes a line, inliers are counted
  with the cross-multiplied integer test |dy·(xt−xi) − (yt−yi)·dx| ≤
  tol·dx (no division anywhere), the winner maximizes inliers with lex
  (i, j) tie-break. The inlier-maximizing complement to theil_sen_daily's
  median slope; O(d³) with d = observed days, exact integers end-to-end.

Scale shape: all three fold the fact table once into a bounded or
row-sized-keyed summary before any driver math; the O(k²) and O(d³)
stages run over bounded derived tables only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

from .queries import _bucketed_agg, _pd_arrow, _read

_TOP_SIGS = 10
_SIG_LEN = 12
_KANON_K = 5


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def path_edit_distance_pairs(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_id", "user_id",
                                          "event_type"])

    def sig(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["ts"].astype("datetime64[us]")
                                 .astype("int64").to_numpy()))
            s = "".join(t[0] for t in u["event_type"].to_numpy()[order])
            rows.append((s[:_SIG_LEN],))
        return pd.DataFrame(rows, columns=["sig"])

    def kb(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_kb", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int64()))

    census = (
        ev.map_batches(kb, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(sig), batch_format="pandas")
        .groupby("sig").aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    top = census.sort_values(["n_users", "sig"], ascending=[False, True],
                             kind="mergesort").head(_TOP_SIGS) \
        .reset_index(drop=True)
    rows = []
    for i in range(len(top)):
        for j in range(i + 1, len(top)):
            a, b = top.iloc[i], top.iloc[j]
            sa, sb = sorted([str(a["sig"]), str(b["sig"])])
            na = int(a["n_users"]) if sa == a["sig"] else int(b["n_users"])
            nb = int(b["n_users"]) if sa == a["sig"] else int(a["n_users"])
            rows.append((sa, sb, na, nb, _levenshtein(sa, sb)))
    out = pd.DataFrame(rows, columns=["sig_a", "sig_b", "n_users_a",
                                      "n_users_b", "edit_dist"]) \
        .sort_values(["sig_a", "sig_b"]).reset_index(drop=True)
    for c in ("n_users_a", "n_users_b", "edit_dist"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_PATH_EDIT_PAIRS = f"""
WITH sigs AS (
  SELECT user_id,
         substr(string_agg(substr(event_type, 1, 1), ''
                           ORDER BY ts, event_id), 1, {_SIG_LEN}) AS sig
  FROM events GROUP BY 1
), census AS (
  SELECT sig, CAST(count(*) AS BIGINT) AS n_users FROM sigs GROUP BY 1
), top AS (
  SELECT sig, n_users FROM census
  ORDER BY n_users DESC, sig LIMIT {_TOP_SIGS}
)
SELECT a.sig AS sig_a, b.sig AS sig_b,
       a.n_users AS n_users_a, b.n_users AS n_users_b,
       CAST(levenshtein(a.sig, b.sig) AS BIGINT) AS edit_dist
FROM top a JOIN top b ON a.sig < b.sig
"""


def kanon_generalization_plan(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        return pa.table({"user_id": t["user_id"], "day": day})

    keyed = ev.map_batches(prep, batch_format="pyarrow")
    levels = [
        (0, 1, 1), (1, 10, 1), (2, 100, 7), (3, 1000, 30),
    ]
    rows = []
    for lvl, ub, db in levels:
        def gen(t: pa.Table, ub=ub, db=db) -> pa.Table:
            return pa.table({
                "u": pc.divide(t["user_id"], ub),
                "d": pc.divide(t["day"], db),
            })

        groups = _bucketed_agg(
            keyed.map_batches(gen, batch_format="pyarrow"),
            ["u", "d"], {"n": ("u", "count")}).to_pandas()
        viol = groups[groups["n"] < _KANON_K]
        rows.append((lvl, len(groups), len(viol), int(viol["n"].sum())))
    out = pd.DataFrame(rows, columns=["level", "n_groups",
                                      "n_violating_groups", "n_rows_at_risk"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_KANON_PLAN = f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), lv AS (
  SELECT unnest([0, 1, 2, 3]) AS level,
         unnest([1, 10, 100, 1000]) AS ub,
         unnest([1, 1, 7, 30]) AS db
), g AS (
  SELECT lv.level, base.user_id // lv.ub AS u, base.day // lv.db AS d,
         count(*) AS n
  FROM base CROSS JOIN lv
  GROUP BY 1, 2, 3
)
SELECT level,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk
FROM g GROUP BY 1
"""


def ransac_daily_trend(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts"])

    def day(t: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
        })

    daily = (
        ev.map_batches(day, batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="cnt"))
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    y = daily["cnt"].to_numpy(np.int64)
    d = len(y)
    tol = max(1, (int(y.max()) - int(y.min())) // 20)
    best = None  # (-inliers, i, j)
    xs = np.arange(d, dtype=np.int64)
    for i in range(d):
        for j in range(i + 1, d):
            dx, dy = j - i, int(y[j]) - int(y[i])
            resid = np.abs(dy * (xs - i) - (y - int(y[i])) * dx)
            inl = int((resid <= tol * dx).sum())
            cand = (-inl, i, j)
            if best is None or cand < best:
                best = cand
    inl, i, j = -best[0], best[1], best[2]
    out = pd.DataFrame([{
        "i": i, "j": j, "y_i": int(y[i]), "y_j": int(y[j]),
        "n_days": d, "tol": tol, "n_inliers": inl,
    }])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out[["i", "j", "y_i", "y_j", "n_days",
                                     "tol", "n_inliers"]],
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_RANSAC_TREND = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), idx AS (
  SELECT cnt, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS nd
  FROM daily
), tol AS (
  SELECT greatest(1, (max(cnt) - min(cnt)) // 20) AS t FROM idx
), cand AS (
  SELECT a.i AS ci, b.i AS cj, a.cnt AS yi, b.cnt AS yj,
         sum(CASE WHEN abs((b.cnt - a.cnt) * (p.i - a.i)
                           - (p.cnt - a.cnt) * (b.i - a.i))
                       <= (SELECT t FROM tol) * (b.i - a.i)
                  THEN 1 ELSE 0 END) AS inl
  FROM idx a JOIN idx b ON b.i > a.i CROSS JOIN idx p
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(ci AS BIGINT) AS i, CAST(cj AS BIGINT) AS j,
       CAST(yi AS BIGINT) AS y_i, CAST(yj AS BIGINT) AS y_j,
       CAST((SELECT max(nd) FROM idx) AS BIGINT) AS n_days,
       CAST((SELECT t FROM tol) AS BIGINT) AS tol,
       CAST(inl AS BIGINT) AS n_inliers
FROM cand
ORDER BY inl DESC, ci, cj
LIMIT 1
"""


LINKAGE_REGISTRY = {
    "path_edit_distance_pairs": (path_edit_distance_pairs,
                                 SQL_PATH_EDIT_PAIRS),
    "kanon_generalization_plan": (kanon_generalization_plan, SQL_KANON_PLAN),
    "ransac_daily_trend": (ransac_daily_trend, SQL_RANSAC_TREND),
}
