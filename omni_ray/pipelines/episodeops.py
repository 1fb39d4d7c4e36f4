"""Episode-mining / data-valuation / sequential-testing operators (round 4,
batch 72):

- episode_pairs_window: frequent-episode counting — ordered event-type
  pairs (a → b) where b follows a WITHIN 1 hour for the same user, counted
  as pair instances and as distinct users. Strict follow order is the
  lexicographic (ts, event_id) rule so simultaneous-timestamp events can't
  double-count either direction. The windowed generalization of the
  adjacent-only transition_counts: a→…→b chains count here, so it reads
  true temporal association, not just adjacency.
- loso_stump_delta: leave-one-source-out data valuation — the
  decision-stump probe (stumpops' fixed-side rule: n_chars ≤ t ⇒ not-rich,
  > t ⇒ rich) refit WITHOUT each source, reporting the held-out-corpus
  accuracy delta versus the all-data stump. A positive delta means the
  source HURTS the probe's separability — the cheapest useful
  source-influence measurement a curation pipeline can run. Per-source
  cumulative error curves derive from ONE (source, len, label) histogram
  by subtraction — the fact table is read once, the 20 refits are
  vectorized scans over the bounded value grid.
- sequential_ab_chi2: a sequential A/B monitor — arms by user parity,
  per-day CUMULATIVE 2×2 chi-square χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d))
  in exact big-integer arithmetic (HUGEINT in the oracle), flagged at the
  3.841 (α=0.05, df=1) line. The peeking-problem instrument: the daily
  flag column IS the naive-peeking trajectory a correction (Pocock/OBF)
  would be judged against.

Scale shape: episodes fold per-user inside hash-bucketed map_groups
(pairs bounded by per-user event counts); the stump valuation and the A/B
monitor both reduce to bounded histograms before any scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_WINDOW_US = 3_600_000_000
_CHI2_05_MILLI = 3841  # chi-square df=1 at alpha=0.05, in milli


def episode_pairs_window(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_id", "user_id",
                                          "event_type"])

    def kb(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_kb", pc.cast(pc.bit_wise_and(t["user_id"], 255), pa.int64()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out: dict[tuple, set] = {}
        cnt: dict[tuple, int] = {}
        for uid, u in g.groupby("user_id"):
            us = u["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            eid = u["event_id"].to_numpy(np.int64)
            order = np.lexsort((eid, us))
            us, types = us[order], u["event_type"].to_numpy()[order]
            n = len(us)
            hi = np.searchsorted(us, us + _WINDOW_US, side="right")
            for i in range(n):
                for j in range(i + 1, hi[i]):
                    k = (types[i], types[j])
                    cnt[k] = cnt.get(k, 0) + 1
                    out.setdefault(k, set()).add(uid)
        rows = [(a, b, c, len(out[(a, b)])) for (a, b), c in cnt.items()]
        return pd.DataFrame(rows, columns=["a", "b", "n_pairs", "n_users"]) \
            if rows else pd.DataFrame({
                "a": pd.Series([], dtype="object"),
                "b": pd.Series([], dtype="object"),
                "n_pairs": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")})

    out = (
        ev.map_batches(kb, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(pairs), batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                   Sum("n_users", alias_name="n_users"))
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    for c in ("n_pairs", "n_users"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_EPISODE_PAIRS = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
), p AS (
  SELECT a.event_type AS a, b.event_type AS b, a.user_id
  FROM e a JOIN e b
    ON a.user_id = b.user_id
   AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
   AND b.us - a.us <= {_WINDOW_US}
)
SELECT a, b, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM p GROUP BY 1, 2
"""


_STUMP_RICH = None  # resolved lazily from stumpops to share the label rule


def loso_stump_delta(sf_dir: str):
    from .stumpops import _STUMP_RICH as RICH, _WORD_RE

    ds = _read(sf_dir, "documents", columns=["source", "text", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        rich = np.array(
            [len(set(_WORD_RE.findall((x or "").lower()))) >= RICH
             for x in t["text"].to_pylist()], np.int64)
        return pa.table({
            "source": t["source"],
            "len_v": pa.array(np.asarray(t["n_chars"].to_numpy(), np.int64)),
            "rich": pa.array(rich, pa.int64()),
        })

    hist = _bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["source", "len_v", "rich"], {"c": ("rich", "count")}).to_pandas()

    vals = np.sort(hist["len_v"].unique())
    piv = hist.pivot_table(index="len_v", columns=["source", "rich"],
                           values="c", fill_value=0, aggfunc="sum") \
        .reindex(vals, fill_value=0)
    sources = sorted(hist["source"].unique())
    pos = {s: piv.get((s, 1), pd.Series(0, index=vals)).to_numpy(np.int64)
           for s in sources}
    neg = {s: piv.get((s, 0), pd.Series(0, index=vals)).to_numpy(np.int64)
           for s in sources}
    gpos = sum(pos.values())
    gneg = sum(neg.values())

    def best_acc_ppm(p, n):
        tot = int(p.sum() + n.sum())
        if tot == 0:
            return 0, 0
        # err(t) = rich ≤ t  +  not-rich > t, t over observed values;
        # plus the all-right stump (t below every value)
        cp, cn = np.cumsum(p), np.cumsum(n)
        errs = cp + (int(n.sum()) - cn)
        best = min(int(errs.min()), int(p.sum()))
        return tot, (tot - best) * 1_000_000 // tot

    _, acc_all = best_acc_ppm(gpos, gneg)
    rows = []
    for s in sources:
        m, acc = best_acc_ppm(gpos - pos[s], gneg - neg[s])
        rows.append((s, m, acc, acc - acc_all))
    out = pd.DataFrame(rows, columns=["source", "n_excluded_rows",
                                      "acc_loso_ppm", "delta_ppm"])
    for c in ("n_excluded_rows", "acc_loso_ppm", "delta_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _sql_loso(rich: int) -> str:
    return f"""
WITH lab AS (
  SELECT source, n_chars AS v,
         CASE WHEN length(list_distinct(regexp_extract_all(
                lower(coalesce(text, '')), '[a-z]+'))) >= {rich}
              THEN 1 ELSE 0 END AS rich
  FROM documents
), hist AS (
  SELECT source, v, rich, count(*) AS c FROM lab GROUP BY 1, 2, 3
), vals AS (SELECT DISTINCT v FROM hist),
srcs AS (SELECT DISTINCT source FROM hist),
grid AS (
  SELECT s.source, va.v,
         coalesce(sum(CASE WHEN h.rich = 1 THEN h.c END), 0) AS p,
         coalesce(sum(CASE WHEN h.rich = 0 THEN h.c END), 0) AS n
  FROM srcs s CROSS JOIN vals va
  LEFT JOIN hist h ON h.source = s.source AND h.v = va.v
  GROUP BY 1, 2
), gtot AS (
  SELECT v, sum(p) AS p, sum(n) AS n FROM grid GROUP BY 1
), stot AS (
  SELECT source, sum(p) AS ptot, sum(n) AS ntot FROM grid GROUP BY 1
), gall AS (SELECT sum(p) AS gp, sum(n) AS gn FROM gtot),
-- leave-one-out cumulative error curve per source (NULL source = all data)
curves AS (
  SELECT s.source, g.v,
         sum(g.p - coalesce(x.p, 0)) OVER (PARTITION BY s.source ORDER BY g.v)
           AS cp,
         sum(g.n - coalesce(x.n, 0)) OVER (PARTITION BY s.source ORDER BY g.v)
           AS cn
  FROM srcs s
  CROSS JOIN gtot g
  LEFT JOIN grid x ON x.source = s.source AND x.v = g.v
), best AS (
  SELECT c.source,
         (SELECT gp - st.ptot FROM gall, stot st WHERE st.source = c.source)
           AS ptot,
         (SELECT gn - st.ntot FROM gall, stot st WHERE st.source = c.source)
           AS ntot,
         min(c.cp + ((SELECT gn - st.ntot FROM gall, stot st
                      WHERE st.source = c.source) - c.cn)) AS scan_err
  FROM curves c GROUP BY 1
), loso AS (
  SELECT source, ptot + ntot AS m,
         (ptot + ntot - least(scan_err, ptot)) * 1000000 // (ptot + ntot)
           AS acc
  FROM best
), allcurve AS (
  SELECT v, sum(p) OVER (ORDER BY v) AS cp, sum(n) OVER (ORDER BY v) AS cn
  FROM gtot
), allbest AS (
  SELECT (SELECT gp + gn FROM gall) AS m,
         min(cp + ((SELECT gn FROM gall) - cn)) AS scan_err
  FROM allcurve
), allacc AS (
  SELECT (m - least(scan_err, (SELECT gp FROM gall))) * 1000000 // m AS acc
  FROM allbest
)
SELECT source, CAST(m AS BIGINT) AS n_excluded_rows,
       CAST(acc AS BIGINT) AS acc_loso_ppm,
       CAST(acc - (SELECT acc FROM allacc) AS BIGINT) AS delta_ppm
FROM loso
"""


def sequential_ab_chi2(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        arm = pc.cast(pc.bit_wise_and(t["user_id"], 1), pa.int64())
        conv = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        return pa.table({"day": day, "arm": arm, "conv": conv})

    daily = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["day", "arm"])
        .aggregate(Count(alias_name="n"), Sum("conv", alias_name="conv"))
        .to_pandas().sort_values(["day", "arm"]).reset_index(drop=True)
    )
    piv = daily.pivot_table(index="day", columns="arm",
                            values=["n", "conv"], fill_value=0,
                            aggfunc="sum").sort_index()
    na = np.cumsum(piv.get(("n", 0), 0)).astype(object)
    nb = np.cumsum(piv.get(("n", 1), 0)).astype(object)
    ca = np.cumsum(piv.get(("conv", 0), 0)).astype(object)
    cb = np.cumsum(piv.get(("conv", 1), 0)).astype(object)
    rows = []
    for day, nA, nB, cA, cB in zip(piv.index, na, nb, ca, cb):
        a, b = int(cA), int(nA) - int(cA)       # arm A: conv / non-conv
        c, d = int(cB), int(nB) - int(cB)
        ntot = a + b + c + d
        den = (a + b) * (c + d) * (a + c) * (b + d)
        chi2 = 1000 * ntot * (a * d - b * c) ** 2 // den if den else 0
        rows.append((int(day), int(nA), int(nB), int(cA), int(cB),
                     chi2, 1 if chi2 >= _CHI2_05_MILLI else 0))
    out = pd.DataFrame(rows, columns=["day", "n_a", "n_b", "conv_a",
                                      "conv_b", "chi2_milli", "flag"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SEQUENTIAL_AB = f"""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, user_id % 2 AS arm,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT day,
         sum(CASE WHEN arm = 0 THEN n ELSE 0 END)
           OVER (ORDER BY day) AS n_a,
         sum(CASE WHEN arm = 1 THEN n ELSE 0 END)
           OVER (ORDER BY day) AS n_b,
         sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
           OVER (ORDER BY day) AS conv_a,
         sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
           OVER (ORDER BY day) AS conv_b
  FROM (SELECT DISTINCT day FROM daily) d
  JOIN daily USING (day)
), one AS (
  SELECT day, max(n_a) AS n_a, max(n_b) AS n_b,
         max(conv_a) AS conv_a, max(conv_b) AS conv_b
  FROM cum GROUP BY 1
), x AS (
  SELECT day, n_a, n_b, conv_a, conv_b,
         CAST(conv_a AS HUGEINT) AS a, CAST(n_a - conv_a AS HUGEINT) AS b,
         CAST(conv_b AS HUGEINT) AS c, CAST(n_b - conv_b AS HUGEINT) AS d
  FROM one
)
SELECT CAST(day AS BIGINT) AS day, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(conv_a AS BIGINT) AS conv_a,
       CAST(conv_b AS BIGINT) AS conv_b,
       CAST(CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) = 0 THEN 0
                 ELSE 1000 * (a+b+c+d) * (a*d - b*c) * (a*d - b*c)
                      // ((a+b)*(c+d)*(a+c)*(b+d)) END AS BIGINT)
         AS chi2_milli,
       CAST(CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) > 0
                  AND 1000 * (a+b+c+d) * (a*d - b*c) * (a*d - b*c)
                      // ((a+b)*(c+d)*(a+c)*(b+d)) >= {_CHI2_05_MILLI}
                 THEN 1 ELSE 0 END AS BIGINT) AS flag
FROM x
"""


def _registry():
    from .stumpops import _STUMP_RICH as RICH

    return {
        "episode_pairs_window": (episode_pairs_window, SQL_EPISODE_PAIRS),
        "loso_stump_delta": (loso_stump_delta, _sql_loso(RICH)),
        "sequential_ab_chi2": (sequential_ab_chi2, SQL_SEQUENTIAL_AB),
    }


EPISODEOPS_REGISTRY = _registry()
