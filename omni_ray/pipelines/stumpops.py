"""Operator batch 47 — exact decision stumps, median polish and
randomness testing.

Reference anchors: none in the reference; these add:

- decision_stump_audit: the best single threshold on n_chars for
  predicting "term-rich" (≥ 200 distinct terms) by MISCLASSIFICATION
  error — the integer-exact split criterion (Gini needs rational
  comparisons; error counts don't); threshold ties go to the smaller
  value. The one-feature baseline every model must beat.
- median_polish_dowweek: one sweep of Tukey's median polish over the
  day-of-week × week event-count matrix (row medians out, then column
  medians, type-1 lower medians) — the EDA decomposition into dow
  effects, week effects and residuals; reports effects and the largest
  absolute residual.
- runs_test_audit: the Wald–Wolfowitz runs test on the daily count
  series vs its median — observed runs R against the expected
  1 + 2·n₁·n₂/(n₁+n₂) in milli; too few runs = trending, too many =
  oscillating.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .engineops import _DAY_US
from .queries import _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")

_STUMP_RICH = 200


# ---------------------------------------------------------------------------
# decision_stump_audit
# ---------------------------------------------------------------------------


def decision_stump_audit(sf_dir: str):
    """Best decision stump "n_chars ≤ t ⇒ not-rich / > t ⇒ rich": the
    threshold t (a distinct observed length; ties to the smaller t)
    minimizing total misclassification with each side predicting its
    majority class; reports the threshold, errors, accuracy ppm and the
    majority-class baseline it must beat.

    Scale shape: lengths are a bounded value domain — one bounded
    (n_chars, rich) groupby; the threshold scan is a vectorized cumsum
    over the bounded value histogram."""
    ds = _read(sf_dir, "documents", columns=["text", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        rich = np.array([len(set(_WORD_RE.findall((x or "").lower())))
                         >= _STUMP_RICH for x in t["text"].to_pylist()],
                        np.int64)
        return pa.table({
            "len_v": pa.array(np.asarray(t["n_chars"].to_numpy(),
                                         np.int64)),
            "rich": pa.array(rich, pa.int64()),
        })

    hist = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["len_v", "rich"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    piv = hist.pivot_table(index="len_v", columns="rich", values="c",
                           fill_value=0, aggfunc="sum").sort_index()
    pos = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    neg = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    vals = piv.index.to_numpy(np.int64)
    p_tot, n_tot = int(pos.sum()), int(neg.sum())
    n = p_tot + n_tot
    cpos, cneg = np.cumsum(pos), np.cumsum(neg)
    # left = values <= t: errors = min(cpos, cneg) + min(rpos, rneg)
    err = (np.minimum(cpos, cneg)
           + np.minimum(p_tot - cpos, n_tot - cneg))
    best = int(np.argmin(err))  # first minimum = smallest threshold
    t_best, e_best = int(vals[best]), int(err[best])
    base_err = min(p_tot, n_tot)
    out = pd.DataFrame({
        "threshold": [np.int64(t_best)],
        "errors": np.int64(e_best),
        "acc_ppm": np.int64((n - e_best) * 1_000_000 // n if n else 0),
        "baseline_acc_ppm": np.int64((n - base_err) * 1_000_000 // n
                                     if n else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DECISION_STUMP_AUDIT = f"""
WITH v AS (
  SELECT n_chars AS len_v,
         CASE WHEN len(list_distinct(regexp_extract_all(
                lower(coalesce(text, '')), '[a-z]+'))) >= {_STUMP_RICH}
              THEN 1 ELSE 0 END AS rich
  FROM documents
), hist AS (
  SELECT len_v, sum(rich) AS p, sum(1 - rich) AS q
  FROM v GROUP BY 1
), tot AS (SELECT sum(p) AS pt, sum(q) AS qt, count(*) AS k FROM hist),
scan AS (
  SELECT len_v,
         sum(p) OVER (ORDER BY len_v) AS cp,
         sum(q) OVER (ORDER BY len_v) AS cq
  FROM hist
), err AS (
  SELECT len_v,
         least(cp, cq) + least((SELECT pt FROM tot) - cp,
                               (SELECT qt FROM tot) - cq) AS e,
         row_number() OVER (
           ORDER BY least(cp, cq) + least((SELECT pt FROM tot) - cp,
                                          (SELECT qt FROM tot) - cq),
                    len_v) AS rn
  FROM scan
), n AS (SELECT pt + qt AS nn FROM tot)
SELECT CAST(len_v AS BIGINT) AS threshold, CAST(e AS BIGINT) AS errors,
       CAST(((SELECT nn FROM n) - e) * 1000000 // (SELECT nn FROM n)
            AS BIGINT) AS acc_ppm,
       CAST(((SELECT nn FROM n)
             - least((SELECT pt FROM tot), (SELECT qt FROM tot)))
            * 1000000 // (SELECT nn FROM n) AS BIGINT)
         AS baseline_acc_ppm
FROM err WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# median_polish_dowweek
# ---------------------------------------------------------------------------


def median_polish_dowweek(sf_dir: str):
    """One sweep of Tukey's median polish on the dow × week event-count
    matrix (dow = epoch-day % 7, week = (day − lo) // 7, zero-filled):
    row (dow) medians removed first, then column (week) medians, type-1
    lower medians throughout. Output: one row per dow effect (kind 0),
    per week effect (kind 1), and a summary row (kind 2, idx −1) with
    the largest absolute residual.

    Scale shape: the matrix is bounded (7 × weeks) — one bounded
    groupby, then the polish runs on the bounded matrix."""
    ev = _read(sf_dir, "events", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        return pa.table({"day": pa.array(d, pa.int64())})

    daily = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="c"))
        .to_pandas().sort_values("day")
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    weeks = (hi - lo) // 7 + 1
    m = np.zeros((7, weeks), np.int64)
    for _, r in daily.iterrows():
        d = int(r["day"])
        m[d % 7, (d - lo) // 7] = int(r["c"])

    def lmed(a):
        s = np.sort(a)
        return int(s[(len(s) - 1) // 2])

    row_eff = np.array([lmed(m[i]) for i in range(7)], np.int64)
    m2 = m - row_eff[:, None]
    col_eff = np.array([lmed(m2[:, j]) for j in range(weeks)], np.int64)
    resid = m2 - col_eff[None, :]
    rows = [(0, i, int(row_eff[i])) for i in range(7)]
    rows += [(1, j, int(col_eff[j])) for j in range(weeks)]
    rows.append((2, -1, int(np.abs(resid).max())))
    out = pd.DataFrame(rows, columns=["kind", "idx", "value"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MEDIAN_POLISH_DOWWEEK = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1
), lims AS (
  SELECT min(day) AS lo,
         (max(day) - min(day)) // 7 + 1 AS weeks FROM daily
), spine AS (
  SELECT d % 7 AS dow, (d - (SELECT lo FROM lims)) // 7 AS week, d
  FROM (SELECT unnest(generate_series((SELECT lo FROM lims),
          (SELECT lo + weeks * 7 - 1 FROM lims))) AS d)
  WHERE (d - (SELECT lo FROM lims)) // 7 < (SELECT weeks FROM lims)
), mat AS (
  SELECT s.dow, s.week, coalesce(daily.c, 0) AS x
  FROM spine s LEFT JOIN daily ON daily.day = s.d
), roweff AS (
  SELECT dow, quantile_disc(x, 0.5) AS re FROM mat GROUP BY 1
), m2 AS (
  SELECT mat.dow, mat.week, mat.x - roweff.re AS x2, roweff.re
  FROM mat JOIN roweff USING (dow)
), coleff AS (
  SELECT week, quantile_disc(x2, 0.5) AS ce FROM m2 GROUP BY 1
), resid AS (
  SELECT max(abs(m2.x2 - coleff.ce)) AS mr
  FROM m2 JOIN coleff USING (week)
)
SELECT CAST(kind AS BIGINT) AS kind, CAST(idx AS BIGINT) AS idx,
       CAST(value AS BIGINT) AS value
FROM (
  SELECT 0 AS kind, dow AS idx, re AS value FROM roweff
  UNION ALL
  SELECT 1, week, ce FROM coleff
  UNION ALL
  SELECT 2, -1, (SELECT mr FROM resid)
) ORDER BY kind, idx
"""


# ---------------------------------------------------------------------------
# runs_test_audit
# ---------------------------------------------------------------------------


def runs_test_audit(sf_dir: str):
    """Wald–Wolfowitz runs test on the dense daily count series vs its
    type-1 median: days at or below the median are 0, above are 1;
    observed runs R vs the expected 1 + 2·n₀·n₁/(n₀+n₁) in milli. Too
    few runs flags trending, too many flags oscillation.

    Scale shape: bounded day groupby → vectorized scan over the day
    vector."""
    ev = _read(sf_dir, "events", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.divide(pc.cast(t["ts"], pa.int64()),
                                          _DAY_US)})

    daily = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="c"))
        .to_pandas().sort_values("day")
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    x = np.zeros(hi - lo + 1, np.int64)
    x[daily["day"].to_numpy(np.int64) - lo] = daily["c"].to_numpy(np.int64)
    med = int(np.sort(x)[(len(x) - 1) // 2])
    b = (x > med).astype(np.int64)
    n1 = int(b.sum())
    n0 = len(b) - n1
    runs = 1 + int((b[1:] != b[:-1]).sum()) if len(b) else 0
    expected_milli = 1000 + 2000 * n0 * n1 // (n0 + n1) \
        if (n0 + n1) else 0
    out = pd.DataFrame({
        "n_below": [np.int64(n0)], "n_above": np.int64(n1),
        "runs": np.int64(runs),
        "expected_milli": np.int64(expected_milli),
        "gap_milli": np.int64(runs * 1000 - expected_milli),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_RUNS_TEST_AUDIT = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1
), spine AS (
  SELECT unnest(generate_series((SELECT min(day) FROM daily),
                                (SELECT max(day) FROM daily))) AS day
), dense AS (
  SELECT s.day, coalesce(d.c, 0) AS x FROM spine s
  LEFT JOIN daily d USING (day)
), med AS (SELECT quantile_disc(x, 0.5) AS m FROM dense),
b AS (
  SELECT day, CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE 0 END AS v,
         lag(CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE 0 END)
           OVER (ORDER BY day) AS pv
  FROM dense
), s AS (
  SELECT sum(v) AS n1, count(*) - sum(v) AS n0,
         1 + sum(CASE WHEN pv IS NOT NULL AND v != pv
                      THEN 1 ELSE 0 END) AS runs
  FROM b
)
SELECT CAST(n0 AS BIGINT) AS n_below, CAST(n1 AS BIGINT) AS n_above,
       CAST(runs AS BIGINT) AS runs,
       CAST(1000 + 2000 * n0 * n1 // (n0 + n1) AS BIGINT)
         AS expected_milli,
       CAST(runs * 1000 - (1000 + 2000 * n0 * n1 // (n0 + n1))
            AS BIGINT) AS gap_milli
FROM s
"""


STUMPOPS_REGISTRY = {
    "decision_stump_audit": (decision_stump_audit, SQL_DECISION_STUMP_AUDIT),
    "median_polish_dowweek": (median_polish_dowweek,
                              SQL_MEDIAN_POLISH_DOWWEEK),
    "runs_test_audit": (runs_test_audit, SQL_RUNS_TEST_AUDIT),
}
