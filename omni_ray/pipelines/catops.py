"""Operator batch 58 — categorical association over the source × lang
contingency table: three complementary strengths-of-relationship, all
from ONE bounded contingency fold.

Reference anchors: none in the reference; these complete the
association family (kappa = agreement, eta² = numeric-by-group):

- cramers_v_source_lang: the symmetric chi-square-based association —
  chi2_scaled = Σ (N·o − r·c)² // (r·c·N) (floor-per-cell convention),
  V_ppm = isqrt(chi2·10¹² // (N·min(R−1, C−1))) with the exact
  one-step-corrected isqrt.
- theil_u_lang_given_source: the ASYMMETRIC uncertainty coefficient
  U(lang|source) = (H(lang) − H(lang|source)) / H(lang) in ppm under
  the webqa quantized-ln rule — how much knowing the source tells you
  about the language (direction matters; V can't say which way).
- lang_simpson_by_source: per source, Simpson diversity 10⁶ − Σ
  share_ppm-squared-scaled of its language mix (diversity_ppm =
  10⁶ − Σ n_l²·10⁶ // n² per source) — the one-number mix flatness.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count

from .queries import _read


def _contingency(sf_dir: str) -> pd.DataFrame:
    return (
        _read(sf_dir, "documents", columns=["source", "lang"])
        .groupby(["source", "lang"]).aggregate(Count(alias_name="o"))
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# cramers_v_source_lang
# ---------------------------------------------------------------------------


def cramers_v_source_lang(sf_dir: str):
    """Cramér's V of the source × lang table: per-cell chi2 contribution
    (N·o − r·c)² // (r·c·N) floored (cells with o = 0 included via the
    dense spine), summed; V_ppm = isqrt(chi2·10¹² // (N·min(R−1,C−1))).

    Scale shape: one bounded contingency groupby; the dense-spine scan
    runs over R×C cells."""
    ct = _contingency(sf_dir)
    rows_m = ct.groupby("source")["o"].sum()
    cols_m = ct.groupby("lang")["o"].sum()
    n = int(ct["o"].sum())
    obs = ct.set_index(["source", "lang"])["o"]
    chi2 = 0
    for s in rows_m.index:
        for l_ in cols_m.index:
            o = int(obs.get((s, l_), 0))
            r, c = int(rows_m[s]), int(cols_m[l_])
            d = n * o - r * c
            chi2 += d * d // (r * c * n)
    rr, cc = len(rows_m), len(cols_m)
    den = n * min(rr - 1, cc - 1)
    v = math.isqrt(chi2 * 10 ** 12 // den) if den else 0
    out = pd.DataFrame({
        "n_docs": [np.int64(n)],
        "n_rows": np.int64(rr), "n_cols": np.int64(cc),
        "chi2_scaled": np.int64(chi2),
        "v_ppm": np.int64(v),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CRAMERS_V_SOURCE_LANG = """
WITH ct AS (
  SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2
), rm AS (SELECT source, sum(o) AS r FROM ct GROUP BY 1),
cm AS (SELECT lang, sum(o) AS c FROM ct GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
spine AS (
  SELECT rm.source, cm.lang, rm.r, cm.c, coalesce(ct.o, 0) AS o
  FROM rm CROSS JOIN cm
  LEFT JOIN ct ON ct.source = rm.source AND ct.lang = cm.lang
), chi AS (
  SELECT sum(((SELECT n FROM n) * CAST(o AS HUGEINT) - CAST(r AS HUGEINT) * c)
             * ((SELECT n FROM n) * CAST(o AS HUGEINT)
                - CAST(r AS HUGEINT) * c)
             // (CAST(r AS HUGEINT) * c * (SELECT n FROM n))) AS chi2
  FROM spine
), dims AS (
  SELECT (SELECT count(*) FROM rm) AS rr, (SELECT count(*) FROM cm) AS cc
), fs AS (
  SELECT chi2,
         CAST(chi2 AS HUGEINT) * 1000000000000
           // ((SELECT n FROM n)
               * least((SELECT rr FROM dims) - 1,
                       (SELECT cc FROM dims) - 1)) AS q
  FROM chi
), isq AS (
  SELECT chi2, q,
         CAST(floor(sqrt(CAST(q AS DOUBLE))) AS HUGEINT) AS f
  FROM fs
)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_docs,
       CAST((SELECT rr FROM dims) AS BIGINT) AS n_rows,
       CAST((SELECT cc FROM dims) AS BIGINT) AS n_cols,
       CAST(chi2 AS BIGINT) AS chi2_scaled,
       CAST(f - (CASE WHEN f * f > q THEN 1 ELSE 0 END)
              + (CASE WHEN (f + 1) * (f + 1) <= q THEN 1 ELSE 0 END)
            AS BIGINT) AS v_ppm
FROM isq
"""


# ---------------------------------------------------------------------------
# theil_u_lang_given_source
# ---------------------------------------------------------------------------


def theil_u_lang_given_source(sf_dir: str):
    """Theil's uncertainty coefficient U(lang | source): with the
    quantized-cell entropies H(lang) = Σ_l floor(10⁶·n_l·ln(N/n_l) +
    0.5) and H(lang|source) = Σ_cells floor(10⁶·o·ln(r/o) + 0.5)
    (the webqa ln rule), u_ppm = (H_lang − H_cond)·10⁶ // H_lang.
    Asymmetric: how much the source PREDICTS the language.

    Scale shape: one bounded contingency groupby; entropy folds on the
    bounded table."""
    ct = _contingency(sf_dir)
    n = int(ct["o"].sum())
    cols_m = ct.groupby("lang")["o"].sum()
    h_lang = sum(int(math.floor(1_000_000 * int(c) * math.log(n / int(c))
                                + 0.5))
                 for c in cols_m if int(c) > 0)
    rows_m = ct.groupby("source")["o"].sum()
    h_cond = 0
    for _, r in ct.iterrows():
        o, rt = int(r["o"]), int(rows_m[r["source"]])
        if o > 0:
            h_cond += int(math.floor(1_000_000 * o * math.log(rt / o)
                                     + 0.5))
    u = (h_lang - h_cond) * 1_000_000 // h_lang if h_lang else 0
    out = pd.DataFrame({
        "n_docs": [np.int64(n)],
        "h_lang_scaled": np.int64(h_lang),
        "h_cond_scaled": np.int64(h_cond),
        "u_ppm": np.int64(u),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_THEIL_U_LANG_GIVEN_SOURCE = """
WITH ct AS (
  SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2
), n AS (SELECT count(*) AS n FROM documents),
cm AS (SELECT lang, sum(o) AS c FROM ct GROUP BY 1),
rm AS (SELECT source, sum(o) AS r FROM ct GROUP BY 1),
hl AS (
  SELECT sum(CAST(floor(1000000 * c
                        * ln(CAST((SELECT n FROM n) AS DOUBLE) / c) + 0.5)
                  AS BIGINT)) AS h
  FROM cm
), hc AS (
  SELECT sum(CAST(floor(1000000 * ct.o
                        * ln(CAST(rm.r AS DOUBLE) / ct.o) + 0.5)
                  AS BIGINT)) AS h
  FROM ct JOIN rm USING (source)
)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_docs,
       CAST((SELECT h FROM hl) AS BIGINT) AS h_lang_scaled,
       CAST((SELECT h FROM hc) AS BIGINT) AS h_cond_scaled,
       CAST(CASE WHEN (SELECT h FROM hl) = 0 THEN 0
                 ELSE ((SELECT h FROM hl) - (SELECT h FROM hc)) * 1000000
                      // (SELECT h FROM hl) END AS BIGINT) AS u_ppm
"""


# ---------------------------------------------------------------------------
# lang_simpson_by_source
# ---------------------------------------------------------------------------


def lang_simpson_by_source(sf_dir: str):
    """Simpson diversity of each source's language mix: diversity_ppm =
    10⁶ − Σ_l n_l²·10⁶ // n² (floor on the repeat-probability term) —
    0 for a monolingual source, → 1 − 1/k for a flat k-language mix.

    Scale shape: one bounded contingency groupby; per-source fold on the
    bounded rows."""
    ct = _contingency(sf_dir)
    rows = []
    for src, g in ct.groupby("source"):
        n = int(g["o"].sum())
        rep = int((g["o"].astype(object) ** 2).sum()) * 1_000_000 \
            // (n * n) if n else 0
        rows.append((src, n, 1_000_000 - rep))
    out = pd.DataFrame(rows, columns=["source", "n_docs",
                                      "diversity_ppm"]) \
        .sort_values("source").reset_index(drop=True)
    for c in ("n_docs", "diversity_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LANG_SIMPSON_BY_SOURCE = """
WITH ct AS (
  SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2
), agg AS (
  SELECT source, sum(o) AS n,
         sum(CAST(o AS HUGEINT) * o) AS ssq
  FROM ct GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(1000000 - ssq * 1000000 // (CAST(n AS HUGEINT) * n)
            AS BIGINT) AS diversity_ppm
FROM agg ORDER BY source
"""


CATOPS_REGISTRY = {
    "cramers_v_source_lang": (cramers_v_source_lang,
                              SQL_CRAMERS_V_SOURCE_LANG),
    "theil_u_lang_given_source": (theil_u_lang_given_source,
                                  SQL_THEIL_U_LANG_GIVEN_SOURCE),
    "lang_simpson_by_source": (lang_simpson_by_source,
                               SQL_LANG_SIMPSON_BY_SOURCE),
}
