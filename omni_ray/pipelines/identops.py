"""Operator batch 61 — time-series identification, intra-document
redundancy and IDF landscape.

Reference anchors: none in the reference; these add:

- pacf2_daily: the lag-2 PARTIAL autocorrelation of the dense daily
  count series per type, exactly — Durbin–Levinson gives φ₂₂ =
  (c₂c₀ − c₁²)/(c₀² − c₁²) over the raw autocovariance numerators, so
  the ratio is a pure integer expression of the ACF machinery's exact
  sums; the AR-order identification read ACF alone can't give.
- intra_doc_similarity_census: per document, the Jaccard between the
  5-gram shingle sets of its first and second halves (docs ≥ 10 words),
  censused in tenth-bands — internal redundancy (template stuffing,
  copy-paste padding) that cross-doc dedup never sees.
- bm25_idf_profile: the IDF landscape — per IDF band (quantized
  ln((N − df + 0.5)/(df + 0.5)), Robertson–Sparck Jones), how many
  terms and how much occurrence mass sit there; the profile that
  predicts whether BM25 scores are driven by rare or common terms.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .engineops import _DAY_US
from .queries import _pd_arrow, _read
from .tsops import _trunc_div

_WORD_RE = __import__("re").compile(r"[a-z]+")
_IDF_BUCKETS = 256


# ---------------------------------------------------------------------------
# pacf2_daily
# ---------------------------------------------------------------------------


def pacf2_daily(sf_dir: str):
    """Lag-2 partial autocorrelation per event type: with the exact
    autocovariance numerators c_k = Σ_t e_t·e_{t+k} over the n-scaled
    deviations e_t = n·x_t − T, Durbin–Levinson gives φ₂₂ =
    (c₂·c₀ − c₁²) / (c₀² − c₁²); reported in ppm with truncating
    division, alongside the lag-1 ACF for orientation.

    Scale shape: bounded (type, day) groupby → driver-side exact scan."""
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
    n = hi - lo + 1
    rows = []
    for etype, g in daily.groupby("event_type"):
        x = np.zeros(n, np.int64)
        x[g["day"].to_numpy(np.int64) - lo] = g["c"].to_numpy(np.int64)
        e = (n * x - int(x.sum())).astype(object)
        c0 = int(sum(v * v for v in e))
        c1 = int(sum(e[t] * e[t + 1] for t in range(n - 1)))
        c2 = int(sum(e[t] * e[t + 2] for t in range(n - 2)))
        den1 = c0
        r1_ppm = _trunc_div(1_000_000 * c1, den1) if den1 else 0
        den2 = c0 * c0 - c1 * c1
        p2_ppm = _trunc_div(1_000_000 * (c2 * c0 - c1 * c1), den2) \
            if den2 else 0
        rows.append((etype, n, r1_ppm, p2_ppm))
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "acf1_ppm",
                                      "pacf2_ppm"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in ("n_days", "acf1_ppm", "pacf2_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_PACF2_DAILY = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (SELECT min(day) AS lo, max(day) AS hi,
                   max(day) - min(day) + 1 AS n FROM d),
spine AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM lims),
                                            (SELECT hi FROM lims)))
              AS day) s
), dense AS (
  SELECT sp.event_type, sp.day, coalesce(d.c, 0) AS x
  FROM spine sp LEFT JOIN d
    ON d.event_type = sp.event_type AND d.day = sp.day
), tt AS (SELECT event_type, sum(x) AS total FROM dense GROUP BY 1),
dev AS (
  SELECT de.event_type, de.day,
         (SELECT n FROM lims) * de.x - tt.total AS e
  FROM dense de JOIN tt USING (event_type)
), cs AS (
  SELECT a.event_type,
         sum(CAST(a.e AS HUGEINT) * a.e) AS c0,
         sum(CASE WHEN b1.e IS NOT NULL
                  THEN CAST(a.e AS HUGEINT) * b1.e ELSE 0 END) AS c1,
         sum(CASE WHEN b2.e IS NOT NULL
                  THEN CAST(a.e AS HUGEINT) * b2.e ELSE 0 END) AS c2
  FROM dev a
  LEFT JOIN dev b1 ON b1.event_type = a.event_type
                  AND b1.day = a.day + 1
  LEFT JOIN dev b2 ON b2.event_type = a.event_type
                  AND b2.day = a.day + 2
  GROUP BY 1
)
SELECT event_type,
       CAST((SELECT n FROM lims) AS BIGINT) AS n_days,
       CAST(CASE WHEN c0 = 0 THEN 0
                 ELSE 1000000 * c1 // c0 END AS BIGINT) AS acf1_ppm,
       CAST(CASE WHEN c0 * c0 - c1 * c1 = 0 THEN 0
                 ELSE 1000000 * (c2 * c0 - c1 * c1)
                      // (c0 * c0 - c1 * c1) END AS BIGINT) AS pacf2_ppm
FROM cs ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# intra_doc_similarity_census
# ---------------------------------------------------------------------------


def intra_doc_similarity_census(sf_dir: str):
    """Internal redundancy: per document with ≥ 10 words, the Jaccard
    (ppm, floored) between the 5-gram shingle sets of its first and
    second word-halves; censused in tenth-bands (band = jaccard_ppm //
    100000). Template stuffing reads high bands.

    Scale shape: fully per-document — one zero-shuffle map, one bounded
    band groupby."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for tx in df["text"]:
            ws = _WORD_RE.findall((tx or "").lower())
            if len(ws) < 10:
                continue
            mid = len(ws) // 2
            def shingles(seq):
                return {int(hashlib.md5(" ".join(seq[k:k + 5]).encode())
                            .hexdigest()[:15], 16)
                        for k in range(len(seq) - 4)}
            s1, s2 = shingles(ws[:mid]), shingles(ws[mid:])
            union = len(s1 | s2)
            if union == 0:
                continue
            j = len(s1 & s2) * 1_000_000 // union
            out.append(min(j // 100_000, 10))
        return pd.DataFrame({"band": pd.array(out, "int64")})

    got = (
        ds.map_batches(_pd_arrow(bands), batch_format="pandas")
        .groupby("band").aggregate(Count(alias_name="n_docs"))
        .to_pandas().sort_values("band").reset_index(drop=True)
    )
    for c in got.columns:
        got[c] = got[c].astype("int64")
    return pa.Table.from_pandas(got, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_INTRA_DOC_SIMILARITY_CENSUS = """
WITH w AS (
  SELECT regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), halves AS (
  SELECT ws[1:len(ws) // 2] AS h1, ws[len(ws) // 2 + 1:len(ws)] AS h2
  FROM w WHERE len(ws) >= 10
), sets AS (
  SELECT list_distinct(list_transform(
           generate_series(1, greatest(len(h1) - 4, 0)),
           k -> CAST(('0x' || substr(md5(h1[k] || ' ' || h1[k+1] || ' ' ||
                 h1[k+2] || ' ' || h1[k+3] || ' ' || h1[k+4]), 1, 15))
                 AS BIGINT))) AS s1,
         list_distinct(list_transform(
           generate_series(1, greatest(len(h2) - 4, 0)),
           k -> CAST(('0x' || substr(md5(h2[k] || ' ' || h2[k+1] || ' ' ||
                 h2[k+2] || ' ' || h2[k+3] || ' ' || h2[k+4]), 1, 15))
                 AS BIGINT))) AS s2
  FROM halves
), j AS (
  SELECT len(list_intersect(s1, s2)) AS inter,
         len(list_distinct(list_concat(s1, s2))) AS uni
  FROM sets
), banded AS (
  SELECT least(inter * 1000000 // uni // 100000, 10) AS band
  FROM j WHERE uni > 0
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs
FROM banded GROUP BY band ORDER BY band
"""


# ---------------------------------------------------------------------------
# bm25_idf_profile
# ---------------------------------------------------------------------------


def bm25_idf_profile(sf_dir: str):
    """IDF landscape: per term the Robertson–Sparck Jones IDF,
    idf_micro = floor(10⁶·ln((N − df + 0.5)/(df + 0.5)) + 0.5) (shared
    double composition), banded by idf_micro // 1_000_000 (whole nats,
    negatives clamped to -1); per band the term count and total
    occurrence mass — whether BM25 weight lives in rare or common terms.

    Scale shape: (term, df, occurrences) via ONE term-bucketed fold; the
    band census is bounded."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        term_l, doc_l, n_l = [], [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            local: dict = {}
            for w in _WORD_RE.findall((tx or "").lower()):
                local[w] = local.get(w, 0) + 1
            for w, c in local.items():
                term_l.append(w)
                doc_l.append(did)
                n_l.append(c)
        p = pd.DataFrame({"term": term_l, "doc_id": doc_l, "n": n_l})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _IDF_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["term", "doc_id"])
        stats = g.groupby("term", sort=False)["n"].sum().rename("occ")
        dfs = d.groupby("term", sort=False).size().rename("df")
        m = pd.concat([dfs, stats], axis=1).reset_index()
        bands = []
        for _, r in m.iterrows():
            idf = math.floor(1_000_000 * math.log(
                (n_docs - int(r["df"]) + 0.5) / (int(r["df"]) + 0.5))
                + 0.5)
            # truncating division (DuckDB // semantics) before the clamp
            q = abs(idf) // 1_000_000
            bands.append(max(-q if idf < 0 else q, -1))
        m["band"] = pd.array(bands, "int64")
        return m.groupby("band", sort=False).agg(
            n_terms=("term", "size"), occ_mass=("occ", "sum")).reset_index()

    out = (
        ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("band").aggregate(Sum("n_terms", alias_name="n_terms"),
                                   Sum("occ_mass", alias_name="occ_mass"))
        .to_pandas().sort_values("band").reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_BM25_IDF_PROFILE = """
WITH occ AS (
  SELECT doc_id, term, count(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
  GROUP BY 1, 2
), per_term AS (
  SELECT term, count(*) AS df, sum(c) AS occ FROM occ GROUP BY term
), n AS (SELECT count(*) AS nd FROM documents),
banded AS (
  SELECT greatest(CAST(floor(1000000 * ln(
           (CAST((SELECT nd FROM n) AS DOUBLE) - df + 0.5) / (df + 0.5))
           + 0.5) AS BIGINT) // 1000000, -1) AS band,
         occ
  FROM per_term
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(occ) AS BIGINT) AS occ_mass
FROM banded GROUP BY band ORDER BY band
"""


IDENTOPS_REGISTRY = {
    "pacf2_daily": (pacf2_daily, SQL_PACF2_DAILY),
    "intra_doc_similarity_census": (intra_doc_similarity_census,
                                    SQL_INTRA_DOC_SIMILARITY_CENSUS),
    "bm25_idf_profile": (bm25_idf_profile, SQL_BM25_IDF_PROFILE),
}
