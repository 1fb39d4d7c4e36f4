"""Operator batch 30 — robust statistics, rank stability, projection
distortion and novelty saturation.

Reference anchors: the reference trends are raw daily counts
(`src/api/dashboard.py` recent buckets); these add the robust and
representation-quality instruments:

- theil_sen_daily: the Theil–Sen robust slope of each event type's daily
  count series — the median of all pairwise slopes, picked EXACTLY as a
  rational (milli via truncating division; the median row is selected by
  (value, num, den) so equal-value fractions cannot diverge engines).
- rank_stability_tau: Kendall tau-a between the top-20 terms' document-
  frequency rankings in the first vs second half of the corpus (split at
  the exact median doc_id) — the drift number behind "did the vocabulary
  order change?".
- jl_distortion_audit: Johnson–Lindenstrauss 64→16 signed-sum projection
  with the ±1 matrix derived from md5 parity and EMBEDDED AS LITERALS in
  the SQL twin; census of the scaled distance-ratio bands over the
  deterministic (2m, 2m+1) pair set.
- gram_novelty_curve: share of never-seen-before 5-gram shingles per
  corpus-prefix decile — the saturation curve a crawl operator reads to
  decide whether more of a source is worth fetching.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min

from .engineops import _DAY_US
from .fpindex import _exact_doc_id_cuts
from .queries import _pd_arrow, _read
from .tsops import _trunc_div

_WORD_RE = re.compile(r"[a-z]+")

_JL_IN, _JL_OUT = 64, 16
# deterministic ±1 signs: parity of md5("j:i") — shared literals with SQL
_JL_SIGNS = np.array(
    [[1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest(), 16) & 1
      else -1 for i in range(_JL_IN)] for j in range(_JL_OUT)],
    dtype=np.int64)

_NOV_DECILES = 10
_TAU_TOP = 20
_TAU_BUCKETS = 256


# ---------------------------------------------------------------------------
# theil_sen_daily
# ---------------------------------------------------------------------------


def theil_sen_daily(sf_dir: str):
    """Theil–Sen robust slope per event type over the dense daily count
    series: the type-1 median of all pairwise slopes (x_j - x_i)/(j - i),
    i < j, ordered by (value, numerator, denominator); slope_milli =
    trunc(1000·num/den). Robust to the outlier days OLS bends around.

    Scale shape: (type, day) is a bounded domain — one bounded groupby;
    the O(days²) pair scan runs over the day table per type, never over
    rows."""
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
    rows = []
    for etype, g in daily.groupby("event_type"):
        x = np.zeros(hi - lo + 1, np.int64)
        x[g["day"].to_numpy(np.int64) - lo] = g["c"].to_numpy(np.int64)
        n = len(x)
        i, j = np.triu_indices(n, k=1)
        num = x[j] - x[i]
        den = (j - i).astype(np.int64)
        order = np.lexsort((den, num, num / den))
        mid = order[(len(order) - 1) // 2]  # type-1 lower median
        rows.append((etype, n, len(num), _trunc_div(
            1000 * int(num[mid]), int(den[mid]))))
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "n_pairs",
                                      "slope_milli"]).sort_values(
        "event_type").reset_index(drop=True)
    for c in ("n_days", "n_pairs", "slope_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_THEIL_SEN_DAILY = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
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
), pairs AS (
  SELECT a.event_type, b.x - a.x AS num, b.day - a.day AS den,
         row_number() OVER (
           PARTITION BY a.event_type
           ORDER BY CAST(b.x - a.x AS DOUBLE) / (b.day - a.day),
                    b.x - a.x, b.day - a.day) AS rn,
         count(*) OVER (PARTITION BY a.event_type) AS np_
  FROM dense a JOIN dense b
    ON b.event_type = a.event_type AND b.day > a.day
)
SELECT event_type,
       CAST((SELECT hi - lo + 1 FROM lims) AS BIGINT) AS n_days,
       CAST(max(np_) AS BIGINT) AS n_pairs,
       CAST(max(CASE WHEN rn = (np_ + 1) // 2
                     THEN 1000 * num // den END) AS BIGINT) AS slope_milli
FROM pairs GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# rank_stability_tau
# ---------------------------------------------------------------------------


def rank_stability_tau(sf_dir: str):
    """Kendall tau-a between the first-half and second-half document
    frequencies of the corpus's top-20 terms (halves split at the exact
    median doc_id): concordant / discordant / tied pair counts and
    tau_milli = trunc(1000·(C−D) / (n(n−1)/2)).

    Scale shape: per-term (df, df_h1, df_h2) via ONE term-bucketed
    distinct fold with per-bucket top-20 prune; the tau pair scan runs
    over 20 rows on the driver."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    agg = ds.aggregate(Min("doc_id"), Max("doc_id"), Count())
    lo, hi, n = (int(agg["min(doc_id)"]), int(agg["max(doc_id)"]),
                 int(agg["count()"]))
    cut = int(_exact_doc_id_cuts(ds, lo, hi, n)[4])  # decile 5 = median

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        term_l, doc_l = [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            for wd in set(_WORD_RE.findall((tx or "").lower())):
                term_l.append(wd)
                doc_l.append(did)
        p = pd.DataFrame({"term": term_l, "doc_id": doc_l})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _TAU_BUCKETS).astype(np.int64)
        return p

    def bucket_df(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["term", "doc_id"])
        h1 = d["doc_id"] <= cut
        cnt = d.assign(h1=h1.astype(np.int64),
                       h2=(~h1).astype(np.int64)) \
            .groupby("term", sort=False) \
            .agg(df=("doc_id", "size"), df1=("h1", "sum"),
                 df2=("h2", "sum")).reset_index()
        return cnt.sort_values(["df", "term"], ascending=[False, True]) \
            .head(_TAU_TOP)

    top = (
        ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(bucket_df),
                                   batch_format="pandas")
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])
        .head(_TAU_TOP)
    )
    a = top["df1"].to_numpy(np.int64)
    b = top["df2"].to_numpy(np.int64)
    i, j = np.triu_indices(len(top), k=1)
    s = np.sign(a[j] - a[i]) * np.sign(b[j] - b[i])
    conc, disc = int((s > 0).sum()), int((s < 0).sum())
    ties = int((s == 0).sum())
    npairs = len(s)
    out = pd.DataFrame({
        "n_terms": [np.int64(len(top))],
        "concordant": np.int64(conc),
        "discordant": np.int64(disc),
        "tied": np.int64(ties),
        "tau_milli": np.int64(_trunc_div(1000 * (conc - disc), npairs)
                              if npairs else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_RANK_STABILITY_TAU = f"""
WITH t AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
), ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM documents
), cut AS (
  SELECT doc_id AS c FROM ranked
  WHERE rn = (5 * (SELECT count(*) FROM documents) + 9) // 10
), dfs AS (
  SELECT term, count(*) AS df,
         sum(CASE WHEN doc_id <= (SELECT c FROM cut) THEN 1 ELSE 0 END)
           AS df1,
         sum(CASE WHEN doc_id > (SELECT c FROM cut) THEN 1 ELSE 0 END)
           AS df2
  FROM t GROUP BY term
), top AS (
  SELECT term, df1, df2 FROM dfs ORDER BY df DESC, term LIMIT {_TAU_TOP}
), p AS (
  SELECT sign(b.df1 - a.df1) * sign(b.df2 - a.df2) AS s
  FROM top a JOIN top b ON b.term > a.term
)
SELECT CAST((SELECT count(*) FROM top) AS BIGINT) AS n_terms,
       CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS concordant,
       CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS discordant,
       CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied,
       CAST(1000 * (sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)
                    - sum(CASE WHEN s < 0 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS tau_milli
FROM p
"""


# ---------------------------------------------------------------------------
# jl_distortion_audit
# ---------------------------------------------------------------------------


def jl_distortion_audit(sf_dir: str):
    """Johnson–Lindenstrauss distortion census: embeddings quantized to
    integer millionths, projected 64→16 by the shared ±1 md5-parity sign
    matrix; over the deterministic pair set (2m, 2m+1), the scaled ratio
    d_proj²/(16·d_orig²) in ppm (unit expectation for a ±1 matrix) is binned into tenth-of-unit bands
    (band = ratio_ppm // 100000, clamped to [0, 30]); census per band.

    Scale shape: quantize+project is a zero-shuffle vectorized matmul;
    pairing is ONE pair-bucketed shuffle; the census is a bounded
    groupby."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def proj(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_numpy(), np.int64)
        mat = np.stack([np.asarray(v, np.float64)
                        for v in t["embedding"].to_pylist()])
        q = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        y = q @ _JL_SIGNS.T
        cols = {"vec_id": ids, "_kb": (ids // 2) & 255}
        for i in range(_JL_OUT):
            cols[f"y{i}"] = y[:, i]
        for i in range(_JL_IN):
            cols[f"q{i}"] = q[:, i]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy(np.int64)
        m = ids // 2
        bands = []
        qc = g[[f"q{i}" for i in range(_JL_IN)]].to_numpy(np.int64)
        yc = g[[f"y{i}" for i in range(_JL_OUT)]].to_numpy(np.int64)
        for pm in np.unique(m):
            sel = np.where(m == pm)[0]
            if len(sel) != 2:
                continue
            a, b = sel
            dq = qc[a] - qc[b]
            dy = yc[a] - yc[b]
            d_orig = int((dq.astype(object) ** 2).sum())
            d_proj = int((dy.astype(object) ** 2).sum())
            if d_orig == 0:
                continue
            ratio_ppm = d_proj * 1_000_000 // (_JL_OUT * d_orig)
            bands.append(min(ratio_ppm // 100_000, 30))
        return pd.DataFrame({"band": pd.array(bands, "int64")})

    out = (
        emb.map_batches(proj, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(pair_fold),
                                   batch_format="pandas")
        .groupby("band").aggregate(Count(alias_name="n_pairs"))
        .to_pandas().sort_values("band").reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _jl_sql() -> str:
    sgn = ", ".join(f"({j}, {i}, {int(_JL_SIGNS[j, i])})"
                    for j in range(_JL_OUT) for i in range(_JL_IN))
    return f"""
WITH sgn(j, i, s) AS (VALUES {sgn}),
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qe
  FROM embeddings
), flat AS (
  SELECT vec_id, i - 1 AS i, qe[i] AS v
  FROM q, unnest(generate_series(1, {_JL_IN})) g(i)
), proj AS (
  SELECT f.vec_id, sgn.j, sum(sgn.s * f.v) AS y
  FROM flat f JOIN sgn ON sgn.i = f.i GROUP BY 1, 2
), pair AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb
  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0
), dorig AS (
  SELECT p.ida, list_sum(list_transform(
           generate_series(1, {_JL_IN}),
           i -> (qa.qe[i] - qb.qe[i]) * (qa.qe[i] - qb.qe[i]))) AS d2
  FROM pair p JOIN q qa ON qa.vec_id = p.ida
  JOIN q qb ON qb.vec_id = p.idb
), dproj AS (
  SELECT p.ida, sum((pa.y - pb.y) * (pa.y - pb.y)) AS d2
  FROM pair p JOIN proj pa ON pa.vec_id = p.ida
  JOIN proj pb ON pb.vec_id = p.idb AND pb.j = pa.j
  GROUP BY 1
)
SELECT CAST(least(CAST(dp.d2 AS HUGEINT) * 1000000
                    // ({_JL_OUT} * dor.d2) // 100000, 30) AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM dorig dor JOIN dproj dp USING (ida)
WHERE dor.d2 > 0 GROUP BY 1 ORDER BY 1
"""


SQL_JL_DISTORTION_AUDIT = _jl_sql()


# ---------------------------------------------------------------------------
# gram_novelty_curve
# ---------------------------------------------------------------------------


def gram_novelty_curve(sf_dir: str):
    """Novelty saturation: at each corpus-prefix decile (documents by
    doc_id, exact distributed-selection cuts), the number of distinct
    5-gram shingles whose FIRST occurrence lies in that decile slice,
    plus the cumulative distinct count — the diminishing-returns curve
    behind "is more of this crawl worth it".

    Scale shape: shingles are row-sized — block-local first-occurrence
    combiner, ONE shingle-bucketed min fold, then a 10-wide searchsorted
    census per bucket folded by a bounded groupby."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    agg = ds.aggregate(Min("doc_id"), Max("doc_id"), Count())
    lo, hi, n = (int(agg["min(doc_id)"]), int(agg["max(doc_id)"]),
                 int(agg["count()"]))
    cuts = _exact_doc_id_cuts(ds, lo, hi, n)

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        fd: dict = {}
        for did, tx in zip(df["doc_id"], df["text"]):
            ws = _WORD_RE.findall((tx or "").lower())
            for k in range(len(ws) - 4):
                h = int(hashlib.md5(
                    " ".join(ws[k:k + 5]).encode()).hexdigest()[:15], 16)
                if h not in fd or did < fd[h]:
                    fd[h] = did
        p = pd.DataFrame({"sh": np.fromiter(fd.keys(), np.int64,
                                            count=len(fd)),
                          "fd": np.fromiter(fd.values(), np.int64,
                                            count=len(fd))})
        p["_kb"] = (p["sh"].to_numpy() & 255).astype(np.int64)
        return p

    def census(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("sh", sort=False)["fd"].min().to_numpy(np.int64)
        counts = np.searchsorted(np.sort(fd), cuts, side="right")
        return pd.DataFrame({
            "decile": np.arange(1, _NOV_DECILES + 1, dtype=np.int64),
            "v": counts.astype(np.int64),
        })

    cum = (
        ds.map_batches(_pd_arrow(first_partial), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(census), batch_format="pandas")
        .groupby("decile").sum("v")
        .to_pandas().sort_values("decile").reset_index(drop=True)
    )
    cum.columns = ["decile", "cum_novel"]
    cum["new_novel"] = cum["cum_novel"].diff().fillna(
        cum["cum_novel"].iloc[0]).astype("int64")
    cum["cum_novel"] = cum["cum_novel"].astype("int64")
    cum["decile"] = cum["decile"].astype("int64")
    out = cum[["decile", "new_novel", "cum_novel"]]
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_GRAM_NOVELTY_CURVE = """
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 4, 0)),
           k -> CAST(('0x' || substr(md5(ws[k] || ' ' || ws[k+1] || ' ' ||
                 ws[k+2] || ' ' || ws[k+3] || ' ' || ws[k+4]), 1, 15))
                 AS BIGINT))) AS h
  FROM w
), firsts AS (
  SELECT h, min(doc_id) AS fd FROM sh GROUP BY h
), ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM documents
), cuts AS (
  SELECT k, (SELECT doc_id FROM ranked
             WHERE rn = (k * (SELECT count(*) FROM documents) + 9) // 10)
           AS cut
  FROM (SELECT unnest(generate_series(1, 10)) AS k)
), cum AS (
  SELECT k AS decile,
         (SELECT count(*) FROM firsts WHERE fd <= cut) AS cum_novel
  FROM cuts
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(cum_novel - coalesce(lag(cum_novel) OVER (ORDER BY decile), 0)
            AS BIGINT) AS new_novel,
       CAST(cum_novel AS BIGINT) AS cum_novel
FROM cum ORDER BY decile
"""


ROBUSTOPS_REGISTRY = {
    "theil_sen_daily": (theil_sen_daily, SQL_THEIL_SEN_DAILY),
    "rank_stability_tau": (rank_stability_tau, SQL_RANK_STABILITY_TAU),
    "jl_distortion_audit": (jl_distortion_audit, SQL_JL_DISTORTION_AUDIT),
    "gram_novelty_curve": (gram_novelty_curve, SQL_GRAM_NOVELTY_CURVE),
}
