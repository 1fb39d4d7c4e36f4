"""Operator batch 52 — top-k list similarity, pricing structure and
sparse-matrix footprint planning.

Reference anchors: none in the reference; these add:

- rbo_rankings: Rank-Biased Overlap (Webber et al.) between the
  volume-ranking and the vocabulary-ranking of sources — the
  top-weighted list-similarity measure Kendall's tau can't give; p = 0.9
  depth weights enter BOTH engines as shared integer-millionth literals
  and each depth's term is quantized before summation.
- price_ladder_audit: per part brand, the price-point structure of
  lineitem extended prices — distinct price points, the modal price
  (ties to the smaller price) and its share in ppm; scripted pricing
  shows up as few points with a dominant mode.
- csr_footprint_estimate: storage planning for the doc × term incidence
  matrix — nnz (Σ distinct terms per doc), rows, cols, CSR bytes
  (8·nnz + 8·nnz + 8·(rows+1): values+indices+indptr at int64) vs dense
  bytes (8·rows·cols), and the savings ratio in ppm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read
from .tsops import _trunc_div
from .voteops import _source_metrics

_WORD_RE = __import__("re").compile(r"[a-z]+")

# p^d for RBO at p = 0.9, depths 1..20, in millionths — shared literals
_RBO_P_PPM = [round(0.9 ** d * 1_000_000) for d in range(1, 21)]


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# rbo_rankings
# ---------------------------------------------------------------------------


def rbo_rankings(sf_dir: str):
    """Rank-Biased Overlap between two source rankings — by char volume
    and by distinct vocabulary (ties to source asc): rbo_scaled =
    (1 − p)/p · Σ_d w_d·|overlap@d|·10⁶ // d with w_d the shared p^d
    millionth literals, each depth term floored before summation (the
    documented convention). One row: n_sources, overlap@5, rbo_ppm.

    Scale shape: both rankings come from the bounded source-metric
    table; the depth scan is bounded."""
    m = _source_metrics(sf_dir)
    by_vol = m.sort_values(["n_chars", "source"],
                           ascending=[False, True])["source"].tolist()
    by_voc = m.sort_values(["vocab", "source"],
                           ascending=[False, True])["source"].tolist()
    n = len(m)
    depth = min(n, len(_RBO_P_PPM))
    acc = 0
    ov5 = 0
    for d in range(1, depth + 1):
        ov = len(set(by_vol[:d]) & set(by_voc[:d]))
        if d == 5:
            ov5 = ov
        acc += _RBO_P_PPM[d - 1] * ov * 1_000_000 // d
    # (1-p)/p = 1/9: rbo_ppm = acc // (9 * 1e6)
    rbo_ppm = acc // (9 * 1_000_000)
    out = pd.DataFrame({
        "n_sources": [np.int64(n)],
        "overlap_at_5": np.int64(ov5),
        "rbo_ppm": np.int64(rbo_ppm),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _rbo_sql() -> str:
    w = ", ".join(f"({d + 1}, {p})" for d, p in enumerate(_RBO_P_PPM))
    from .voteops import _SQL_METRICS
    return _SQL_METRICS + f"""
, wts(d, w) AS (VALUES {w}),
rv AS (
  SELECT source,
         row_number() OVER (ORDER BY n_chars DESC, source) AS r
  FROM m
), rc AS (
  SELECT source,
         row_number() OVER (ORDER BY vocab DESC, source) AS r
  FROM m
), n AS (SELECT count(*) AS k FROM m),
ov AS (
  SELECT wts.d,
         (SELECT count(*) FROM rv JOIN rc USING (source)
          WHERE rv.r <= wts.d AND rc.r <= wts.d) AS o,
         wts.w
  FROM wts WHERE wts.d <= (SELECT k FROM n)
), acc AS (
  SELECT sum(w * o * 1000000 // d) AS a,
         max(CASE WHEN d = 5 THEN o END) AS ov5
  FROM ov
)
SELECT CAST((SELECT k FROM n) AS BIGINT) AS n_sources,
       CAST(coalesce(ov5, 0) AS BIGINT) AS overlap_at_5,
       CAST(a // (9 * 1000000) AS BIGINT) AS rbo_ppm
FROM acc
"""


SQL_RBO_RANKINGS = _rbo_sql()


# ---------------------------------------------------------------------------
# price_ladder_audit
# ---------------------------------------------------------------------------


def price_ladder_audit(sf_dir: str):
    """Price-point structure per part brand: distinct extended-price
    cent values, the modal price (ties to the smaller price) and its
    share of lineitems in ppm — scripted or laddered pricing reads as
    few points with a dominant mode.

    Scale shape: the part→brand dimension broadcasts; one bounded
    (brand, cents) census; the mode picks per brand on the bounded
    census."""
    import pyarrow.parquet as pq
    import ray

    pmap = dict(zip(
        *[pq.read_table(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"]).column(c)
          .to_pylist() for c in ("p_partkey", "p_brand")]))
    ref = ray.put(pmap)

    def prep(t: pa.Table) -> pa.Table:
        mp = ray.get(ref)
        keys = t["l_partkey"].to_numpy()
        return pa.table({
            "brand": pa.array([mp[int(k)] for k in keys]),
            "cents": pa.array(_cents(t["l_extendedprice"].to_numpy()),
                              pa.int64()),
        })

    census = (
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["brand", "cents"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    rows = []
    for brand, g in census.groupby("brand"):
        total = int(g["c"].sum())
        top = g.sort_values(["c", "cents"],
                            ascending=[False, True]).iloc[0]
        rows.append((brand, len(g), int(top["cents"]),
                     int(top["c"]) * 1_000_000 // total))
    out = pd.DataFrame(rows, columns=["brand", "n_price_points",
                                      "modal_cents", "modal_ppm"]) \
        .sort_values("brand").reset_index(drop=True)
    for c in ("n_price_points", "modal_cents", "modal_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_PRICE_LADDER_AUDIT = """
WITH census AS (
  SELECT p_brand AS brand,
         CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents,
         count(*) AS c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT brand, cents, c,
         sum(c) OVER (PARTITION BY brand) AS total,
         count(*) OVER (PARTITION BY brand) AS pts,
         row_number() OVER (PARTITION BY brand
                            ORDER BY c DESC, cents) AS rn
  FROM census
)
SELECT brand, CAST(pts AS BIGINT) AS n_price_points,
       CAST(cents AS BIGINT) AS modal_cents,
       CAST(c * 1000000 // total AS BIGINT) AS modal_ppm
FROM ranked WHERE rn = 1 ORDER BY brand
"""


# ---------------------------------------------------------------------------
# csr_footprint_estimate
# ---------------------------------------------------------------------------


def csr_footprint_estimate(sf_dir: str):
    """Sparse-matrix planning for the doc × term incidence matrix: nnz =
    Σ per-doc distinct terms, rows = docs, cols = corpus vocabulary; CSR
    bytes = 16·nnz + 8·(rows+1) (int64 values + column indices +
    indptr), dense bytes = 8·rows·cols, savings in ppm of dense.

    Scale shape: nnz from a zero-shuffle per-doc map; vocabulary from
    the term-bucketed distinct fold; all folds bounded."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .materialize()
    rows_n = ds.count()

    def nnz_part(df: pd.DataFrame) -> pd.DataFrame:
        v = [len(set(_WORD_RE.findall((t or "").lower())))
             for t in df["text"]]
        return pd.DataFrame({"nnz": [int(sum(v))]})

    nnz = int((
        ds.map_batches(_pd_arrow(nnz_part), batch_format="pandas")
        .aggregate(Sum("nnz", alias_name="n")) or {}).get("n") or 0)

    def terms(df: pd.DataFrame) -> pd.DataFrame:
        t_l = sorted({w for t in df["text"]
                      for w in _WORD_RE.findall((t or "").lower())})
        p = pd.DataFrame({"term": t_l})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % 256).astype(np.int64)
        return p

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g["term"].nunique())]})

    cols_n = int((
        ds.map_batches(_pd_arrow(terms), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(cnt), batch_format="pandas")
        .aggregate(Sum("n", alias_name="n")) or {}).get("n") or 0)
    csr = 16 * nnz + 8 * (rows_n + 1)
    dense = 8 * rows_n * cols_n
    out = pd.DataFrame({
        "rows": [np.int64(rows_n)], "cols": np.int64(cols_n),
        "nnz": np.int64(nnz), "csr_bytes": np.int64(csr),
        "dense_bytes": np.int64(dense),
        "savings_ppm": np.int64(_trunc_div((dense - csr) * 1_000_000,
                                           dense) if dense else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CSR_FOOTPRINT_ESTIMATE = """
WITH t AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
), s AS (
  SELECT (SELECT count(*) FROM documents) AS rows_,
         (SELECT count(DISTINCT term) FROM t) AS cols_,
         (SELECT count(*) FROM t) AS nnz
)
SELECT CAST(rows_ AS BIGINT) AS rows, CAST(cols_ AS BIGINT) AS cols,
       CAST(nnz AS BIGINT) AS nnz,
       CAST(16 * nnz + 8 * (rows_ + 1) AS BIGINT) AS csr_bytes,
       CAST(8 * rows_ * cols_ AS BIGINT) AS dense_bytes,
       CAST(CASE WHEN rows_ * cols_ = 0 THEN 0
                 ELSE (8 * rows_ * cols_ - (16 * nnz + 8 * (rows_ + 1)))
                      * 1000000 // (8 * rows_ * cols_) END AS BIGINT)
         AS savings_ppm
FROM s
"""


LISTOPS_REGISTRY = {
    "rbo_rankings": (rbo_rankings, SQL_RBO_RANKINGS),
    "price_ladder_audit": (price_ladder_audit, SQL_PRICE_LADDER_AUDIT),
    "csr_footprint_estimate": (csr_footprint_estimate,
                               SQL_CSR_FOOTPRINT_ESTIMATE),
}
