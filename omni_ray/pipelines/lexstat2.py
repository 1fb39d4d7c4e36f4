"""Operator batch 50 — second-order lexical statistics and load shape.

Reference anchors: none in the reference; these round out the corpus-
linguistics family (hapax, adaptation, Zipf, richness estimators):

- yule_k_by_source: Yule's characteristic K per source — 10⁷·(Σc² − N)
  // N² over term occurrence counts; the repeat-rate constant that is
  (unlike TTR) insensitive to text length.
- digram_entropy_by_source: conditional character entropy H(c₂|c₁) per
  source over [a-z] digrams in micro-nats (the webqa ln rule: identical
  doubles from identical integers, quantized per cell) — the
  compression-planning read one order above char_entropy.
- crest_factor_daily: peak-to-mean load ratio of the daily event series
  per type in milli (max·days·1000 // total) — the capacity headroom
  number.
- sttr_by_source: standardized type-token ratio — distinct terms in
  each document's FIRST 40 tokens (docs with ≥ 40 tokens; the corpus
  caps near 100), averaged per source in milli; the length-controlled
  diversity measure raw TTR can't give.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .engineops import _DAY_US
from .queries import _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")
_STTR_WINDOW = 40
_LEX2_BUCKETS = 256


# ---------------------------------------------------------------------------
# yule_k_by_source
# ---------------------------------------------------------------------------


def yule_k_by_source(sf_dir: str):
    """Yule's K per source: K_scaled = 10⁷·(Σc² − N) // N² over the
    source's term occurrence counts c (N = token total). Higher K =
    more repetitive vocabulary; insensitive to corpus size.

    Scale shape: (source, term) occurrence counts fold block-locally
    through ONE term-bucketed shuffle emitting per-source (Σc², N)
    partials; the K fold is a bounded source groupby."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def occ(df: pd.DataFrame) -> pd.DataFrame:
        src_l, term_l, n_l = [], [], []
        for src, tx in zip(df["source"], df["text"]):
            local: dict = {}
            for w in _WORD_RE.findall((tx or "").lower()):
                local[w] = local.get(w, 0) + 1
            for w, c in local.items():
                src_l.append(src)
                term_l.append(w)
                n_l.append(c)
        p = pd.DataFrame({"source": src_l, "term": term_l, "n": n_l})
        p = p.groupby(["source", "term"], sort=False)["n"].sum() \
            .reset_index()
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _LEX2_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["source", "term"], sort=False)["n"].sum() \
            .reset_index()
        out = d.assign(sq=d["n"].astype(object) ** 2) \
            .groupby("source", sort=False) \
            .agg(ssq=("sq", "sum"), tot=("n", "sum")).reset_index()
        out["ssq"] = out["ssq"].astype("int64")
        return out

    agg = (
        ds.map_batches(_pd_arrow(occ), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("source").aggregate(Sum("ssq", alias_name="ssq"),
                                     Sum("tot", alias_name="tot"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    agg["yule_k_scaled"] = [
        10 ** 7 * (int(r["ssq"]) - int(r["tot"]))
        // (int(r["tot"]) ** 2) if r["tot"] else 0
        for _, r in agg.iterrows()]
    out = agg.rename(columns={"tot": "n_tokens"})
    out = out[["source", "n_tokens", "yule_k_scaled"]]
    for c in ("n_tokens", "yule_k_scaled"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_YULE_K_BY_SOURCE = """
WITH occ AS (
  SELECT source, term, count(*) AS c
  FROM (SELECT source, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
  GROUP BY 1, 2
), agg AS (
  SELECT source, sum(CAST(c AS HUGEINT) * c) AS ssq, sum(c) AS tot
  FROM occ GROUP BY 1
)
SELECT source, CAST(tot AS BIGINT) AS n_tokens,
       CAST(CASE WHEN tot = 0 THEN 0
                 ELSE 10000000 * (ssq - tot)
                      // (CAST(tot AS HUGEINT) * tot) END AS BIGINT)
         AS yule_k_scaled
FROM agg ORDER BY source
"""


# ---------------------------------------------------------------------------
# digram_entropy_by_source
# ---------------------------------------------------------------------------


def digram_entropy_by_source(sf_dir: str):
    """Conditional character entropy H(c₂|c₁) per source over adjacent
    [a-z] pairs WITHIN words: each digram cell (a, b) with count n_ab
    and row total n_a contributes floor(10⁶·n_ab·ln(n_a/n_ab) + 0.5);
    H_micro = Σ // N. The order-1 compression-planning read.

    Scale shape: the digram domain is bounded (26²) — per-block cell
    partials fold in one bounded (source, c1, c2) groupby; entropy folds
    per source on the bounded matrix."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized digram census: per source, join the lowercased texts
        # with a separator byte and bincount adjacent [a-z] byte pairs —
        # non-[a-z] bytes (incl. every UTF-8 continuation byte) break runs,
        # so this equals the per-word pair walk. str.lower() stays per-row
        # for Unicode parity with the DuckDB oracle's lower().
        out = []
        for src, g in df.groupby("source", sort=False):
            blob = "\x00".join((tx or "").lower() for tx in g["text"])
            b = np.frombuffer(blob.encode("utf-8"), dtype=np.uint8)
            if len(b) < 2:
                continue
            m = (b >= 97) & (b <= 122)
            pair = m[:-1] & m[1:]
            if not pair.any():
                continue
            code = (b[:-1][pair].astype(np.int32) - 97) * 26 \
                + (b[1:][pair].astype(np.int32) - 97)
            cnt = np.bincount(code, minlength=676)
            nz = np.nonzero(cnt)[0]
            out.append(pd.DataFrame({
                "source": src,
                "c1": [chr(97 + c // 26) for c in nz],
                "c2": [chr(97 + c % 26) for c in nz],
                "n": cnt[nz].astype(np.int64),
            }))
        if not out:
            return pd.DataFrame({"source": pd.Series([], dtype="object"),
                                 "c1": pd.Series([], dtype="object"),
                                 "c2": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    # the cell domain is BOUNDED (sources × 26²), so the per-block partials
    # fold on the driver with one pandas groupby — a distributed
    # sort-aggregate here cost ~4 s of pure key machinery (bench r4 note)
    parts = ds.map_batches(_pd_arrow(cells), batch_format="pandas").to_pandas()
    mat = parts.groupby(["source", "c1", "c2"], sort=False)["n"] \
        .sum().reset_index()
    rows = []
    for src, g in mat.groupby("source", sort=False):
        row_tot = g.groupby("c1")["n"].sum()
        total = int(g["n"].sum())
        na_arr = g["c1"].map(row_tot).to_numpy(np.int64)
        nab_arr = g["n"].to_numpy(np.int64)
        # per-cell math.log (libm, matches DuckDB ln); the loop is over the
        # bounded cell matrix, not rows
        contrib = sum(
            int(math.floor(1_000_000 * int(nab) * math.log(int(na) / int(nab))
                           + 0.5))
            for na, nab in zip(na_arr, nab_arr))
        rows.append((src, total, contrib // total if total else 0))
    out = pd.DataFrame(rows, columns=["source", "n_digrams",
                                      "h_micro_nats"]) \
        .sort_values("source").reset_index(drop=True)
    for c in ("n_digrams", "h_micro_nats"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DIGRAM_ENTROPY_BY_SOURCE = """
WITH words AS (
  SELECT source,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
           AS w
  FROM documents
), cells AS (
  SELECT source, substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2,
         count(*) AS n
  FROM (SELECT source, w,
               unnest(generate_series(1, greatest(length(w) - 1, 0)))
                 AS i
        FROM words)
  GROUP BY 1, 2, 3
), rows_ AS (
  SELECT source, c1, sum(n) AS na FROM cells GROUP BY 1, 2
), contrib AS (
  SELECT cells.source,
         sum(CAST(floor(1000000 * cells.n
                        * ln(CAST(rows_.na AS DOUBLE) / cells.n) + 0.5)
                  AS BIGINT)) AS h,
         sum(cells.n) AS total
  FROM cells JOIN rows_ USING (source, c1)
  GROUP BY 1
)
SELECT source, CAST(total AS BIGINT) AS n_digrams,
       CAST(CASE WHEN total = 0 THEN 0 ELSE h // total END AS BIGINT)
         AS h_micro_nats
FROM contrib ORDER BY source
"""


# ---------------------------------------------------------------------------
# crest_factor_daily
# ---------------------------------------------------------------------------


def crest_factor_daily(sf_dir: str):
    """Crest factor (peak-to-mean) of the daily event load per type:
    max_day·n_days·1000 // total in milli — the capacity headroom a
    provisioner reads; 1000 = perfectly flat.

    Scale shape: one bounded (type, day) groupby; the fold runs on the
    bounded day table."""
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
    rows = []
    for etype, g in daily.groupby("event_type"):
        mx = int(g["c"].max())
        tot = int(g["c"].sum())
        rows.append((etype, nd, mx, mx * nd * 1000 // tot if tot else 0))
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "peak_day",
                                      "crest_milli"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in ("n_days", "peak_day", "crest_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CREST_FACTOR_DAILY = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (SELECT max(day) - min(day) + 1 AS nd FROM d),
agg AS (
  SELECT event_type, max(c) AS mx, sum(c) AS tot FROM d GROUP BY 1
)
SELECT event_type,
       CAST((SELECT nd FROM lims) AS BIGINT) AS n_days,
       CAST(mx AS BIGINT) AS peak_day,
       CAST(CASE WHEN tot = 0 THEN 0
                 ELSE mx * (SELECT nd FROM lims) * 1000 // tot END
            AS BIGINT) AS crest_milli
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# sttr_by_source
# ---------------------------------------------------------------------------


def sttr_by_source(sf_dir: str):
    """Standardized type-token ratio per source: over documents with
    ≥ 40 tokens, the distinct-term count of each document's FIRST 40
    tokens, averaged in milli — diversity controlled for length.

    Scale shape: one zero-shuffle map emitting per-block (source, sum,
    count) partials; one bounded source groupby."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        src_l, d_l = [], []
        for src, tx in zip(df["source"], df["text"]):
            ws = _WORD_RE.findall((tx or "").lower())
            if len(ws) < _STTR_WINDOW:
                continue
            src_l.append(src)
            d_l.append(len(set(ws[:_STTR_WINDOW])))
        return pd.DataFrame({"source": src_l,
                             "d": pd.array(d_l, "int64"),
                             "one": pd.array([1] * len(d_l), "int64")})

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("source").aggregate(Sum("d", alias_name="d"),
                                     Sum("one", alias_name="n_docs"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    out["sttr_milli"] = (out["d"].astype("int64") * 1000
                         // (out["n_docs"].astype("int64") * _STTR_WINDOW))
    out = out[["source", "n_docs", "sttr_milli"]]
    for c in ("n_docs", "sttr_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_STTR_BY_SOURCE = f"""
WITH w AS (
  SELECT source,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), eligible AS (
  SELECT source,
         len(list_distinct(ws[1:{_STTR_WINDOW}])) AS d
  FROM w WHERE len(ws) >= {_STTR_WINDOW}
), agg AS (
  SELECT source, sum(d) AS d, count(*) AS n_docs FROM eligible GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(d * 1000 // (n_docs * {_STTR_WINDOW}) AS BIGINT)
         AS sttr_milli
FROM agg ORDER BY source
"""


LEXSTAT2_REGISTRY = {
    "yule_k_by_source": (yule_k_by_source, SQL_YULE_K_BY_SOURCE),
    "digram_entropy_by_source": (digram_entropy_by_source,
                                 SQL_DIGRAM_ENTROPY_BY_SOURCE),
    "crest_factor_daily": (crest_factor_daily, SQL_CREST_FACTOR_DAILY),
    "sttr_by_source": (sttr_by_source, SQL_STTR_BY_SOURCE),
}
