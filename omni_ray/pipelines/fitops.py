"""Operator batch 40 — monotone fitting, index-number decomposition,
recency weighting and tokenizer economics.

Reference anchors: none in the reference; these add:

- isotonic_value_fit: weighted isotonic (monotone non-decreasing)
  regression of mean purchase cents over ten day-bands of the stream,
  via the EXACT max-min closed form fit_i = max_{j≤i} min_{k≥i}
  Avg(j, k) — no iterative PAVA, O(m³) over the bounded band table,
  fractions compared exactly and floored to milli only at the end.
- price_volume_decomp: the Laspeyres-style revenue-change decomposition
  between stream halves per part brand: Δrev = Σ(q₂−q₁)·p̄₁ (volume
  effect) + Σq₂·(p̄₂−p̄₁) (price effect), exact in integer cents·quantity
  units (mean prices as exact integer-floored cents).
- decayed_value_by_type: recency-weighted value per event type with an
  EXACT half-life-per-week decay — each event contributes cents >>
  weeks_old (bit-shift halving, no floats).
- chars_per_token_by_lang: chars·milli per whitespace-token per
  language — the tokenizer-cost economics read.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .engineops import _DAY_US
from .queries import _read

_ISO_BANDS = 10
_WEEK_US = 7 * _DAY_US


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# isotonic_value_fit
# ---------------------------------------------------------------------------


def isotonic_value_fit(sf_dir: str):
    """Weighted isotonic regression of mean purchase cents over ten
    day-bands (band = min((day−lo)·10 // span, 9) + 1): the fitted
    monotone value at each non-empty band via the exact max-min formula
    over prefix sums, fit_milli = 1000·num // den of the realizing
    window average. The monotone trend read behind "is basket size
    growing?".

    Scale shape: one bounded band groupby; the O(bands³) fit runs on the
    bounded band table."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US),
            "cents": pa.array(_cents(t["value"].to_numpy()), pa.int64()),
        })

    dd = ev.map_batches(prep, batch_format="pyarrow").materialize()
    agg = dd.aggregate(Min("day"), Max("day")) or {}
    lo, hi = int(agg["min(day)"]), int(agg["max(day)"])
    span = hi - lo + 1

    def band(t: pa.Table) -> pa.Table:
        d = np.asarray(t["day"].to_numpy(), np.int64)
        b = np.minimum((d - lo) * _ISO_BANDS // span, _ISO_BANDS - 1) + 1
        return pa.table({
            "band": pa.array(b, pa.int64()),
            "cents": t["cents"],
        })

    bins = (
        dd.map_batches(band, batch_format="pyarrow")
        .groupby("band").aggregate(Count(alias_name="w"),
                                   Sum("cents", alias_name="y"))
        .to_pandas().sort_values("band").reset_index(drop=True)
    )
    w = bins["w"].to_numpy(np.int64)
    y = bins["y"].to_numpy(np.int64)
    m = len(bins)
    wp = np.concatenate([[0], np.cumsum(w)])
    yp = np.concatenate([[0], np.cumsum(y)])

    def avg(j, k):  # 1-based inclusive window [j, k]
        return Fraction(int(yp[k] - yp[j - 1]), int(wp[k] - wp[j - 1]))

    fits = []
    for i in range(1, m + 1):
        best = None
        for j in range(1, i + 1):
            worst = None
            for k in range(i, m + 1):
                a = avg(j, k)
                if worst is None or a < worst:
                    worst = a
            if best is None or worst > best:
                best = worst
        fits.append(1000 * best.numerator // best.denominator)
    out = pd.DataFrame({
        "band": bins["band"].astype("int64"),
        "n_purchases": bins["w"].astype("int64"),
        "raw_mean_milli": (bins["y"].astype("int64") * 1000
                           // bins["w"].astype("int64")),
        "fit_milli": pd.array(fits, "int64"),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ISOTONIC_VALUE_FIT = f"""
WITH p AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), lims AS (SELECT min(day) AS lo, max(day) - min(day) + 1 AS span FROM p),
b AS (
  SELECT least((day - (SELECT lo FROM lims)) * {_ISO_BANDS}
                 // (SELECT span FROM lims), {_ISO_BANDS - 1}) + 1 AS band,
         cents
  FROM p
), bins AS (
  SELECT band, count(*) AS w, sum(cents) AS y FROM b GROUP BY 1
), pos AS (
  SELECT band, w, y, row_number() OVER (ORDER BY band) AS i,
         sum(w) OVER (ORDER BY band) AS wp,
         sum(y) OVER (ORDER BY band) AS yp
  FROM bins
), m AS (SELECT count(*) AS m FROM pos),
grid AS (
  SELECT pi.i, pj.i AS j, pk.i AS k,
         pk.yp - coalesce(lagj.yp, 0) AS num,
         pk.wp - coalesce(lagj.wp, 0) AS den
  FROM pos pi
  JOIN pos pj ON pj.i <= pi.i
  JOIN pos pk ON pk.i >= pi.i
  LEFT JOIN pos lagj ON lagj.i = pj.i - 1
), inner_min AS (
  SELECT i, j, num, den,
         row_number() OVER (PARTITION BY i, j
                            ORDER BY CAST(num AS DOUBLE) / den, k) AS rn
  FROM grid
), mins AS (
  SELECT i, j, num, den FROM inner_min WHERE rn = 1
), outer_max AS (
  SELECT i, num, den,
         row_number() OVER (PARTITION BY i
                            ORDER BY CAST(num AS DOUBLE) / den DESC, j)
           AS rn
  FROM mins
)
SELECT CAST(p.band AS BIGINT) AS band, CAST(p.w AS BIGINT) AS n_purchases,
       CAST(p.y * 1000 // p.w AS BIGINT) AS raw_mean_milli,
       CAST(o.num * 1000 // o.den AS BIGINT) AS fit_milli
FROM pos p JOIN outer_max o ON o.i = p.i AND o.rn = 1
ORDER BY p.band
"""


# ---------------------------------------------------------------------------
# price_volume_decomp
# ---------------------------------------------------------------------------


def price_volume_decomp(sf_dir: str):
    """Laspeyres-style revenue-change decomposition between shipdate
    halves per part brand: with per-half quantity-cents q and mean price
    cents p̄ = rev // q (integer floor, the shared convention),
    volume_effect = (q₂−q₁)·p̄₁ and price_effect = q₂·(p̄₂−p̄₁); the
    residual keeps the identity Δrev = volume + price + residual exact.

    Scale shape: the part→brand dimension broadcasts; one bounded
    (brand, half) groupby; the decomposition runs on the bounded brand
    table."""
    import pyarrow.parquet as pq
    import ray

    pmap = dict(zip(
        *[pq.read_table(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"]).column(c)
          .to_pylist() for c in ("p_partkey", "p_brand")]))
    ref = ray.put(pmap)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_shipdate"])
    agg = li.aggregate(Min("l_shipdate"), Max("l_shipdate")) or {}
    lo = int(pd.Timestamp(agg["min(l_shipdate)"]).value // 1000)
    hi = int(pd.Timestamp(agg["max(l_shipdate)"]).value // 1000)
    mid = (lo + hi) // 2

    def prep(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = t["l_partkey"].to_numpy()
        us = pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
        return pa.table({
            "brand": pa.array([m[int(k)] for k in keys]),
            "half": pa.array((us > mid).astype(np.int64), pa.int64()),
            "qc": pa.array(_cents(t["l_quantity"].to_numpy()), pa.int64()),
            "rev": pa.array(_cents(t["l_extendedprice"].to_numpy()),
                            pa.int64()),
        })

    cells = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby(["brand", "half"]).aggregate(
            Sum("qc", alias_name="q"), Sum("rev", alias_name="r"))
        .to_pandas().set_index(["brand", "half"])
    )
    brands = sorted({b for b, _ in cells.index})
    rows = []
    for b in brands:
        q1 = int(cells["q"].get((b, 0), 0))
        q2 = int(cells["q"].get((b, 1), 0))
        r1 = int(cells["r"].get((b, 0), 0))
        r2 = int(cells["r"].get((b, 1), 0))
        p1 = r1 * 100 // q1 if q1 else 0  # price cents per unit (x100)
        p2 = r2 * 100 // q2 if q2 else 0
        vol = (q2 - q1) * p1 // 100
        prc = q2 * (p2 - p1) // 100
        rows.append((b, r2 - r1, vol, prc, (r2 - r1) - vol - prc))
    out = pd.DataFrame(rows, columns=["brand", "delta_rev", "volume_eff",
                                      "price_eff", "residual"])
    for c in ("delta_rev", "volume_eff", "price_eff", "residual"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_PRICE_VOLUME_DECOMP = """
WITH lims AS (
  SELECT (epoch_us(min(l_shipdate)) + epoch_us(max(l_shipdate))) // 2
           AS mid
  FROM lineitem
), cells AS (
  SELECT p_brand AS brand,
         CASE WHEN epoch_us(l_shipdate) > (SELECT mid FROM lims)
              THEN 1 ELSE 0 END AS half,
         sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS q,
         sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS r
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), wide AS (
  SELECT brand,
         coalesce(max(CASE WHEN half = 0 THEN q END), 0) AS q1,
         coalesce(max(CASE WHEN half = 1 THEN q END), 0) AS q2,
         coalesce(max(CASE WHEN half = 0 THEN r END), 0) AS r1,
         coalesce(max(CASE WHEN half = 1 THEN r END), 0) AS r2
  FROM cells GROUP BY 1
), dec AS (
  SELECT brand, r2 - r1 AS delta_rev,
         (q2 - q1) * (CASE WHEN q1 = 0 THEN 0
                           ELSE r1 * 100 // q1 END) // 100 AS volume_eff,
         q2 * ((CASE WHEN q2 = 0 THEN 0 ELSE r2 * 100 // q2 END)
               - (CASE WHEN q1 = 0 THEN 0 ELSE r1 * 100 // q1 END))
           // 100 AS price_eff
  FROM wide
)
SELECT brand, CAST(delta_rev AS BIGINT) AS delta_rev,
       CAST(volume_eff AS BIGINT) AS volume_eff,
       CAST(price_eff AS BIGINT) AS price_eff,
       CAST(delta_rev - volume_eff - price_eff AS BIGINT) AS residual
FROM dec ORDER BY brand
"""


# ---------------------------------------------------------------------------
# decayed_value_by_type
# ---------------------------------------------------------------------------


def decayed_value_by_type(sf_dir: str):
    """Recency-weighted value per event type with an exact one-week
    half-life: each event contributes cents >> weeks_old (whole weeks
    before the stream's max timestamp; bit-shift halving — zero floats).
    Reports raw and decayed totals plus the retained share in ppm.

    Scale shape: one global max, one vectorized map, one bounded type
    groupby."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    agg = ev.aggregate(Max("ts")) or {}
    hi = int(pd.Timestamp(agg["max(ts)"]).value // 1000)

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        cents = _cents(t["value"].to_numpy())
        weeks = np.minimum((hi - us) // _WEEK_US, 62)
        return pa.table({
            "event_type": t["event_type"],
            "raw": pa.array(cents, pa.int64()),
            "dec": pa.array(cents >> weeks, pa.int64()),
        })

    out = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type").aggregate(
            Sum("raw", alias_name="raw_cents"),
            Sum("dec", alias_name="decayed_cents"))
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    out["retained_ppm"] = (out["decayed_cents"].astype("int64") * 1_000_000
                           // out["raw_cents"].astype("int64")
                           ).where(out["raw_cents"] > 0, 0)
    for c in ("raw_cents", "decayed_cents", "retained_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DECAYED_VALUE_BY_TYPE = f"""
WITH hi AS (SELECT epoch_us(max(ts)) AS h FROM events),
e AS (
  SELECT event_type,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents,
         least(((SELECT h FROM hi) - epoch_us(ts)) // {_WEEK_US}, 62)
           AS weeks
  FROM events
), agg AS (
  SELECT event_type, sum(cents) AS raw_cents,
         sum(cents // (CAST(1 AS BIGINT) << weeks)) AS decayed_cents
  FROM e GROUP BY 1
)
SELECT event_type, CAST(raw_cents AS BIGINT) AS raw_cents,
       CAST(decayed_cents AS BIGINT) AS decayed_cents,
       CAST(CASE WHEN raw_cents <= 0 THEN 0
                 ELSE decayed_cents * 1000000 // raw_cents END AS BIGINT)
         AS retained_ppm
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# chars_per_token_by_lang
# ---------------------------------------------------------------------------


def chars_per_token_by_lang(sf_dir: str):
    """Tokenizer economics per language: total chars, whitespace-token
    count (the '\\S+' convention the suite's token_counts uses) and
    chars·milli per token — the byte-cost read behind per-language
    tokenizer budgets.

    Scale shape: one zero-shuffle map, one bounded lang groupby."""
    import re
    tok = re.compile(r"\S+")
    ds = _read(sf_dir, "documents", columns=["text", "lang", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        toks = np.array([len(tok.findall(x or ""))
                         for x in t["text"].to_pylist()], np.int64)
        return pa.table({
            "lang": t["lang"],
            "chars": pa.array(np.asarray(t["n_chars"].to_numpy(),
                                         np.int64)),
            "toks": pa.array(toks, pa.int64()),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("lang").aggregate(Sum("chars", alias_name="chars"),
                                   Sum("toks", alias_name="tokens"))
        .to_pandas().sort_values("lang").reset_index(drop=True)
    )
    out["chars_per_token_milli"] = (out["chars"].astype("int64") * 1000
                                    // out["tokens"].astype("int64"))
    for c in ("chars", "tokens", "chars_per_token_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CHARS_PER_TOKEN_BY_LANG = r"""
WITH t AS (
  SELECT lang, n_chars,
         length(regexp_extract_all(coalesce(text, ''), '\S+')) AS toks
  FROM documents
), agg AS (
  SELECT lang, sum(n_chars) AS chars, sum(toks) AS tokens
  FROM t GROUP BY 1
)
SELECT lang, CAST(chars AS BIGINT) AS chars,
       CAST(tokens AS BIGINT) AS tokens,
       CAST(chars * 1000 // tokens AS BIGINT) AS chars_per_token_milli
FROM agg ORDER BY lang
"""


FITOPS_REGISTRY = {
    "isotonic_value_fit": (isotonic_value_fit, SQL_ISOTONIC_VALUE_FIT),
    "price_volume_decomp": (price_volume_decomp, SQL_PRICE_VOLUME_DECOMP),
    "decayed_value_by_type": (decayed_value_by_type,
                              SQL_DECAYED_VALUE_BY_TYPE),
    "chars_per_token_by_lang": (chars_per_token_by_lang,
                                SQL_CHARS_PER_TOKEN_BY_LANG),
}
