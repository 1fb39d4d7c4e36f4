"""Operator batch 55 — heavy-tail estimation, syndication provenance and
seasonal strength.

Reference anchors: none in the reference; these add:

- hill_tail_index: the Hill estimator over the top-20 user spends —
  1/α̂ in micro units as the mean of quantized ln(x_i / x_k) over the
  top k−1 order statistics (the webqa ln rule: identical doubles from
  identical integers, per-term quantization); the heavy-tail exponent
  behind "how whale-dominated is spend?".
- syndication_direction: provenance for batch 41's duplicated lead
  fingerprints — for each fingerprint spanning ≥ 2 sources, the source
  holding the LOWEST doc_id is the origin; per source, how many shared
  leads it originated vs copied.
- dow_eta2: seasonal strength — the one-way eta² of the dense daily
  counts grouped by day-of-week (epoch day % 7), with the floor-per-
  group convention of batch 35's ANOVA; ≈ 0 means weekday structure
  explains nothing.
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
from .queries import _bucketed_agg, _pd_arrow, _read

_WORD_RE = __import__("re").compile(r"[a-z]+")

_HILL_K = 20
_LEAD_WORDS = 6


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------


def hill_tail_index(sf_dir: str):
    """Hill estimator on per-user purchase spend: with x₁ ≥ … ≥ x_k the
    top-20 spends (ties by smaller user id; x_k > 0 required), 1/α̂ in
    micro units = Σ_{i<k} floor(10⁶·ln(x_i/x_k) + 0.5) // (k−1);
    alpha_milli = trunc(10⁹ / that). Low α (≲ 2) = whale-dominated.

    Scale shape: per-user spend via ONE user-bucketed fold with
    per-bucket top-20 prune; the Hill fold runs on 20 rows."""
    ev = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({
            "user_id": t["user_id"],
            "cents": pa.array(_cents(t["value"].to_numpy()), pa.int64()),
        })

    spend = _bucketed_agg(ev.map_batches(prep, batch_format="pyarrow"),
                          ["user_id"], {"s": ("cents", "sum")})

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["s", "user_id"],
                              ascending=[False, True]).head(_HILL_K)

    top = (
        spend.map_batches(_pd_arrow(prune), batch_format="pandas")
        .to_pandas()
        .sort_values(["s", "user_id"], ascending=[False, True])
        .head(_HILL_K)
    )
    x = top["s"].to_numpy(np.int64)
    k = len(x)
    xk = int(x[-1])
    inv = sum(int(math.floor(1_000_000 * math.log(int(v) / xk) + 0.5))
              for v in x[:-1]) // (k - 1) if k > 1 and xk > 0 else 0
    out = pd.DataFrame({
        "k_top": [np.int64(k)],
        "xk_cents": np.int64(xk),
        "inv_alpha_micro": np.int64(inv),
        "alpha_milli": np.int64(10 ** 9 // inv if inv else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_HILL_TAIL_INDEX = f"""
WITH spend AS (
  SELECT user_id, sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS s
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), top AS (
  SELECT s, row_number() OVER (ORDER BY s DESC, user_id) AS rn
  FROM spend
  ORDER BY s DESC, user_id LIMIT {_HILL_K}
), xk AS (SELECT s AS v, max(rn) OVER () AS k FROM top
          WHERE rn = (SELECT max(rn) FROM top)),
inv AS (
  SELECT sum(CAST(floor(1000000 * ln(CAST(s AS DOUBLE)
                                     / (SELECT v FROM xk)) + 0.5)
                  AS BIGINT)) // ((SELECT k FROM xk) - 1) AS i
  FROM top WHERE rn < (SELECT k FROM xk)
)
SELECT CAST((SELECT k FROM xk) AS BIGINT) AS k_top,
       CAST((SELECT v FROM xk) AS BIGINT) AS xk_cents,
       CAST((SELECT i FROM inv) AS BIGINT) AS inv_alpha_micro,
       CAST(CASE WHEN (SELECT i FROM inv) = 0 THEN 0
                 ELSE 1000000000 // (SELECT i FROM inv) END AS BIGINT)
         AS alpha_milli
"""


# ---------------------------------------------------------------------------
# syndication_direction
# ---------------------------------------------------------------------------


def syndication_direction(sf_dir: str):
    """Provenance of shared leads: for each lead-6-word fingerprint
    spanning ≥ 2 sources, the source of the LOWEST doc_id is the origin
    (ties impossible — doc ids are unique); per source, the shared leads
    it originated and the ones it copied. Sources without shared leads
    are omitted.

    Scale shape: (fingerprint, source, min doc) folds block-locally
    through ONE fingerprint-bucketed shuffle; the per-source census is
    bounded."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def leads(df: pd.DataFrame) -> pd.DataFrame:
        fp_l, src_l, doc_l = [], [], []
        for did, src, tx in zip(df["doc_id"], df["source"], df["text"]):
            ws = _WORD_RE.findall((tx or "").lower())
            if len(ws) < _LEAD_WORDS:
                continue
            fp_l.append(int(hashlib.md5(
                " ".join(ws[:_LEAD_WORDS]).encode()).hexdigest()[:15], 16))
            src_l.append(src)
            doc_l.append(did)
        p = pd.DataFrame({"fp": pd.array(fp_l, "int64"),
                          "source": src_l,
                          "doc_id": pd.array(doc_l, "int64")})
        p = p.groupby(["fp", "source"], sort=False)["doc_id"].min() \
            .reset_index()
        p["_kb"] = (p["fp"].to_numpy(np.int64) & 255).astype(np.int64)
        return p

    def census(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["fp", "source"], sort=False)["doc_id"].min() \
            .reset_index()
        spread = d.groupby("fp", sort=False)["source"].nunique()
        shared = set(spread[spread >= 2].index)
        d = d[d["fp"].isin(shared)]
        if d.empty:
            return pd.DataFrame({"source": pd.Series([], dtype="object"),
                                 "orig": pd.Series([], dtype="int64"),
                                 "copied": pd.Series([], dtype="int64")})
        first = d.loc[d.groupby("fp")["doc_id"].idxmin()]
        origin = first.groupby("source").size()
        total = d.groupby("source").size()
        out = pd.DataFrame({
            "source": total.index,
            "orig": [int(origin.get(s, 0)) for s in total.index],
            "copied": [int(total[s]) - int(origin.get(s, 0))
                       for s in total.index],
        })
        return out

    got = (
        ds.map_batches(_pd_arrow(leads), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(census), batch_format="pandas")
        .groupby("source").aggregate(Sum("orig", alias_name="originated"),
                                     Sum("copied", alias_name="copied"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    for c in ("originated", "copied"):
        got[c] = got[c].astype("int64")
    return pa.Table.from_pandas(got, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SYNDICATION_DIRECTION = f"""
WITH w AS (
  SELECT doc_id, source,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), fp AS (
  SELECT CAST(('0x' || substr(md5(ws[1] || ' ' || ws[2] || ' ' || ws[3] ||
               ' ' || ws[4] || ' ' || ws[5] || ' ' || ws[6]), 1, 15))
              AS BIGINT) AS fp,
         source, min(doc_id) AS doc_id
  FROM w WHERE len(ws) >= {_LEAD_WORDS}
  GROUP BY 1, 2
), shared AS (
  SELECT fp FROM fp GROUP BY fp HAVING count(*) >= 2
), d AS (
  SELECT fp.* FROM fp JOIN shared USING (fp)
), firsts AS (
  SELECT fp, source AS origin_src
  FROM (SELECT fp, source,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM d)
  WHERE rn = 1
)
SELECT d.source,
       CAST(sum(CASE WHEN f.origin_src = d.source THEN 1 ELSE 0 END)
            AS BIGINT) AS originated,
       CAST(sum(CASE WHEN f.origin_src = d.source THEN 0 ELSE 1 END)
            AS BIGINT) AS copied
FROM d JOIN firsts f USING (fp)
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# dow_eta2
# ---------------------------------------------------------------------------


def dow_eta2(sf_dir: str):
    """Seasonal strength: one-way eta² of the dense daily counts grouped
    by day-of-week (epoch day % 7), with the floor-per-group convention
    A = Σ_g ⌊n·S_g²/n_g⌋: eta2_ppm = (A − T²)·10⁶ // (n·Σx² − T²) over
    the n dense days. High eta² = strong weekday structure.

    Scale shape: days are bounded — one bounded groupby, then the
    decomposition on the bounded 7-group table."""
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
    n = hi - lo + 1
    x = np.zeros(n, np.int64)
    x[daily["day"].to_numpy(np.int64) - lo] = daily["c"].to_numpy(np.int64)
    days = np.arange(lo, hi + 1)
    dow = days % 7
    t_sum = int(x.sum())
    sxx = int((x.astype(object) ** 2).sum())
    a = 0
    for g in range(7):
        m = dow == g
        ng = int(m.sum())
        if ng:
            sg = int(x[m].sum())
            a += n * sg * sg // ng
    ssb = a - t_sum * t_sum
    sst = n * sxx - t_sum * t_sum
    out = pd.DataFrame({
        "n_days": [np.int64(n)],
        "eta2_ppm": np.int64(ssb * 1_000_000 // sst if sst else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DOW_ETA2 = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1
), spine AS (
  SELECT unnest(generate_series((SELECT min(day) FROM daily),
                                (SELECT max(day) FROM daily))) AS day
), dense AS (
  SELECT s.day, s.day % 7 AS dow, coalesce(d.c, 0) AS x
  FROM spine s LEFT JOIN daily d USING (day)
), tot AS (
  SELECT count(*) AS n, sum(x) AS t,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM dense
), grp AS (
  SELECT dow, sum(x) AS sg, count(*) AS ng FROM dense GROUP BY 1
), a AS (
  SELECT sum((SELECT n FROM tot) * CAST(sg AS HUGEINT) * sg // ng) AS a
  FROM grp
)
SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_days,
       CAST(CASE WHEN (SELECT n FROM tot) * (SELECT sxx FROM tot)
                      - CAST((SELECT t FROM tot) AS HUGEINT)
                        * (SELECT t FROM tot) = 0 THEN 0
            ELSE ((SELECT a FROM a)
                  - CAST((SELECT t FROM tot) AS HUGEINT)
                    * (SELECT t FROM tot)) * 1000000
                 // ((SELECT n FROM tot) * (SELECT sxx FROM tot)
                     - CAST((SELECT t FROM tot) AS HUGEINT)
                       * (SELECT t FROM tot))
            END AS BIGINT) AS eta2_ppm
FROM tot
"""


TAILOPS_REGISTRY = {
    "hill_tail_index": (hill_tail_index, SQL_HILL_TAIL_INDEX),
    "syndication_direction": (syndication_direction,
                              SQL_SYNDICATION_DIRECTION),
    "dow_eta2": (dow_eta2, SQL_DOW_ETA2),
}
