"""Operator batch 63 — content locality, engagement-depth conversion and
timestamp forensics.

Reference anchors: none in the reference; these add:

- doc_distance_similarity: content locality — the mean 5-gram Jaccard
  (ppm) between documents at id-distance 1, 10 and 100; a sorted-by-
  topic corpus decays slowly, a shuffled one is flat. The "is doc order
  meaningful?" read behind block-locality decisions.
- depth_conversion_curve: engagement-to-conversion — users banded by
  total event count (band = min(events // 5, 5)), per band the user
  count and eventual-purchase ppm; the curve every growth team draws.
- parity_split_audit: timestamp forensics — per event type, events on
  even vs odd microsecond-seconds and the imbalance in milli; generated
  or quantized timestamps betray themselves here.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read
from .tsops import _trunc_div

_WORD_RE = __import__("re").compile(r"[a-z]+")
_DIST_KS = (1, 10, 100)


# ---------------------------------------------------------------------------
# doc_distance_similarity
# ---------------------------------------------------------------------------


def doc_distance_similarity(sf_dir: str):
    """Mean 5-gram Jaccard (ppm, per-pair floored then averaged floored)
    between docs at id-distance k ∈ {1, 10, 100}: pairs (d, d+k) where
    both exist and both have ≥ 5 words.

    Scale shape: each doc's shingle set rides to its pair groups through
    a (pair-id, side) shuffle per k — three bounded-fan shuffles (each
    doc joins ≤ 2 groups per k); Jaccard is computed in-bucket."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows_k, rows_g, rows_s, rows_h = [], [], [], []
        for did, tx in zip(df["doc_id"], df["text"]):
            ws = _WORD_RE.findall((tx or "").lower())
            if len(ws) < 5:
                continue
            hs = sorted({int(hashlib.md5(" ".join(ws[i:i + 5]).encode())
                             .hexdigest()[:15], 16)
                         for i in range(len(ws) - 4)})
            blob = ",".join(map(str, hs))
            for k in _DIST_KS:
                for g, side in ((did, 0), (did - k, 1)):
                    rows_k.append(k)
                    rows_g.append(g)
                    rows_s.append(side)
                    rows_h.append(blob)
        return pd.DataFrame({"k": pd.array(rows_k, "int64"),
                             "g": pd.array(rows_g, "int64"),
                             "side": pd.array(rows_s, "int64"),
                             "blob": rows_h})

    def pair_j(grp: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (k, g), w in grp.groupby(["k", "g"]):
            if len(w) != 2 or set(w["side"]) != {0, 1}:
                continue
            s0 = set(w.loc[w["side"] == 0, "blob"].iloc[0].split(","))
            s1 = set(w.loc[w["side"] == 1, "blob"].iloc[0].split(","))
            uni = len(s0 | s1)
            if uni == 0:
                continue
            rows.append((k, len(s0 & s1) * 1_000_000 // uni, 1))
        return pd.DataFrame(rows, columns=["k", "j", "n"]) if rows else \
            pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "j": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64")})

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_kb"] = ((df["g"].to_numpy(np.int64) * 4
                      + df["k"].to_numpy(np.int64) % 4) & 255)
        return df

    agg = (
        ds.map_batches(_pd_arrow(explode), batch_format="pandas")
        .map_batches(_pd_arrow(keyed), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(pair_j),
                                   batch_format="pandas")
        .groupby("k").aggregate(Sum("j", alias_name="jsum"),
                                Sum("n", alias_name="n_pairs"))
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    agg["mean_jaccard_ppm"] = (agg["jsum"].astype("int64")
                               // agg["n_pairs"].astype("int64")
                               ).where(agg["n_pairs"] > 0, 0)
    out = agg[["k", "n_pairs", "mean_jaccard_ppm"]] \
        .rename(columns={"k": "distance"})
    for c in ("distance", "n_pairs", "mean_jaccard_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _dist_sql() -> str:
    ks = ", ".join(f"({k})" for k in _DIST_KS)
    return f"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), sets AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(ws) - 4),
           i -> CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' ||
                 ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]), 1, 15))
                 AS BIGINT))) AS s
  FROM w WHERE len(ws) >= 5
), ks(k) AS (VALUES {ks}),
pairs AS (
  SELECT ks.k,
         len(list_intersect(a.s, b.s)) AS inter,
         len(list_distinct(list_concat(a.s, b.s))) AS uni
  FROM ks CROSS JOIN sets a
  JOIN sets b ON b.doc_id = a.doc_id + ks.k
), j AS (
  SELECT k, inter * 1000000 // uni AS jp FROM pairs WHERE uni > 0
)
SELECT CAST(k AS BIGINT) AS distance,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(CASE WHEN count(*) = 0 THEN 0
                 ELSE sum(jp) // count(*) END AS BIGINT)
         AS mean_jaccard_ppm
FROM j GROUP BY k ORDER BY k
"""


SQL_DOC_DISTANCE_SIMILARITY = _dist_sql()


# ---------------------------------------------------------------------------
# depth_conversion_curve
# ---------------------------------------------------------------------------


def depth_conversion_curve(sf_dir: str):
    """Engagement depth vs conversion: users banded by total event count
    (band = min(n_events // 5, 5)); per band the user count and the
    ppm share with ≥ 1 purchase.

    Scale shape: per-user (count, bought) via ONE user-bucketed fold;
    the curve is a bounded 6-key groupby."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("user_id", sort=False)["event_type"].agg(
            n="size",
            bought=lambda v: int((v == "purchase").any())).reset_index()
        d["band"] = np.minimum(d["n"].to_numpy(np.int64) // 5, 5)
        return d.groupby("band", sort=False).agg(
            n_users=("user_id", "size"),
            buyers=("bought", "sum")).reset_index()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_kb"] = (df["user_id"].to_numpy(np.int64) % 256)
        return df

    out = (
        ev.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("band").aggregate(Sum("n_users", alias_name="n_users"),
                                   Sum("buyers", alias_name="buyers"))
        .to_pandas().sort_values("band").reset_index(drop=True)
    )
    out["buy_ppm"] = (out["buyers"].astype("int64") * 1_000_000
                      // out["n_users"].astype("int64"))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_DEPTH_CONVERSION_CURVE = """
WITH u AS (
  SELECT user_id, count(*) AS n,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS bought
  FROM events GROUP BY 1
), banded AS (
  SELECT least(n // 5, 5) AS band, bought FROM u
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(bought) AS BIGINT) AS buyers,
       CAST(sum(bought) * 1000000 // count(*) AS BIGINT) AS buy_ppm
FROM banded GROUP BY band ORDER BY band
"""


# ---------------------------------------------------------------------------
# parity_split_audit
# ---------------------------------------------------------------------------


def parity_split_audit(sf_dir: str):
    """Timestamp forensics per type: events on even vs odd SECONDS
    (epoch_us // 10⁶ parity) and imbalance_milli = trunc(1000·(even −
    odd)/(even + odd)); organic arrival reads ≈ 0, generated or
    quantized timestamps drift.

    Scale shape: one vectorized map, one bounded (type, parity)
    groupby."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        sec = pc.cast(t["ts"], pa.int64()).to_numpy() // 1_000_000
        return pa.table({
            "event_type": t["event_type"],
            "par": pa.array(sec % 2, pa.int64()),
        })

    cells = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "par"]).aggregate(Count(alias_name="c"))
        .to_pandas().set_index(["event_type", "par"])["c"]
    )
    types = sorted({t for t, _ in cells.index})
    rows = []
    for t in types:
        even = int(cells.get((t, 0), 0))
        odd = int(cells.get((t, 1), 0))
        imb = _trunc_div(1000 * (even - odd), even + odd) \
            if even + odd else 0
        rows.append((t, even, odd, imb))
    out = pd.DataFrame(rows, columns=["event_type", "n_even", "n_odd",
                                      "imbalance_milli"])
    for c in ("n_even", "n_odd", "imbalance_milli"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_PARITY_SPLIT_AUDIT = """
WITH p AS (
  SELECT event_type, (epoch_us(ts) // 1000000) % 2 AS par FROM events
), cells AS (
  SELECT event_type,
         sum(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS n_even,
         sum(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS n_odd
  FROM p GROUP BY 1
)
SELECT event_type, CAST(n_even AS BIGINT) AS n_even,
       CAST(n_odd AS BIGINT) AS n_odd,
       CAST(CASE WHEN n_even + n_odd = 0 THEN 0
                 ELSE 1000 * (n_even - n_odd) // (n_even + n_odd) END
            AS BIGINT) AS imbalance_milli
FROM cells ORDER BY event_type
"""


LOCALOPS_REGISTRY = {
    "doc_distance_similarity": (doc_distance_similarity,
                                SQL_DOC_DISTANCE_SIMILARITY),
    "depth_conversion_curve": (depth_conversion_curve,
                               SQL_DEPTH_CONVERSION_CURVE),
    "parity_split_audit": (parity_split_audit, SQL_PARITY_SPLIT_AUDIT),
}
