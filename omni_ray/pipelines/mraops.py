"""Operator batch 33 — calibration, submodular selection, multiresolution
energy and Markov entropy.

Reference anchors: the reference has no model-evaluation or selection
layer; these add:

- calibration_bins: reliability table — documents binned by exact length
  deciles (rank cuts, NOT float quantiles: 0.1·n in binary floats can
  ceil one rank too high), per-bin share of "term-rich" docs (≥ 200
  distinct terms). The binned-conditional-probability read behind every
  calibration plot.
- greedy_source_cover: 3 unrolled steps of greedy maximum 5-gram
  SHINGLE coverage across sources — the submodular selection every
  "which sources do we keep?" decision approximates; each step is one
  pass over the materialized (source, shingle) pair table with the
  winners' shingles excluded in-bucket (never a driver-side set). The
  universe is shingles, not terms: every source spans the same word
  vocabulary here, which degenerates term cover to a single step.
- haar_energy_daily: unnormalized Haar wavelet energy decomposition of
  the dense daily count series (3 detail levels + the level-3
  approximation), zero-padded to a multiple of 8; Parseval-exact shares
  in ppm via 8·Σx² = 4·Σd₁² + 2·Σd₂² + Σd₃² + Σs₃².
- transition_entropy: conditional next-event-type entropy H(next|prev)
  over per-user consecutive transitions, in quantized micro-nats (the
  webqa ln rule: both engines compose the identical double from
  identical integers and quantize per cell before summation).
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from .engineops import _DAY_US
from .queries import _pd_arrow, _read
from .tsops import _exact_ranks

_WORD_RE = re.compile(r"[a-z]+")

_CAL_RICH_TERMS = 200
_COVER_STEPS = 3
_COVER_BUCKETS = 256


# ---------------------------------------------------------------------------
# calibration_bins
# ---------------------------------------------------------------------------


def calibration_bins(sf_dir: str):
    """Reliability table: docs binned into exact length deciles (bin =
    1 + Σ(n_chars > cut_k) over the 9 rank cuts at ceil(k·n/10)), with
    per-bin document count, count of term-rich docs (≥ 200 distinct
    terms) and the rich rate in ppm.

    Scale shape: cuts by exact distributed selection; the rich flag is a
    zero-shuffle map; the table is a bounded 10-key groupby."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    n = ds.count()
    ranks = [(k * n + 9) // 10 for k in range(1, 10)]
    cuts = _exact_ranks(ds, "n_chars", ranks)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        v = df["n_chars"].to_numpy(np.int64)
        b = np.ones(len(v), np.int64)
        for c in cuts:
            b += v > c
        rich = np.array(
            [len(set(_WORD_RE.findall((t or "").lower())))
             >= _CAL_RICH_TERMS for t in df["text"]], np.int64)
        return pd.DataFrame({"bin": b, "one": np.ones(len(v), np.int64),
                             "rich": rich})

    out = (
        ds.map_batches(_pd_arrow(flag), batch_format="pandas")
        .groupby("bin").aggregate(Sum("one", alias_name="n_docs"),
                                  Sum("rich", alias_name="n_rich"))
        .to_pandas().sort_values("bin").reset_index(drop=True)
    )
    out["rate_ppm"] = (out["n_rich"].astype("int64") * 1_000_000
                       // out["n_docs"].astype("int64"))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CALIBRATION_BINS = f"""
WITH r AS (
  SELECT n_chars,
         len(list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                                              '[a-z]+'))) AS nt
  FROM documents
), ranked AS (
  SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn FROM documents
), n AS (SELECT count(*) AS c FROM documents),
cuts AS (
  SELECT k, (SELECT n_chars FROM ranked
             WHERE rn = (k * (SELECT c FROM n) + 9) // 10) AS cut
  FROM (SELECT unnest(generate_series(1, 9)) AS k)
), binned AS (
  SELECT 1 + (SELECT count(*) FROM cuts WHERE r.n_chars > cut) AS bin,
         CASE WHEN nt >= {_CAL_RICH_TERMS} THEN 1 ELSE 0 END AS rich
  FROM r
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(rich) AS BIGINT) AS n_rich,
       CAST(sum(rich) * 1000000 // count(*) AS BIGINT) AS rate_ppm
FROM binned GROUP BY bin ORDER BY bin
"""


# ---------------------------------------------------------------------------
# greedy_source_cover
# ---------------------------------------------------------------------------


def greedy_source_cover(sf_dir: str):
    """Three unrolled steps of greedy maximum 5-gram shingle coverage:
    step 1 picks the source with the largest distinct-shingle set; each
    later step picks the source adding the most shingles not covered by
    the winners so far (ties to the lexicographically smaller source).
    Output: (step, source, gain, cum_covered).

    Scale shape: the (source, shingle) pair table folds block-locally
    and materializes once; each step is ONE shingle-bucketed pass where
    a shingle's source list decides in-bucket whether it is already
    covered — no driver-side shingle set ever forms (winners broadcast
    as names)."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        src_l, term_l = [], []
        for src, tx in zip(df["source"], df["text"]):
            ws = _WORD_RE.findall((tx or "").lower())
            hs = {int(hashlib.md5(" ".join(ws[k:k + 5]).encode())
                      .hexdigest()[:15], 16)
                  for k in range(len(ws) - 4)}
            for h in hs:
                src_l.append(src)
                term_l.append(h)
        p = pd.DataFrame({"source": src_l,
                          "term": pd.array(term_l, "int64")}) \
            .drop_duplicates()
        p["_kb"] = (p["term"].to_numpy(np.int64) & 255).astype(np.int64)
        return p

    pair_ds = ds.map_batches(_pd_arrow(pairs), batch_format="pandas") \
        .materialize()

    winners: list[str] = []
    rows = []
    cum = 0
    for step in range(1, _COVER_STEPS + 1):
        won = set(winners)

        def gains(g: pd.DataFrame, won=won) -> pd.DataFrame:
            d = g.drop_duplicates(["source", "term"])
            covered = d[d["source"].isin(won)]["term"].unique() \
                if won else []
            fresh = d[~d["term"].isin(covered)]
            out = fresh.groupby("source", sort=False).size() \
                .reset_index(name="gain")
            return out[~out["source"].isin(won)]

        per_src = (
            pair_ds.groupby("_kb")
            .map_groups(_pd_arrow(gains), batch_format="pandas")
            .groupby("source").sum("gain")
            .to_pandas()
        )
        per_src.columns = ["source", "gain"]
        per_src = per_src.sort_values(["gain", "source"],
                                      ascending=[False, True])
        w = per_src.iloc[0]
        winners.append(str(w["source"]))
        cum += int(w["gain"])
        rows.append((step, str(w["source"]), int(w["gain"]), cum))
    out = pd.DataFrame(rows, columns=["step", "source", "gain",
                                      "cum_covered"])
    for c in ("step", "gain", "cum_covered"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_GREEDY_SOURCE_COVER = """
WITH w AS (
  SELECT source,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), st AS (
  SELECT DISTINCT source, term
  FROM (SELECT source,
               unnest(list_transform(
                 generate_series(1, greatest(len(ws) - 4, 0)),
                 k -> CAST(('0x' || substr(md5(ws[k] || ' ' || ws[k+1] ||
                       ' ' || ws[k+2] || ' ' || ws[k+3] || ' ' || ws[k+4]),
                       1, 15)) AS BIGINT))) AS term
        FROM w)
), g1 AS (
  SELECT source, count(*) AS gain FROM st GROUP BY 1
), w1 AS (SELECT source, gain FROM g1 ORDER BY gain DESC, source LIMIT 1),
g2 AS (
  SELECT s.source, count(*) AS gain FROM st s
  WHERE s.source != (SELECT source FROM w1)
    AND NOT EXISTS (SELECT 1 FROM st c
                    WHERE c.source = (SELECT source FROM w1)
                      AND c.term = s.term)
  GROUP BY 1
), w2 AS (SELECT source, gain FROM g2 ORDER BY gain DESC, source LIMIT 1),
g3 AS (
  SELECT s.source, count(*) AS gain FROM st s
  WHERE s.source NOT IN ((SELECT source FROM w1), (SELECT source FROM w2))
    AND NOT EXISTS (SELECT 1 FROM st c
                    WHERE c.source IN ((SELECT source FROM w1),
                                       (SELECT source FROM w2))
                      AND c.term = s.term)
  GROUP BY 1
), w3 AS (SELECT source, gain FROM g3 ORDER BY gain DESC, source LIMIT 1)
SELECT CAST(step AS BIGINT) AS step, source, CAST(gain AS BIGINT) AS gain,
       CAST(sum(gain) OVER (ORDER BY step) AS BIGINT) AS cum_covered
FROM (
  SELECT 1 AS step, source, gain FROM w1
  UNION ALL SELECT 2, source, gain FROM w2
  UNION ALL SELECT 3, source, gain FROM w3
) ORDER BY step
"""


# ---------------------------------------------------------------------------
# haar_energy_daily
# ---------------------------------------------------------------------------


def haar_energy_daily(sf_dir: str):
    """Unnormalized Haar energy decomposition of the dense daily event
    counts, zero-padded to a multiple of 8: detail sums-of-squares at
    levels 1..3 plus the level-3 approximation, with Parseval-exact ppm
    shares from 8·Σx² = 4·Σd₁² + 2·Σd₂² + Σd₃² + Σs₃². Level 1 is
    day-to-day noise; level 3 is week-scale structure.

    Scale shape: days are bounded — one bounded groupby, then a
    vectorized 3-level transform over the day vector."""
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
    L = ((n + 7) // 8) * 8
    x = np.zeros(L, np.int64)
    x[daily["day"].to_numpy(np.int64) - lo] = daily["c"].to_numpy(np.int64)
    tot8 = 8 * int((x.astype(object) ** 2).sum())
    s = x
    rows = []
    for level in (1, 2, 3):
        d = s[0::2] - s[1::2]
        s = s[0::2] + s[1::2]
        ss = int((d.astype(object) ** 2).sum())
        scaled = (8 >> level) * ss
        rows.append((level, ss, scaled * 1_000_000 // tot8 if tot8 else 0))
    ss_a = int((s.astype(object) ** 2).sum())
    rows.append((0, ss_a, ss_a * 1_000_000 // tot8 if tot8 else 0))
    out = pd.DataFrame(rows, columns=["level", "sum_sq", "share_ppm"]) \
        .sort_values("level").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_HAAR_ENERGY_DAILY = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1
), lims AS (
  SELECT min(day) AS lo,
         ((max(day) - min(day) + 8) // 8) * 8 AS pl FROM daily
), spine AS (
  SELECT i AS idx FROM (SELECT unnest(generate_series(
    0, (SELECT pl FROM lims) - 1)) AS i)
), x AS (
  SELECT s.idx, coalesce(d.c, 0) AS v
  FROM spine s LEFT JOIN daily d
    ON d.day = (SELECT lo FROM lims) + s.idx
), tot AS (SELECT 8 * sum(v * v) AS t8 FROM x),
l1 AS (
  SELECT idx // 2 AS idx,
         sum(CASE WHEN idx % 2 = 0 THEN v ELSE -v END) AS d,
         sum(v) AS s
  FROM x GROUP BY 1
), l2 AS (
  SELECT idx // 2 AS idx,
         sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS d,
         sum(s) AS s
  FROM l1 GROUP BY 1
), l3 AS (
  SELECT idx // 2 AS idx,
         sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS d,
         sum(s) AS s
  FROM l2 GROUP BY 1
), e AS (
  SELECT 1 AS level, sum(d * d) AS ss, 4 * sum(d * d) AS scaled FROM l1
  UNION ALL
  SELECT 2, sum(d * d), 2 * sum(d * d) FROM l2
  UNION ALL
  SELECT 3, sum(d * d), sum(d * d) FROM l3
  UNION ALL
  SELECT 0, sum(s * s), sum(s * s) FROM l3
)
SELECT CAST(level AS BIGINT) AS level, CAST(ss AS BIGINT) AS sum_sq,
       CAST(CASE WHEN (SELECT t8 FROM tot) = 0 THEN 0
                 ELSE CAST(scaled AS HUGEINT) * 1000000
                      // (SELECT t8 FROM tot) END AS BIGINT) AS share_ppm
FROM e ORDER BY level
"""


# ---------------------------------------------------------------------------
# transition_entropy
# ---------------------------------------------------------------------------


def transition_entropy(sf_dir: str):
    """Conditional entropy H(next | prev) of the per-user event-type
    Markov chain, in quantized micro-nats: each transition cell (i, j)
    with count c_ij and row total c_i contributes
    floor(10^6 · c_ij · ln(c_i/c_ij) + 0.5); the cell contributions sum
    and divide by N — both engines compose the identical double from
    identical integers and quantize per cell (the webqa ln rule).

    Scale shape: transitions fold per user inside ONE user-bucketed
    shuffle; the cell matrix is bounded (|types|²); entropy folds on the
    bounded cell table."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            et = u["event_type"].to_numpy()[order]
            if len(et) < 2:
                continue
            outs.append(pd.DataFrame({"prev": et[:-1], "nxt": et[1:]}))
        if not outs:
            return pd.DataFrame({"prev": pd.Series([], dtype="object"),
                                 "nxt": pd.Series([], dtype="object")})
        return pd.concat(outs, ignore_index=True)

    cells = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(trans), batch_format="pandas")
        .groupby(["prev", "nxt"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    row_tot = cells.groupby("prev")["c"].sum()
    total = int(cells["c"].sum())
    contrib = 0
    for _, r in cells.iterrows():
        ci, cij = int(row_tot[r["prev"]]), int(r["c"])
        contrib += int(math.floor(1_000_000 * cij * math.log(ci / cij)
                                  + 0.5))
    out = pd.DataFrame({
        "n_transitions": [np.int64(total)],
        "n_cells": np.int64(len(cells)),
        "h_scaled": np.int64(contrib),
        "h_micro_nats": np.int64(contrib // total if total else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_TRANSITION_ENTROPY = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
), cells AS (
  SELECT prev, event_type AS nxt, count(*) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
), rows_ AS (
  SELECT prev, sum(c) AS ci FROM cells GROUP BY 1
), contrib AS (
  SELECT sum(CAST(floor(1000000 * cells.c
                        * ln(CAST(rows_.ci AS DOUBLE) / cells.c) + 0.5)
                  AS BIGINT)) AS h,
         sum(cells.c) AS n, count(*) AS k
  FROM cells JOIN rows_ USING (prev)
)
SELECT CAST(n AS BIGINT) AS n_transitions, CAST(k AS BIGINT) AS n_cells,
       CAST(h AS BIGINT) AS h_scaled,
       CAST(h // n AS BIGINT) AS h_micro_nats
FROM contrib
"""


MRAOPS_REGISTRY = {
    "calibration_bins": (calibration_bins, SQL_CALIBRATION_BINS),
    "greedy_source_cover": (greedy_source_cover, SQL_GREEDY_SOURCE_COVER),
    "haar_energy_daily": (haar_energy_daily, SQL_HAAR_ENERGY_DAILY),
    "transition_entropy": (transition_entropy, SQL_TRANSITION_ENTROPY),
}
