"""Operator batch 31 — distribution distance, budget apportionment,
lexical richness and dispersion.

Reference anchors: the reference allocates crawl effort uniformly
(`src/crawler/web_crawler.py` fixed per-feed limits) and reports raw
counts; these add the allocation and drift instruments:

- ks_length_drift: the two-sample Kolmogorov–Smirnov statistic between
  each source's n_chars distribution and the corpus's — the sup-norm
  companion to emd_length_drift's integral, exact in integer units of
  1/(n_s·n), with the arg-max value reported (smallest value on ties).
- quota_apportionment: largest-remainder (Hare quota) apportionment of
  10,000 crawl slots across sources by char volume — the exact integer
  answer to "how many fetch slots does each source deserve?", seats
  guaranteed to sum to the budget.
- hapax_rate_by_source: share of each source's vocabulary occurring
  exactly once (hapax legomena) — the classic lexical-richness gauge;
  low hapax ⇒ template/boilerplate-heavy source.
- burstiness_fano: the Fano factor (variance/mean) of each event type's
  dense daily count series in ppm — dispersion > 1 flags bursty arrival
  (integer-exact via n-scaled deviations: F = Σ(n·x−T)² / (n²·T);
  HUGEINT-safe in the oracle).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .engineops import _DAY_US
from .queries import _pd_arrow, _read

_WORD_RE = re.compile(r"[a-z]+")

_QUOTA_SLOTS = 10_000
_HAPAX_BUCKETS = 256


# ---------------------------------------------------------------------------
# ks_length_drift
# ---------------------------------------------------------------------------


def ks_length_drift(sf_dir: str):
    """Exact two-sample KS statistic per source vs the corpus over the
    n_chars value support: ks_scaled = max_v |cum_s(v)·n − cum(v)·n_s|
    (integer units 1/(n_s·n)), plus the smallest value attaining it.

    Scale shape: lengths are a bounded value domain — one bounded
    (source, n_chars) groupby; the per-source scan runs over the value
    histogram (the global_percentile CDF shape), never over rows."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    hist = (
        ds.groupby(["source", "n_chars"]).aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    support = np.sort(hist["n_chars"].unique())
    n_total = int(hist["cnt"].sum())
    glob = hist.groupby("n_chars")["cnt"].sum() \
        .reindex(support, fill_value=0).to_numpy(np.int64)
    cum_all = np.cumsum(glob)
    rows = []
    for src, g in hist.groupby("source"):
        cnt = g.set_index("n_chars")["cnt"] \
            .reindex(support, fill_value=0).to_numpy(np.int64)
        n_s = int(cnt.sum())
        diff = np.abs(np.cumsum(cnt) * n_total - cum_all * n_s)
        k = int(diff.argmax())  # first (= smallest value) max
        rows.append((src, n_s, int(diff[k]), int(support[k])))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "ks_scaled",
                                      "argmax_chars"]) \
        .sort_values("source").reset_index(drop=True)
    for c in ("n_docs", "ks_scaled", "argmax_chars"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_KS_LENGTH_DRIFT = """
WITH cells AS (
  SELECT source, n_chars, count(*) AS cnt FROM documents GROUP BY 1, 2
), support AS (SELECT DISTINCT n_chars FROM documents),
gcdf AS (SELECT n_chars, sum(cnt) AS g FROM cells GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM documents),
per_src AS (SELECT source, sum(cnt) AS n_s FROM cells GROUP BY 1),
spine AS (
  SELECT p.source, p.n_s, s.n_chars, coalesce(c.cnt, 0) AS cnt, g.g
  FROM per_src p CROSS JOIN support s
  JOIN gcdf g USING (n_chars)
  LEFT JOIN cells c ON c.source = p.source AND c.n_chars = s.n_chars
), cums AS (
  SELECT source, n_s, n_chars,
         abs(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars)
               * (SELECT n_total FROM tot)
             - sum(g) OVER (PARTITION BY source ORDER BY n_chars) * n_s)
           AS diff
  FROM spine
), ranked AS (
  SELECT source, n_s, n_chars, diff,
         row_number() OVER (PARTITION BY source
                            ORDER BY diff DESC, n_chars) AS rn
  FROM cums
)
SELECT source, CAST(n_s AS BIGINT) AS n_docs,
       CAST(diff AS BIGINT) AS ks_scaled,
       CAST(n_chars AS BIGINT) AS argmax_chars
FROM ranked WHERE rn = 1 ORDER BY source
"""


# ---------------------------------------------------------------------------
# quota_apportionment
# ---------------------------------------------------------------------------


def quota_apportionment(sf_dir: str):
    """Largest-remainder (Hare quota) apportionment of 10,000 crawl slots
    across sources, proportional to char volume: base = slots·chars //
    total, the leftover seats go to the largest remainders (ties to the
    lexicographically smaller source). Seats always sum to the budget.

    Scale shape: one bounded source groupby for the char volumes; the
    apportionment runs over the bounded source table."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    vol = (
        ds.groupby("source").aggregate(Sum("n_chars", alias_name="chars"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    total = int(vol["chars"].sum())
    q = vol["chars"].astype(object) * _QUOTA_SLOTS
    vol["base"] = (q // total).astype("int64")
    vol["rem"] = (q % total).astype("int64")
    leftover = _QUOTA_SLOTS - int(vol["base"].sum())
    order = vol.sort_values(["rem", "source"],
                            ascending=[False, True]).index[:leftover]
    vol["extra"] = 0
    vol.loc[order, "extra"] = 1
    vol["seats"] = vol["base"] + vol["extra"]
    out = vol[["source", "chars", "base", "extra", "seats"]]
    for c in ("chars", "base", "extra", "seats"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_QUOTA_APPORTIONMENT = f"""
WITH vol AS (
  SELECT source, sum(n_chars) AS chars FROM documents GROUP BY 1
), tot AS (SELECT sum(chars) AS t, count(*) AS k FROM vol),
q AS (
  SELECT source, chars,
         CAST(chars AS HUGEINT) * {_QUOTA_SLOTS} // (SELECT t FROM tot)
           AS base,
         CAST(chars AS HUGEINT) * {_QUOTA_SLOTS} % (SELECT t FROM tot)
           AS rem
  FROM vol
), lo AS (
  SELECT {_QUOTA_SLOTS} - sum(base) AS leftover FROM q
), ranked AS (
  SELECT source, chars, base, rem,
         row_number() OVER (ORDER BY rem DESC, source) AS rn
  FROM q
)
SELECT source, CAST(chars AS BIGINT) AS chars, CAST(base AS BIGINT) AS base,
       CAST(CASE WHEN rn <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END
            AS BIGINT) AS extra,
       CAST(base + CASE WHEN rn <= (SELECT leftover FROM lo)
                        THEN 1 ELSE 0 END AS BIGINT) AS seats
FROM ranked ORDER BY source
"""


# ---------------------------------------------------------------------------
# hapax_rate_by_source
# ---------------------------------------------------------------------------


def hapax_rate_by_source(sf_dir: str):
    """Lexical richness per source: distinct terms, hapax legomena (terms
    occurring exactly ONCE in the source, occurrence-counted) and the
    hapax share in ppm.

    Scale shape: (source, term) occurrence counts fold block-locally,
    then ONE term-bucketed shuffle (terms are row-sized) finishes the
    counts and emits bounded per-source partials; a bounded source
    groupby folds them."""
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
                    % _HAPAX_BUCKETS).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["source", "term"], sort=False)["n"].sum() \
            .reset_index()
        out = d.groupby("source", sort=False).agg(
            n_terms=("term", "size"),
            n_hapax=("n", lambda v: int((v == 1).sum()))).reset_index()
        return out

    out = (
        ds.map_batches(_pd_arrow(occ), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("source").aggregate(Sum("n_terms", alias_name="n_terms"),
                                     Sum("n_hapax", alias_name="n_hapax"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    out["hapax_ppm"] = (out["n_hapax"].astype("int64") * 1_000_000
                        // out["n_terms"].astype("int64"))
    for c in ("n_terms", "n_hapax", "hapax_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_HAPAX_RATE_BY_SOURCE = """
WITH occ AS (
  SELECT source, term, count(*) AS n
  FROM (SELECT source, unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z]+')) AS term
        FROM documents)
  GROUP BY 1, 2
), per_src AS (
  SELECT source, count(*) AS n_terms,
         sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS n_hapax
  FROM occ GROUP BY 1
)
SELECT source, CAST(n_terms AS BIGINT) AS n_terms,
       CAST(n_hapax AS BIGINT) AS n_hapax,
       CAST(n_hapax * 1000000 // n_terms AS BIGINT) AS hapax_ppm
FROM per_src ORDER BY source
"""


# ---------------------------------------------------------------------------
# burstiness_fano
# ---------------------------------------------------------------------------


def burstiness_fano(sf_dir: str):
    """Fano factor (variance/mean) of each event type's dense daily count
    series, in ppm: with deviations e = n·x − T over the global day
    range, F_ppm = 10^6 · Σe² // (n²·T). F ≈ 1e6 is Poisson-like; higher
    is bursty.

    Scale shape: (type, day) is a bounded domain — one bounded groupby,
    then a vectorized scan per type over the day table."""
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
        total = int(x.sum())
        e = (n * x - total).astype(object)
        s = int(sum(v * v for v in e))
        rows.append((etype, n, total,
                     1_000_000 * s // (n * n * total) if total else 0))
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "n_events",
                                      "fano_ppm"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in ("n_days", "n_events", "fano_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_BURSTINESS_FANO = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), lims AS (
  SELECT min(day) AS lo, max(day) AS hi,
         max(day) - min(day) + 1 AS n FROM d
), spine AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM lims),
                                            (SELECT hi FROM lims)))
              AS day) s
), dense AS (
  SELECT sp.event_type, sp.day, coalesce(d.c, 0) AS x
  FROM spine sp LEFT JOIN d
    ON d.event_type = sp.event_type AND d.day = sp.day
), tt AS (
  SELECT event_type, sum(x) AS total FROM dense GROUP BY 1
), dev AS (
  SELECT de.event_type,
         (SELECT n FROM lims) * de.x - tt.total AS e, tt.total
  FROM dense de JOIN tt USING (event_type)
)
SELECT event_type, CAST((SELECT n FROM lims) AS BIGINT) AS n_days,
       CAST(max(total) AS BIGINT) AS n_events,
       CAST(CASE WHEN max(total) = 0 THEN 0
                 ELSE CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) * 1000000
                      // ((SELECT n FROM lims) * (SELECT n FROM lims)
                          * max(total)) END AS BIGINT) AS fano_ppm
FROM dev GROUP BY event_type ORDER BY event_type
"""


ALLOCOPS_REGISTRY = {
    "ks_length_drift": (ks_length_drift, SQL_KS_LENGTH_DRIFT),
    "quota_apportionment": (quota_apportionment, SQL_QUOTA_APPORTIONMENT),
    "hapax_rate_by_source": (hapax_rate_by_source, SQL_HAPAX_RATE_BY_SOURCE),
    "burstiness_fano": (burstiness_fano, SQL_BURSTINESS_FANO),
}
