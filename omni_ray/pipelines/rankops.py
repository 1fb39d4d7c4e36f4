"""Operator batch 38 — rank correlation, hash-width QA, template
detection and the engine's own bucketing audited.

Reference anchors: none in the reference; these add:

- spearman_len_vocab: Spearman rank correlation between document length
  and distinct-term count — ranks assigned sort-free from the two
  bounded value-domain CDFs (min-rank convention), Pearson on ranks with
  exact integer moments and an exactly-corrected isqrt denominator.
- hash_collision_audit: birthday audit of truncated doc-id hashes — for
  16/24/32-bit md5 truncations, the EXACT colliding-pair count (Σ C(c,2)
  via a bucketed value census) against the birthday expectation
  C(n,2)/2^b — the "how many hash bits do I need?" read.
- source_common_prefix: the longest common prefix of every document in a
  source via the lexicographic MIN/MAX trick (the set's LCP equals the
  LCP of its lexicographic extremes) — template/boilerplate detection in
  two string aggregates, no pairwise scan.
- bucket_skew_audit: the engine's OWN partitioning audited — load
  spread of the user_id & 255 bucketing and of the md5-term % 256
  bucketing (max/mean load ppm, empty buckets) — the number that says
  whether the suite's one-shuffle folds are balanced.
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

from .queries import _pd_arrow, _read
from .tsops import _trunc_div

_WORD_RE = re.compile(r"[a-z]+")

_COLL_BITS = (16, 24, 32)
_SKEW_BUCKETS = 256


# ---------------------------------------------------------------------------
# spearman_len_vocab
# ---------------------------------------------------------------------------


def spearman_len_vocab(sf_dir: str):
    """Spearman rank correlation between n_chars and the distinct-term
    count, with min-ranks (rank = |strictly smaller| + 1, ties share)
    assigned from the two bounded value-domain CDFs — no global sort;
    rho_ppm = trunc(10⁶·C / isqrt(Vx·Vy)) on the exact integer rank
    moments.

    Scale shape: two bounded value histograms broadcast as rank maps;
    one zero-shuffle map emits per-block moment partials; one bounded
    aggregate folds them."""
    ds = _read(sf_dir, "documents", columns=["text", "n_chars"])

    def vals(t: pa.Table) -> pa.Table:
        nt = np.array([len(set(_WORD_RE.findall((x or "").lower())))
                       for x in t["text"].to_pylist()], np.int64)
        return pa.table({
            "len_v": pa.array(np.asarray(t["n_chars"].to_numpy(), np.int64)),
            "voc_v": pa.array(nt, pa.int64()),
        })

    vv = ds.map_batches(vals, batch_format="pyarrow").materialize()

    def rank_map(col: str) -> dict:
        hist = (vv.groupby(col).aggregate(Count(alias_name="c"))
                .to_pandas().sort_values(col))
        below = np.zeros(len(hist), np.int64)
        below[1:] = np.cumsum(hist["c"].to_numpy(np.int64))[:-1]
        return dict(zip(hist[col].tolist(), (below + 1).tolist()))

    rx, ry = rank_map("len_v"), rank_map("voc_v")

    def moments(t: pa.Table) -> pa.Table:
        x = np.array([rx[int(v)] for v in t["len_v"].to_numpy()],
                     dtype=object)
        y = np.array([ry[int(v)] for v in t["voc_v"].to_numpy()],
                     dtype=object)
        return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in {
            "n": len(x), "sx": sum(x), "sy": sum(y),
            "sxx": sum(v * v for v in x), "syy": sum(v * v for v in y),
            "sxy": sum(a * b for a, b in zip(x, y)),
        }.items()})

    m = vv.map_batches(moments, batch_format="pyarrow") \
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]) or {}
    n = int(m.get("n") or 0)
    sx, sy = int(m.get("sx") or 0), int(m.get("sy") or 0)
    sxx, syy = int(m.get("sxx") or 0), int(m.get("syy") or 0)
    sxy = int(m.get("sxy") or 0)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    den = math.isqrt(vx * vy)
    out = pd.DataFrame({
        "n_docs": [np.int64(n)],
        "rho_ppm": np.int64(_trunc_div(1_000_000 * cov, den) if den else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SPEARMAN_LEN_VOCAB = """
WITH v AS (
  SELECT n_chars AS len_v,
         len(list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                                              '[a-z]+'))) AS voc_v
  FROM documents
), r AS (
  SELECT CAST(rank() OVER (ORDER BY len_v) AS BIGINT) AS x,
         CAST(rank() OVER (ORDER BY voc_v) AS BIGINT) AS y
  FROM v
), m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM r
), parts AS (
  SELECT n, n * sxy - CAST(sx AS HUGEINT) * sy AS cov,
         (n * sxx - CAST(sx AS HUGEINT) * sx)
           * (n * syy - CAST(sy AS HUGEINT) * sy) AS pr
  FROM m
), fs AS (
  SELECT n, cov, pr,
         CAST(floor(sqrt(CAST(pr AS DOUBLE))) AS HUGEINT) AS f
  FROM parts
), isq AS (
  SELECT n, cov,
         f - (CASE WHEN f * f > pr THEN 1 ELSE 0 END)
           + (CASE WHEN (f + 1) * (f + 1) <= pr THEN 1 ELSE 0 END) AS den
  FROM fs
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(CASE WHEN den = 0 THEN 0
                 ELSE 1000000 * cov // den END AS BIGINT) AS rho_ppm
FROM isq
"""


# ---------------------------------------------------------------------------
# hash_collision_audit
# ---------------------------------------------------------------------------


def hash_collision_audit(sf_dir: str):
    """Birthday audit: md5(doc_id) truncated to 16/24/32 bits — the EXACT
    colliding-pair count Σ C(c,2) per width (via a bounded truncated-
    value census) against the birthday expectation C(n,2)//2^b. The
    "how many hash bits before collisions bite?" read.

    Scale shape: per-block truncated-hash rows fold through ONE bounded
    (bits, value) census (the 16-bit domain is 65k values; wider domains
    stay collision-sparse so the census is output-sized); pair counts
    fold per width."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n = ds.count()

    def trunc(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(), np.int64)
        hs = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:15],
                           16) for i in ids], np.int64)
        bits_l, val_l = [], []
        for b in _COLL_BITS:
            bits_l.append(np.full(len(hs), b, np.int64))
            val_l.append(hs >> (60 - b))
        return pa.table({
            "bits": pa.array(np.concatenate(bits_l), pa.int64()),
            "val": pa.array(np.concatenate(val_l), pa.int64()),
        })

    census = (
        ds.map_batches(trunc, batch_format="pyarrow")
        .groupby(["bits", "val"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    rows = []
    for b in _COLL_BITS:
        c = census.loc[census["bits"] == b, "c"].to_numpy(np.int64)
        pairs = int((c.astype(object) * (c.astype(object) - 1) // 2).sum())
        expect = (n * (n - 1) // 2) // (2 ** b)
        rows.append((b, pairs, expect))
    out = pd.DataFrame(rows, columns=["bits", "colliding_pairs",
                                      "expected_pairs"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _coll_sql() -> str:
    arms = " UNION ALL ".join(
        f"SELECT {b} AS bits, h >> (60 - {b}) AS val FROM h"
        for b in _COLL_BITS)
    return f"""
WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
), t AS ({arms}),
census AS (
  SELECT bits, val, count(*) AS c FROM t GROUP BY 1, 2
), n AS (SELECT count(*) AS nn FROM documents)
SELECT CAST(bits AS BIGINT) AS bits,
       CAST(sum(c * (c - 1) // 2) AS BIGINT) AS colliding_pairs,
       CAST(((SELECT nn FROM n) * ((SELECT nn FROM n) - 1) // 2)
            // (CAST(1 AS HUGEINT) << bits) AS BIGINT) AS expected_pairs
FROM census GROUP BY bits ORDER BY bits
"""


SQL_HASH_COLLISION_AUDIT = _coll_sql()


# ---------------------------------------------------------------------------
# source_common_prefix
# ---------------------------------------------------------------------------


def source_common_prefix(sf_dir: str):
    """Longest common prefix of ALL documents in each source, via the
    lexicographic-extremes identity: LCP(set) = LCP(min(set), max(set)).
    Two string aggregates replace a pairwise scan — template/boilerplate
    detection at corpus scale.

    Scale shape: per-block (source, min_text, max_text) partials fold in
    a bounded source groupby; the character compare runs on two strings
    per source."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def extremes(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(text=df["text"].fillna("")) \
            .groupby("source", sort=False)["text"].agg(["min", "max"]) \
            .reset_index()
        g.columns = ["source", "mn", "mx"]
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        mn, mx = g["mn"].min(), g["mx"].max()
        k = 0
        for a, b in zip(mn, mx):
            if a != b:
                break
            k += 1
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "lcp_len": np.int64(k),
        })

    return (
        ds.map_batches(_pd_arrow(extremes), batch_format="pandas")
        .groupby("source").map_groups(_pd_arrow(fold),
                                      batch_format="pandas")
        .sort("source")
    )


SQL_SOURCE_COMMON_PREFIX = """
WITH ex AS (
  SELECT source, min(coalesce(text, '')) AS mn,
         max(coalesce(text, '')) AS mx
  FROM documents GROUP BY 1
)
SELECT source,
       CAST(coalesce(
         list_min(list_filter(
           generate_series(1, least(len(mn), len(mx)) + 1),
           i -> i > least(len(mn), len(mx))
                OR substr(mn, i, 1) != substr(mx, i, 1))) - 1,
         least(len(mn), len(mx))) AS BIGINT) AS lcp_len
FROM ex ORDER BY source
"""


# ---------------------------------------------------------------------------
# bucket_skew_audit
# ---------------------------------------------------------------------------


def bucket_skew_audit(sf_dir: str):
    """The suite's own partitioning audited: for the user_id & 255
    bucketing of events and the md5-term % 256 bucketing of document
    term occurrences, the bucket-load spread — max and mean load, the
    max/mean ratio in ppm, and the empty-bucket count. The health check
    behind every "ONE bucketed shuffle" claim in this repo.

    Scale shape: both domains fold to bounded 256-bucket histograms via
    per-block partial counts."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def ubuckets(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"].to_numpy(), np.int64) & 255
        b, c = np.unique(u, return_counts=True)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    uh = (ev.map_batches(ubuckets, batch_format="pyarrow")
          .groupby("bucket").sum("c").to_pandas())
    uh.columns = ["bucket", "c"]

    docs = _read(sf_dir, "documents", columns=["text"])

    def tbuckets(t: pa.Table) -> pa.Table:
        counts = np.zeros(_SKEW_BUCKETS, np.int64)
        for x in t["text"].to_pylist():
            for w in _WORD_RE.findall((x or "").lower()):
                hb = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) \
                    % _SKEW_BUCKETS
                counts[hb] += 1
        nz = np.nonzero(counts)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "c": pa.array(counts[nz], pa.int64())})

    th = (docs.map_batches(tbuckets, batch_format="pyarrow")
          .groupby("bucket").sum("c").to_pandas())
    th.columns = ["bucket", "c"]

    rows = []
    for name, h in (("events_user_and255", uh), ("docs_md5term_mod256", th)):
        c = np.zeros(_SKEW_BUCKETS, np.int64)
        c[h["bucket"].to_numpy(np.int64)] = h["c"].to_numpy(np.int64)
        total = int(c.sum())
        mean_milli = total * 1000 // _SKEW_BUCKETS
        rows.append((name, total, int(c.max()), mean_milli,
                     int(c.max()) * 1_000_000 * 1000 // mean_milli
                     if mean_milli else 0,
                     int((c == 0).sum())))
    out = pd.DataFrame(rows, columns=["domain", "total_rows", "max_load",
                                      "mean_load_milli", "skew_ppm",
                                      "empty_buckets"])
    for c in ("total_rows", "max_load", "mean_load_milli", "skew_ppm",
              "empty_buckets"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_BUCKET_SKEW_AUDIT = f"""
WITH ub AS (
  SELECT user_id & 255 AS bucket, count(*) AS c FROM events GROUP BY 1
), tb AS (
  SELECT CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT)
           % {_SKEW_BUCKETS} AS bucket,
         count(*) AS c
  FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                         '[a-z]+')) AS term
        FROM documents)
  GROUP BY 1
), stats AS (
  SELECT 'events_user_and255' AS domain, sum(c) AS total, max(c) AS mx,
         count(*) AS nb
  FROM ub
  UNION ALL
  SELECT 'docs_md5term_mod256', sum(c), max(c), count(*) FROM tb
)
SELECT domain, CAST(total AS BIGINT) AS total_rows,
       CAST(mx AS BIGINT) AS max_load,
       CAST(total * 1000 // {_SKEW_BUCKETS} AS BIGINT) AS mean_load_milli,
       CAST(CASE WHEN total = 0 THEN 0
                 ELSE mx * 1000000 * 1000
                      // (total * 1000 // {_SKEW_BUCKETS}) END AS BIGINT)
         AS skew_ppm,
       CAST({_SKEW_BUCKETS} - nb AS BIGINT) AS empty_buckets
FROM stats ORDER BY domain
"""


RANKOPS_REGISTRY = {
    "spearman_len_vocab": (spearman_len_vocab, SQL_SPEARMAN_LEN_VOCAB),
    "hash_collision_audit": (hash_collision_audit, SQL_HASH_COLLISION_AUDIT),
    "source_common_prefix": (source_common_prefix, SQL_SOURCE_COMMON_PREFIX),
    "bucket_skew_audit": (bucket_skew_audit, SQL_BUCKET_SKEW_AUDIT),
}
