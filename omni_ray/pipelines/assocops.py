"""Operator batch 15 — association mining, fuzzy similarity join, keep-first
chunk dedup, quantile-sketch audit, Zipf rank profile.

Reference anchors: the reference's dedup surface is URL/content-hash only
(`src/storage/article_storage.py` content_hash) — the CCNet-style keep-first
chunk dedup, SymSpell fuzzy join and sketch audits extend the engine with the
operations a 100-TB training-data pipeline needs (prompt mandate), in the
same shapes as the existing batches:

- chunk_dedup_keepfirst: cross-document EXACT dedup of non-overlapping
  16-word chunks with keep-first semantics (CCNet, Wenzek et al. 2020 —
  paragraph-hash dedup keeps the first occurrence in corpus order).
  Distinct from ``dup_span_removal`` (overlapping 8-word windows,
  remove-ALL semantics): one explode pass → ONE bucketed shuffle keyed by
  chunk hash (per-hash min corpus position decides the keeper *inside the
  bucket*, so no join-back) → bounded per-source rollup.
- market_basket_pairs: co-purchase pair support/revenue over lineitem
  (Agrawal & Srikant 1994 flavour). Per-order pair explosion runs as a
  vectorized self-merge INSIDE hash buckets of l_orderkey (every line of an
  order lands in one bucket, so bucket partials are disjoint-order partial
  supports) → ``_bucketed_agg`` over the pair domain → per-block top-k
  prune → bounded global sort.
- quantile_sketch_audit: the bloom_fp_audit/cms_freq_audit pattern applied
  to QUANTILES — a two-leading-digit log-scale histogram (decimal analogue
  of an HDR histogram, all bucket math on integer-string prefixes so both
  engines agree exactly) gives p50/p90/p99 estimates; the exact audit
  computes true discrete quantiles from a value-count fold and reports the
  estimate error. The sketch is the deployable artifact (≤ ~500 cells at
  any scale); the exact audit is the test-scale witness.
- fuzzy_title_pairs: edit-distance-≤1 similarity SELF-JOIN via SymSpell
  deletion variants (Garbe 2012): two strings are within one edit iff they
  share a delete-1 variant, so candidate generation is an equality join on
  variant strings — one bucketed shuffle, exact Levenshtein verify inside
  the bucket, global pair-distinct via ``_bucketed_agg``. Planted typo
  rows (id offset = next power of ten above max doc_id, the ADVICE-r2
  collision-free construction) guarantee non-trivial matches at every sf.
- zipf_rank_mass: per-source term rank-frequency profile — term counts via
  ``_bucketed_agg`` (row-sized domain rule), per-source rank assignment in
  a bounded map_groups (sources are a bounded domain; vocabulary is
  sublinear in corpus size), mass folded into floor(log2(rank)) buckets
  computed with bit_length (integer-exact in both engines via bin()).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .mlqueries import _docs
from .queries import _block_topk, _bucketed_agg, _pd_arrow, _read

_WORD = re.compile(r"[a-z]+")

CHUNK_W = 16          # words per non-overlapping dedup chunk
_POS_BITS = 20        # chunk_idx < 2^20 → ordkey = doc_id·2^20 + idx


# ---------------------------------------------------------------------------
# chunk_dedup_keepfirst
# ---------------------------------------------------------------------------


def chunk_dedup_keepfirst(sf_dir: str):
    """documents → per-source (chunks_total, chunks_removed) under CCNet
    keep-first exact chunk dedup: a 16-word non-overlapping chunk is removed
    iff an identical chunk occurs earlier in corpus order (doc_id, idx).

    Scale shape: the explode emits one 16-byte digest row per chunk (~n_words
    / 16 rows, never chunk text); ONE hash-bucketed shuffle groups equal
    digests, the keeper is decided per group by min ordkey with a vectorized
    transform, and only ≤ n_buckets × n_sources partial rows reach the final
    bounded rollup."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def explode(t: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        hs, oks, srcs = [], [], []
        for did, x, src in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist(),
            t["source"].to_pylist(),
        ):
            ws = (x or "").split(" ")  # mirrors SQL string_split(text, ' ')
            for i in range(len(ws) // CHUNK_W):
                chunk = " ".join(ws[i * CHUNK_W:(i + 1) * CHUNK_W])
                hs.append(md5(chunk.encode()).digest())
                oks.append((int(did) << _POS_BITS) | i)
                srcs.append(src)
        return pa.table({
            "h": pa.array(hs, pa.binary()),
            "ordkey": pa.array(oks, pa.int64()),
            "source": pa.array(srcs, pa.string()),
        })

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_kb"] = (pd.util.hash_array(df["h"].to_numpy()) % 256).astype(np.int64)
        return df

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keep = g["ordkey"] == g.groupby("h")["ordkey"].transform("min")
        out = pd.DataFrame({
            "source": g["source"],
            "one": np.int64(1),
            "rem": (~keep).to_numpy().astype(np.int64),
        })
        return out.groupby("source", as_index=False).sum().rename(
            columns={"one": "chunks_total", "rem": "chunks_removed"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("source", as_index=False)[
            ["chunks_total", "chunks_removed"]].sum()

    rows = docs.map_batches(explode, batch_format="pyarrow")
    partial = (
        rows.map_batches(_pd_arrow(bucket), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(in_bucket), batch_format="pandas")
    )
    out = (
        partial.groupby("source")
        .map_groups(_pd_arrow(final), batch_format="pandas")
        .sort("source")
    )
    return out


SQL_CHUNK_DEDUP_KEEPFIRST = r"""
WITH toks AS (
  SELECT doc_id, source, string_split(coalesce(text, ''), ' ') AS w
  FROM documents
), chunks AS (
  SELECT doc_id, source, i AS chunk_idx,
         array_to_string(w[(i*16+1):(i*16+16)], ' ') AS ch
  FROM toks, unnest(range(0, CAST(floor(len(w) / 16) AS BIGINT))) AS t(i)
), marked AS (
  SELECT source,
         (doc_id * 1048576 + chunk_idx) >
           min(doc_id * 1048576 + chunk_idx) OVER (PARTITION BY ch) AS removed
  FROM chunks
)
SELECT source,
       count(*) AS chunks_total,
       CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS chunks_removed
FROM marked GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# market_basket_pairs
# ---------------------------------------------------------------------------


def market_basket_pairs(sf_dir: str):
    """Top-25 co-purchased part pairs by (support DESC, part_a, part_b) with
    pair revenue in cents.

    Scale shape: lines pre-reduce to one (order, part, cents) row, the pair
    explosion is a vectorized pandas self-merge INSIDE l_orderkey hash
    buckets (orders never straddle buckets → per-bucket pair counts are
    partial supports over disjoint order sets), pair partials fold through
    ``_bucketed_agg`` over the row-sized pair domain, and the top-25 is a
    per-block prune + bounded sort — no all-pairs stage ever materializes."""
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "ok": t["l_orderkey"],
            "pk": t["l_partkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                t["l_extendedprice"], 100.0)), pa.int64()),
            "_kb": pc.bit_wise_and(t["l_orderkey"], 255),
        })

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lp = g.groupby(["ok", "pk"], as_index=False)["cents"].sum()
        m = lp.merge(lp, on="ok", suffixes=("_a", "_b"))
        m = m[m["pk_a"] < m["pk_b"]]
        m["rev"] = m["cents_a"] + m["cents_b"]
        out = m.groupby(["pk_a", "pk_b"], as_index=False).agg(
            support=("ok", "size"), revenue_c=("rev", "sum"))
        return out

    partial = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(_pd_arrow(pairs_in_bucket), batch_format="pandas")
    )
    agg = _bucketed_agg(
        partial, ["pk_a", "pk_b"],
        {"support": ("support", "sum"), "revenue_c": ("revenue_c", "sum")},
    )
    keys, desc = ["support", "pk_a", "pk_b"], [True, False, False]
    top = (
        agg.map_batches(_block_topk(keys, desc, 25), batch_format="pyarrow")
        .sort(keys, descending=desc)
        .limit(25)
        .to_pandas()
    )
    top = top.rename(columns={"pk_a": "part_a", "pk_b": "part_b"})
    return pa.Table.from_pandas(
        top[["part_a", "part_b", "support", "revenue_c"]],
        preserve_index=False).replace_schema_metadata(None)


SQL_MARKET_BASKET_PAIRS = """
WITH lp AS (
  SELECT l_orderkey AS ok, l_partkey AS pk,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1, 2
)
SELECT a.pk AS part_a, b.pk AS part_b,
       count(*) AS support,
       CAST(sum(a.cents + b.cents) AS BIGINT) AS revenue_c
FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
GROUP BY 1, 2
ORDER BY support DESC, part_a, part_b
LIMIT 25
"""


# ---------------------------------------------------------------------------
# quantile_sketch_audit
# ---------------------------------------------------------------------------

_QS_QUANTILES = (50, 90, 99)


def _lead2_lo(v: int) -> int:
    s = str(v)
    return int(s[:2] + "0" * max(len(s) - 2, 0))


def quantile_sketch_audit(sf_dir: str):
    """events.value (cents, ≥1) → (q, est_lo, exact_v, err) for p50/p90/p99.

    The SKETCH: a two-leading-digit log-scale histogram (≤ 90 cells per
    decimal decade — an HDR-histogram analogue whose bucket function is
    integer-string arithmetic, so Ray and DuckDB agree bit-for-bit). The
    estimate for quantile q is the smallest bucket lower edge whose
    cumulative count reaches ceil(q·N/100). The AUDIT: exact discrete
    quantiles from a distinct-value count fold (bounded by the value
    domain, the cms_freq_audit exact-side pattern); err = exact − estimate
    is the deployable sketch-error witness."""
    ev = _read(sf_dir, "events", columns=["value"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table({"v": pc.filter(c, pc.greater_equal(c, 1))})

    vals = ev.map_batches(cents, batch_format="pyarrow")
    counts = _bucketed_agg(
        vals.map_batches(
            lambda t: pa.table({"v": t["v"],
                                "n": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["v"], {"n": ("n", "sum")},
    )
    # bounded collect: one row per DISTINCT cents value (domain-bounded)
    vc = counts.to_pandas().sort_values("v").reset_index(drop=True)
    n = int(vc["n"].sum())
    cum = vc["n"].cumsum()

    hist = vc.assign(lo=[_lead2_lo(int(v)) for v in vc["v"]])
    hist = hist.groupby("lo", as_index=False)["n"].sum().sort_values("lo")
    hcum = hist["n"].cumsum()

    rows = []
    for q in _QS_QUANTILES:
        rank = -(-q * n // 100)  # ceil(q*N/100)
        exact = int(vc["v"][cum >= rank].iloc[0])
        est = int(hist["lo"][hcum >= rank].iloc[0])
        rows.append((q, est, exact, exact - est))
    return pa.table({
        "q": pa.array([r[0] for r in rows], pa.int64()),
        "est_lo": pa.array([r[1] for r in rows], pa.int64()),
        "exact_v": pa.array([r[2] for r in rows], pa.int64()),
        "err": pa.array([r[3] for r in rows], pa.int64()),
    })


SQL_QUANTILE_SKETCH_AUDIT = r"""
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
  WHERE CAST(round(value * 100) AS BIGINT) >= 1
), n AS (SELECT count(*) AS n FROM v),
qs AS (SELECT unnest([50, 90, 99]) AS q),
ranks AS (
  SELECT q, CAST(ceil(q * n.n / 100.0) AS BIGINT) AS rnk FROM qs, n
), vc AS (
  SELECT v, count(*) AS c FROM v GROUP BY v
), vcum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vc
), hist AS (
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 2) ||
              repeat('0', greatest(length(CAST(v AS VARCHAR)) - 2, 0))
              AS BIGINT) AS lo,
         count(*) AS c
  FROM v GROUP BY 1
), hcum AS (
  SELECT lo, sum(c) OVER (ORDER BY lo) AS cum FROM hist
)
SELECT r.q,
       (SELECT min(lo) FROM hcum WHERE cum >= r.rnk) AS est_lo,
       (SELECT min(v) FROM vcum WHERE cum >= r.rnk) AS exact_v,
       (SELECT min(v) FROM vcum WHERE cum >= r.rnk)
         - (SELECT min(lo) FROM hcum WHERE cum >= r.rnk) AS err
FROM ranks r ORDER BY r.q
"""


# ---------------------------------------------------------------------------
# fuzzy_title_pairs
# ---------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        bj = b[j - 1]
        for i in range(1, la + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + (a[i - 1] != bj))
        prev = cur
    return prev[la]


def _title_rows(t: pa.Table, offset: int):
    """(id, title) rows: base titles (first 5 words) + planted distance-1
    typo variants at id + offset for doc_id % 7 == 0 (collision-free offset
    derived from the id domain, per the ADVICE-r2 rule)."""
    ids, titles = [], []
    for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = (x or "").split(" ")
        title = " ".join(ws[:5])
        if len(title) < 3:
            continue
        ids.append(int(did))
        titles.append(title)
        if did % 7 == 0:
            p = did % len(title)
            ids.append(int(did) + offset)
            titles.append(title[:p] + title[p + 1:])
    return ids, titles


def _id_offset(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    import os
    path = os.path.join(sf_dir, "documents.parquet")
    mx = int(pq.read_table(path, columns=["doc_id"])["doc_id"].to_numpy().max())
    off = 10
    while off <= mx:
        off *= 10
    return off


def fuzzy_title_pairs(sf_dir: str):
    """Edit-distance-≤1 title self-join → (id_a, id_b, dist), id_a < id_b.

    SymSpell shape: each title explodes into its delete-1 variants (plus
    itself); any two strings within one edit share a variant, so candidates
    come from ONE equality-keyed bucketed shuffle on the variant string —
    never an all-pairs scan. Exact Levenshtein verifies inside the bucket;
    a second ``_bucketed_agg`` over the pair domain dedups pairs found via
    multiple variants. Both engines run the SAME construction (variants in
    SQL via unnest(range) + substr), so the oracle is exact, and planted
    typo rows keep the answer non-trivial at every sf."""
    docs = _docs(sf_dir)
    off = _id_offset(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        ids, titles = _title_rows(t, off)
        v_ids, v_titles, v_vars = [], [], []
        for i, title in zip(ids, titles):
            v_ids.append(i)
            v_titles.append(title)
            v_vars.append(title)
            for p in range(len(title)):
                v_ids.append(i)
                v_titles.append(title)
                v_vars.append(title[:p] + title[p + 1:])
        return pa.table({
            "id": pa.array(v_ids, pa.int64()),
            "title": pa.array(v_titles, pa.string()),
            "var": pa.array(v_vars, pa.string()),
        })

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_kb"] = (pd.util.hash_array(df["var"].to_numpy()) % 256).astype(np.int64)
        return df

    def verify_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["id", "var"])
        m = g.merge(g, on="var", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]].drop_duplicates(["id_a", "id_b"])
        if not len(m):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64")})
        d = [_levenshtein(a, b)
             for a, b in zip(m["title_a"], m["title_b"])]
        m = m.assign(dist=np.asarray(d, np.int64))
        m = m[m["dist"] <= 1]
        return m[["id_a", "id_b", "dist"]]

    cands = (
        docs.map_batches(explode, batch_format="pyarrow")
        .map_batches(_pd_arrow(bucket), batch_format="pandas")
        .groupby("_kb")
        .map_groups(_pd_arrow(verify_in_bucket), batch_format="pandas")
    )
    out = _bucketed_agg(cands, ["id_a", "id_b"], {"dist": ("dist", "min")})
    return out.sort(["id_a", "id_b"])


SQL_FUZZY_TITLE_PAIRS = r"""
WITH off AS (
  SELECT CAST(pow(10, floor(log10(max(doc_id))) + 1) AS BIGINT) AS o
  FROM documents
), base AS (
  SELECT doc_id AS id,
         array_to_string((string_split(coalesce(text, ''), ' '))[1:5], ' ')
           AS title
  FROM documents
), base_f AS (
  SELECT * FROM base WHERE length(title) >= 3
), planted AS (
  SELECT b.id + off.o AS id,
         substr(title, 1, b.id % length(title)) ||
         substr(title, b.id % length(title) + 2) AS title
  FROM base_f b, off WHERE b.id % 7 = 0
), titles AS (
  SELECT * FROM base_f UNION ALL SELECT * FROM planted
), variants AS (
  SELECT id, title,
         CASE WHEN p = 0 THEN title
              ELSE substr(title, 1, p - 1) || substr(title, p + 1) END AS var
  FROM titles, unnest(range(0, CAST(length(title) AS BIGINT) + 1)) AS t(p)
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.title AS ta, b.title AS tb
  FROM variants a JOIN variants b ON a.var = b.var AND a.id < b.id
)
SELECT id_a, id_b, CAST(min(levenshtein(ta, tb)) AS BIGINT) AS dist
FROM cand
WHERE levenshtein(ta, tb) <= 1
GROUP BY id_a, id_b
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# zipf_rank_mass
# ---------------------------------------------------------------------------


def zipf_rank_mass(sf_dir: str):
    """Per-source Zipf profile: terms ranked by (count DESC, term) fold into
    floor(log2(rank)) buckets → (source, rank_bucket, n_terms, mass).

    Scale shape: term counts go through ``_bucketed_agg`` (row-sized term
    domain); the rank pass is a per-SOURCE map_groups — sources are a
    bounded domain and per-source vocabulary is sublinear in corpus size,
    the same bounded-rank assumption ``tfidf_top_terms`` documents. Bucket
    index uses bit_length (== length(bin(r)) - 1 in DuckDB), integer-exact
    in both engines."""
    docs = _read(sf_dir, "documents", columns=["text", "source"])

    def term_rows(t: pa.Table) -> pa.Table:
        srcs, terms = [], []
        for x, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
            for w in _WORD.findall((x or "").lower()):
                srcs.append(src)
                terms.append(w)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "term": pa.array(terms, pa.string()),
            "n": pa.array(np.ones(len(terms), np.int64)),
        })

    counts = _bucketed_agg(
        docs.map_batches(term_rows, batch_format="pyarrow"),
        ["source", "term"], {"cnt": ("n", "sum")},
    )

    def rank_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "term"], ascending=[False, True])
        rank = np.arange(1, len(g) + 1)
        bucket = np.array([int(r).bit_length() - 1 for r in rank], np.int64)
        out = pd.DataFrame({
            "source": g["source"].to_numpy(),
            "rank_bucket": bucket,
            "one": np.int64(1),
            "cnt": g["cnt"].to_numpy(),
        })
        return out.groupby(["source", "rank_bucket"], as_index=False).agg(
            n_terms=("one", "sum"), mass=("cnt", "sum"))

    out = (
        counts.groupby("source")
        .map_groups(_pd_arrow(rank_fold), batch_format="pandas")
        .sort(["source", "rank_bucket"])
    )
    return out


SQL_ZIPF_RANK_MASS = r"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
           AS term
  FROM documents
), counts AS (
  SELECT source, term, count(*) AS cnt FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT source, cnt,
         row_number() OVER (PARTITION BY source
                            ORDER BY cnt DESC, term) AS rnk
  FROM counts
)
SELECT source,
       CAST(length(ltrim(bin(rnk), '0')) - 1 AS BIGINT) AS rank_bucket,
       count(*) AS n_terms,
       CAST(sum(cnt) AS BIGINT) AS mass
FROM ranked
GROUP BY 1, 2 ORDER BY source, rank_bucket
"""


ASSOCOPS_REGISTRY = {
    "chunk_dedup_keepfirst": (chunk_dedup_keepfirst, SQL_CHUNK_DEDUP_KEEPFIRST),
    "market_basket_pairs": (market_basket_pairs, SQL_MARKET_BASKET_PAIRS),
    "quantile_sketch_audit": (quantile_sketch_audit, SQL_QUANTILE_SKETCH_AUDIT),
    "fuzzy_title_pairs": (fuzzy_title_pairs, SQL_FUZZY_TITLE_PAIRS),
    "zipf_rank_mass": (zipf_rank_mass, SQL_ZIPF_RANK_MASS),
}
