"""Operator batch 26 — fingerprint sketches, index-layout planning and
exact streaming order statistics.

Reference anchors: the reference's only fingerprints are whole-document
md5s (`src/processors/content_enhancement.py` content_hash) and its only
index is whatever Elasticsearch builds server-side; these add the
local-similarity and index-planning instruments a 100-TB corpus needs:

- winnowing_fingerprints: MOSS-style winnowing (Schleimer/Wilkerson/
  Aiken, SIGMOD'03) — per-window rightmost-minimum selection over word
  3-gram hashes, the guarantee-backed local fingerprint for partial-copy
  detection (contrast fingerprint_pairs' plain rolling hash).
- postings_gap_stats: delta-gap bit-cost census of the top-df posting
  lists — the number an index-compression (varint/PFOR) planner reads
  before choosing an encoding.
- running_median_per_user: exact prefix (lower) median of purchase cents
  per user — the order-statistic companion to ema_final_per_user's
  recurrence.
- vocab_growth_curve: Heaps'-law census (distinct terms and token volume
  at each corpus-prefix decile) with the decile cuts found by exact
  distributed selection (histogram → pinpoint bins → refine), not a sort.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min

from .queries import _pd_arrow, _read

_WORD_RE = re.compile(r"[a-z]+")

_WIN_W = 4  # winnowing window (over 3-gram hashes => guarantee t = w+2)


# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------


def winnowing_fingerprints(sf_dir: str):
    """MOSS winnowing per document: 60-bit md5 hashes of word 3-grams, a
    length-4 sliding window, the RIGHTMOST minimal hash selected per
    window (the paper's tie rule); reports per-doc gram count, selected
    positions, distinct fingerprints and the minimum fingerprint (the
    doc's stable 1-value sketch). Docs with <3 words have no grams and
    are excluded on both engines.

    Scale shape: embarrassingly parallel — one map over the corpus, no
    shuffle; the window-min is a vectorized stride-view reduction, not a
    per-window loop."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = {k: [] for k in ("doc_id", "n_grams", "n_selected",
                               "n_distinct_fp", "min_fp")}
        for did, tx in zip(ids, texts):
            ws = _WORD_RE.findall((tx or "").lower())
            if len(ws) < 3:
                continue
            hs = np.array(
                [int(hashlib.md5(
                    f"{ws[i]} {ws[i + 1]} {ws[i + 2]}".encode()
                 ).hexdigest()[:15], 16) for i in range(len(ws) - 2)],
                dtype=np.int64)
            n = len(hs)
            if n <= _WIN_W:
                pos = np.array([n - 1 - int(np.argmax((hs == hs.min())[::-1]))])
            else:
                win = np.lib.stride_tricks.sliding_window_view(hs, _WIN_W)
                m = win.min(axis=1)
                # argmax of the reversed equality mask = rightmost min
                idx = _WIN_W - 1 - np.argmax(win[:, ::-1] == m[:, None],
                                             axis=1)
                pos = np.unique(np.arange(len(win)) + idx)
            sel = hs[pos]
            out["doc_id"].append(did)
            out["n_grams"].append(n)
            out["n_selected"].append(len(pos))
            out["n_distinct_fp"].append(len(np.unique(sel)))
            out["min_fp"].append(int(sel.min()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return ds.map_batches(fp, batch_format="pyarrow").sort("doc_id")


SQL_WINNOWING_FINGERPRINTS = f"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), h AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ws) - 2),
           i -> CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' ||
                                         ws[i+2]), 1, 15)) AS BIGINT)) AS hs
  FROM w WHERE len(ws) >= 3
), sel AS (
  SELECT doc_id, hs,
         CASE WHEN len(hs) <= {_WIN_W}
              THEN [len(hs) + 1 - list_position(list_reverse(hs),
                                                list_min(hs))]
              ELSE list_distinct(list_transform(
                     generate_series(1, len(hs) - {_WIN_W - 1}),
                     j -> j + {_WIN_W} - list_position(
                            list_reverse(hs[j:j + {_WIN_W - 1}]),
                            list_min(hs[j:j + {_WIN_W - 1}]))))
         END AS ps
  FROM h
)
SELECT doc_id,
       CAST(len(hs) AS BIGINT) AS n_grams,
       CAST(len(ps) AS BIGINT) AS n_selected,
       CAST(len(list_distinct(list_transform(ps, p -> hs[p])))
            AS BIGINT) AS n_distinct_fp,
       CAST(list_min(list_transform(ps, p -> hs[p])) AS BIGINT) AS min_fp
FROM sel ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# postings_gap_stats
# ---------------------------------------------------------------------------

_PGS_TOP = 20
_PGS_BUCKETS = 256


def postings_gap_stats(sf_dir: str):
    """Delta-gap census of the top-20-df posting lists: per term, the
    document frequency, the summed bit cost of the doc-id gaps
    (bit_length per gap — what a varint/PFOR encoder pays), the maximum
    gap and the first posting. The read an index-compression planner
    does before choosing an encoding.

    Scale shape: pass 1 — block-local distinct (term, doc) pairs fold
    into per-term dfs inside ONE term-bucketed shuffle (terms are a
    row-sized domain: bucketed, never groupby-per-key), each bucket
    prunes to its top-20 so the driver folds ≤ buckets×20 rows; pass 2 —
    only the 20 winners' postings (a broadcast set filter) flow through
    a bounded 20-key groupby for the exact gap scan."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        term_l: list = []
        doc_l: list = []
        for did, tx in zip(df["doc_id"], df["text"]):
            for wd in set(_WORD_RE.findall((tx or "").lower())):
                term_l.append(wd)
                doc_l.append(did)
        p = pd.DataFrame({"term": term_l, "doc_id": doc_l})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _PGS_BUCKETS).astype(np.int64)
        return p

    def bucket_df(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["term", "doc_id"])
        cnt = d.groupby("term", sort=False).size().reset_index(name="df")
        return cnt.sort_values(["df", "term"], ascending=[False, True]) \
            .head(_PGS_TOP)

    pair_ds = ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
    top = (
        pair_ds.groupby("_kb")
        .map_groups(_pd_arrow(bucket_df), batch_format="pandas")
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])
        .head(_PGS_TOP)
    )
    sel = set(top["term"])

    def posts(df: pd.DataFrame) -> pd.DataFrame:
        term_l: list = []
        doc_l: list = []
        for did, tx in zip(df["doc_id"], df["text"]):
            for wd in set(_WORD_RE.findall((tx or "").lower())) & sel:
                term_l.append(wd)
                doc_l.append(did)
        return pd.DataFrame({"term": term_l, "doc_id": doc_l})

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["doc_id"].to_numpy(np.int64))
        gp = np.diff(d)
        bits = (np.frexp(gp.astype(np.float64))[1].astype(np.int64)
                if len(gp) else np.zeros(0, np.int64))
        return pd.DataFrame({
            "term": [g["term"].iloc[0]],
            "df": np.int64(len(d)),
            "gap_bits": np.int64(bits.sum()),
            "max_gap": np.int64(gp.max() if len(gp) else 0),
            "first_doc": np.int64(d[0]),
        })

    out = (
        ds.map_batches(_pd_arrow(posts), batch_format="pandas")
        .groupby("term").map_groups(_pd_arrow(gaps), batch_format="pandas")
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_POSTINGS_GAP_STATS = f"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), t AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(ws) AS term FROM w)
), dfs AS (
  SELECT term, count(*) AS df FROM t GROUP BY term
), top AS (
  SELECT term FROM dfs ORDER BY df DESC, term LIMIT {_PGS_TOP}
), g AS (
  SELECT t.term, t.doc_id,
         t.doc_id - lag(t.doc_id) OVER (PARTITION BY t.term
                                        ORDER BY t.doc_id) AS gap
  FROM t JOIN top USING (term)
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(coalesce(sum(CASE WHEN gap IS NULL THEN 0
                               ELSE length(bin(gap)) END), 0)
            AS BIGINT) AS gap_bits,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM g GROUP BY term ORDER BY df DESC, term
"""


# ---------------------------------------------------------------------------
# running_median_per_user
# ---------------------------------------------------------------------------


def running_median_per_user(sf_dir: str):
    """Exact running LOWER median (type-1: sorted[(n-1)//2]) of purchase
    cents per user, in (ts, event_id) arrival order — the order-statistic
    streaming read EMA/moving-sum cannot give.

    Scale shape: ONE user-bucketed shuffle co-locates each user's
    purchases; prefix medians are computed per user over event counts
    bounded by per-user activity, never globally."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        cents = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({
            "event_id": t["event_id"],
            "us": pc.cast(t["ts"], pa.int64()),
            "user_id": t["user_id"],
            "cents": pa.array(cents, pa.int64()),
            "_kb": pc.bit_wise_and(t["user_id"], 255),
        })

    def meds(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid, u in g.groupby("user_id"):
            order = np.lexsort((u["event_id"].to_numpy(np.int64),
                                u["us"].to_numpy(np.int64)))
            c = u["cents"].to_numpy(np.int64)[order]
            eid = u["event_id"].to_numpy(np.int64)[order]
            rm = np.empty(len(c), np.int64)
            for i in range(len(c)):
                rm[i] = np.partition(c[:i + 1], i // 2)[i // 2]
            outs.append(pd.DataFrame({
                "user_id": np.int64(uid), "event_id": eid,
                "cents": c, "run_median": rm,
            }))
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame({
            "user_id": pd.Series([], "int64"),
            "event_id": pd.Series([], "int64"),
            "cents": pd.Series([], "int64"),
            "run_median": pd.Series([], "int64")})

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_kb").map_groups(_pd_arrow(meds), batch_format="pandas")
        .sort("event_id")
    )


SQL_RUNNING_MEDIAN_PER_USER = """
WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id, cents,
       CAST(quantile_disc(cents, 0.5) OVER (
              PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS run_median
FROM p ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# vocab_growth_curve
# ---------------------------------------------------------------------------

_VGC_BINS = 1024
_VGC_DECILES = 10


def _exact_doc_id_cuts(ds, lo: int, hi: int, n: int) -> np.ndarray:
    """Exact type-1 order statistics of doc_id at ranks ceil(k*n/10),
    k = 1..10, WITHOUT a global sort: one bounded equal-width histogram
    locates the bin holding each rank; a second filtered pass collects
    only those bins' values (≈ n/bins rows each) for the driver to
    refine. The standard distributed exact-selection shape."""
    width = max(1, (hi - lo + _VGC_BINS) // _VGC_BINS)

    def binit(t: pa.Table) -> pa.Table:
        b = (t["doc_id"].to_numpy() - lo) // width
        return pa.table({"bin": pa.array(b, pa.int64())})

    hist = (
        ds.map_batches(binit, batch_format="pyarrow")
        .groupby("bin").aggregate(Count(alias_name="cnt"))
        .to_pandas().sort_values("bin")
    )
    bins = hist["bin"].to_numpy(np.int64)
    cnts = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnts)
    ranks = np.array([(k * n + _VGC_DECILES - 1) // _VGC_DECILES
                      for k in range(1, _VGC_DECILES + 1)], np.int64)
    bin_idx = np.searchsorted(cum, ranks, side="left")
    need = set(bins[bin_idx].tolist())

    def pick(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy()
        m = np.isin((v - lo) // width, list(need))
        return pa.table({"doc_id": pa.array(v[m], pa.int64())})

    picked = np.sort(
        ds.map_batches(pick, batch_format="pyarrow")
        .to_pandas()["doc_id"].to_numpy(np.int64))
    cuts = np.empty(_VGC_DECILES, np.int64)
    for i, (r, bi) in enumerate(zip(ranks, bin_idx)):
        below = int(cum[bi - 1]) if bi > 0 else 0  # rows in bins before it
        inbin = picked[(picked - lo) // width == bins[bi]]
        # rows picked from EARLIER needed bins sort first; index within
        # this bin is rank - rows-below-bin
        cuts[i] = inbin[r - below - 1]
    return cuts


def vocab_growth_curve(sf_dir: str):
    """Heaps'-law census: at each corpus-prefix decile (documents ordered
    by doc_id), the exact number of docs, tokens and DISTINCT terms seen
    so far — the curve a tokenizer/vocab-size decision reads.

    Scale shape: decile cuts by exact distributed selection (histogram +
    pinpoint-bin refine, no global sort); token volume via 10 map-side
    partial sums; vocabulary via a term-bucketed first-occurrence fold
    (terms are row-sized → block-local min, ONE bucketed shuffle, then a
    10-wide searchsorted census per bucket)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    agg = ds.aggregate(Min("doc_id"), Max("doc_id"), Count())
    lo, hi, n = (int(agg["min(doc_id)"]), int(agg["max(doc_id)"]),
                 int(agg["count()"]))
    cuts = _exact_doc_id_cuts(ds, lo, hi, n)
    cu = cuts  # 10 ints: cheap to capture in the task closures directly

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        nt = np.array([len(_WORD_RE.findall((tx or "").lower()))
                       for tx in df["text"]], np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        # tokens counted into decile k iff doc_id <= cuts[k]
        rows = [(k + 1, int(nt[ids <= cu[k]].sum()))
                for k in range(_VGC_DECILES)]
        return pd.DataFrame(rows, columns=["decile", "tok"])

    tok = (
        ds.map_batches(_pd_arrow(tok_partial), batch_format="pandas")
        .groupby("decile").sum("tok")
        .to_pandas().sort_values("decile")
    )
    tok.columns = ["decile", "n_tokens"]

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        fd: dict = {}
        for did, tx in zip(df["doc_id"], df["text"]):
            for wd in set(_WORD_RE.findall((tx or "").lower())):
                if wd not in fd or did < fd[wd]:
                    fd[wd] = did
        p = pd.DataFrame({"term": list(fd), "fd": list(fd.values())})
        p["_kb"] = (pd.util.hash_array(p["term"].to_numpy())
                    % _PGS_BUCKETS).astype(np.int64)
        return p

    def vocab_census(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("term", sort=False)["fd"].min().to_numpy(np.int64)
        counts = np.searchsorted(np.sort(fd), cu, side="right")
        return pd.DataFrame({
            "decile": np.arange(1, _VGC_DECILES + 1, dtype=np.int64),
            "v": counts.astype(np.int64),
        })

    voc = (
        ds.map_batches(_pd_arrow(first_partial), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(vocab_census),
                                   batch_format="pandas")
        .groupby("decile").sum("v")
        .to_pandas().sort_values("decile")
    )
    voc.columns = ["decile", "vocab"]
    out = tok.merge(voc, on="decile")
    out["n_docs"] = [(k * n + _VGC_DECILES - 1) // _VGC_DECILES
                     for k in out["decile"]]
    out = out[["decile", "n_docs", "n_tokens", "vocab"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False) \
        .replace_schema_metadata(None)


SQL_VOCAB_GROWTH_CURVE = """
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), n AS (SELECT count(*) AS c FROM documents),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM documents
), firsts AS (
  SELECT term, min(doc_id) AS fd
  FROM (SELECT doc_id, unnest(ws) AS term FROM w) GROUP BY term
), cuts AS (
  SELECT k, (SELECT doc_id FROM ranked
             WHERE rn = (k * (SELECT c FROM n) + 9) // 10) AS cut
  FROM generate_series(1, 10) g(k)
)
SELECT CAST(k AS BIGINT) AS decile,
       CAST((k * (SELECT c FROM n) + 9) // 10 AS BIGINT) AS n_docs,
       (SELECT CAST(sum(len(ws)) AS BIGINT) FROM w
        WHERE doc_id <= cut) AS n_tokens,
       (SELECT CAST(count(*) AS BIGINT) FROM firsts
        WHERE fd <= cut) AS vocab
FROM cuts ORDER BY k
"""


FPINDEX_REGISTRY = {
    "winnowing_fingerprints": (winnowing_fingerprints,
                               SQL_WINNOWING_FINGERPRINTS),
    "postings_gap_stats": (postings_gap_stats, SQL_POSTINGS_GAP_STATS),
    "running_median_per_user": (running_median_per_user,
                                SQL_RUNNING_MEDIAN_PER_USER),
    "vocab_growth_curve": (vocab_growth_curve, SQL_VOCAB_GROWTH_CURVE),
}
