"""Operator batch 59 — L-moments, paired-labeler disagreement and
dedup-parameter sweeps.

Reference anchors: none in the reference; these add:

- l_moments_spend: Hosking's L-moments of purchase cents, EXACTLY —
  the rank-polynomial weights fold per VALUE through closed-form power
  sums over each value's rank block (Σi and Σi² over [a, b]), so ties
  never matter and no row is ever sorted: l₁, l₂, the L-CV
  (l₂/l₁-style, in ppm of mean·(n−1) form) and L-skewness τ₃ = l₃/l₂
  in milli (truncating division). The robust shape summary ordinary
  moments can't give under heavy tails.
- mcnemar_len_vocab: McNemar's paired test between two document
  labelers — "length above median" vs "distinct-terms above median":
  discordant counts b, c and the statistic (b−c)²·1000 // (b+c); the
  paired-disagreement read kappa's symmetric agreement hides.
- shingle_size_sweep: dedup-parameter tuning — for shingle sizes 3, 5
  and 8 words, the total and distinct shingle counts and the duplicated
  share in ppm; the curve that picks the dedup n-gram width.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read
from .tsops import _exact_ranks, _trunc_div

_WORD_RE = __import__("re").compile(r"[a-z]+")
_SHINGLE_NS = (3, 5, 8)


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# l_moments_spend
# ---------------------------------------------------------------------------


def l_moments_spend(sf_dir: str):
    """Exact sample L-moments of purchase cents via per-value rank-block
    closed forms: for a value occupying sorted ranks [a, b], S0 = b−a+1,
    S1 = Σi, S2 = Σi²; then
      l2_num  = Σ v·(2·S1 − (n+1)·S0)          l2 = l2_num/(n(n−1))
      l3_num2 = Σ v·(6·S2 − 6(n+1)·S1 + (n+1)(n+2)·S0)
      τ₃ = l3_num2 / ((n−2)·l2_num)
    Output: n, l1_milli, l2_milli, lcv_ppm = 10⁶·l2_num // ((n−1)·Σv),
    lskew_milli = trunc(1000·l3_num2 / ((n−2)·l2_num)).

    Scale shape: one bounded cents-value groupby; the rank-block scan is
    a vectorized pass over the histogram — no global sort."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        c = _cents(t["value"].to_numpy())
        return pa.table({"cents": pa.array(c, pa.int64()),
                         "one": pa.array(np.ones(len(c), np.int64))})

    hist = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("one", alias_name="c"))
        .to_pandas().sort_values("cents")
    )
    v = hist["cents"].astype(object).to_numpy()
    cn = hist["c"].astype(object).to_numpy()
    n = int(sum(cn))
    cum = np.cumsum(cn)
    b = cum
    a = cum - cn + 1
    s0 = cn
    s1 = (a + b) * s0 // 2
    s2 = b * (b + 1) * (2 * b + 1) // 6 - (a - 1) * a * (2 * a - 1) // 6
    total = int(sum(v * s0))
    l2_num = int(sum(v * (2 * s1 - (n + 1) * s0)))
    l3_num2 = int(sum(v * (6 * s2 - 6 * (n + 1) * s1
                           + (n + 1) * (n + 2) * s0)))
    out = pd.DataFrame({
        "n_purchases": [np.int64(n)],
        "l1_milli": np.int64(total * 1000 // n if n else 0),
        "l2_milli": np.int64(l2_num * 1000 // (n * (n - 1))
                             if n > 1 else 0),
        "lcv_ppm": np.int64(l2_num * 1_000_000 // ((n - 1) * total)
                            if n > 1 and total else 0),
        "lskew_milli": np.int64(_trunc_div(1000 * l3_num2,
                                           (n - 2) * l2_num)
                                if n > 2 and l2_num else 0),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_L_MOMENTS_SPEND = """
WITH p AS (
  SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), hist AS (
  SELECT cents, count(*) AS c FROM p GROUP BY 1
), n AS (SELECT sum(c) AS n FROM hist),
blocks AS (
  SELECT cents, c,
         sum(c) OVER (ORDER BY cents) AS b,
         sum(c) OVER (ORDER BY cents) - c + 1 AS a
  FROM hist
), terms AS (
  SELECT CAST(cents AS HUGEINT) AS v, CAST(c AS HUGEINT) AS s0,
         (CAST(a AS HUGEINT) + b) * c // 2 AS s1,
         CAST(b AS HUGEINT) * (b + 1) * (2 * b + 1) // 6
           - CAST(a - 1 AS HUGEINT) * a * (2 * a - 1) // 6 AS s2
  FROM blocks
), agg AS (
  SELECT sum(v * s0) AS total,
         sum(v * (2 * s1 - ((SELECT n FROM n) + 1) * s0)) AS l2n,
         sum(v * (6 * s2 - 6 * ((SELECT n FROM n) + 1) * s1
                  + ((SELECT n FROM n) + 1) * ((SELECT n FROM n) + 2)
                    * s0)) AS l3n2
  FROM terms
)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_purchases,
       CAST(total * 1000 // (SELECT n FROM n) AS BIGINT) AS l1_milli,
       CAST(l2n * 1000 // ((SELECT n FROM n)
                           * ((SELECT n FROM n) - 1)) AS BIGINT)
         AS l2_milli,
       CAST(l2n * 1000000 // (((SELECT n FROM n) - 1) * total) AS BIGINT)
         AS lcv_ppm,
       CAST(CASE WHEN l2n = 0 THEN 0
                 ELSE 1000 * l3n2 // (((SELECT n FROM n) - 2) * l2n) END
            AS BIGINT) AS lskew_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# mcnemar_len_vocab
# ---------------------------------------------------------------------------


def mcnemar_len_vocab(sf_dir: str):
    """McNemar's paired disagreement between "n_chars above its type-1
    median" and "distinct terms above its median": concordant counts,
    discordant b (len yes / vocab no) and c (len no / vocab yes), and
    the statistic (b−c)²·1000 // (b+c).

    Scale shape: both medians by exact distributed selection; one
    zero-shuffle labeling map; a bounded 2×2 fold."""
    ds = _read(sf_dir, "documents", columns=["text", "n_chars"]) \
        .materialize()
    n = ds.count()
    med_rank = [(n + 1) // 2]
    len_med = int(_exact_ranks(ds, "n_chars", med_rank)[0])

    def vocab(t: pa.Table) -> pa.Table:
        nt = np.array([len(set(_WORD_RE.findall((x or "").lower())))
                       for x in t["text"].to_pylist()], np.int64)
        return pa.table({"voc": pa.array(nt, pa.int64()),
                         "n_chars": t["n_chars"]})

    vv = ds.map_batches(vocab, batch_format="pyarrow").materialize()
    voc_med = int(_exact_ranks(vv, "voc", med_rank)[0])

    def label(t: pa.Table) -> pa.Table:
        ln = np.asarray(t["n_chars"].to_numpy(), np.int64) > len_med
        vc = np.asarray(t["voc"].to_numpy(), np.int64) > voc_med
        return pa.table({
            "cell": pa.array(2 * ln.astype(np.int64)
                             + vc.astype(np.int64), pa.int64()),
        })

    cells = (
        vv.map_batches(label, batch_format="pyarrow")
        .groupby("cell").aggregate(Count(alias_name="c"))
        .to_pandas().set_index("cell")["c"]
    )
    both = int(cells.get(3, 0))
    neither = int(cells.get(0, 0))
    b = int(cells.get(2, 0))  # len yes, vocab no
    c = int(cells.get(1, 0))  # len no, vocab yes
    stat = (b - c) ** 2 * 1000 // (b + c) if b + c else 0
    out = pd.DataFrame({
        "concordant": [np.int64(both + neither)],
        "b_len_only": np.int64(b),
        "c_vocab_only": np.int64(c),
        "mcnemar_milli": np.int64(stat),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_MCNEMAR_LEN_VOCAB = """
WITH v AS (
  SELECT n_chars AS ln,
         len(list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                                              '[a-z]+'))) AS vc
  FROM documents
), n AS (SELECT count(*) AS c FROM v),
lr AS (SELECT ln, row_number() OVER (ORDER BY ln) AS rn FROM v),
vr AS (SELECT vc, row_number() OVER (ORDER BY vc) AS rn FROM v),
med AS (
  SELECT (SELECT ln FROM lr
          WHERE rn = ((SELECT c FROM n) + 1) // 2) AS lm,
         (SELECT vc FROM vr
          WHERE rn = ((SELECT c FROM n) + 1) // 2) AS vm
), lab AS (
  SELECT CASE WHEN ln > (SELECT lm FROM med) THEN 1 ELSE 0 END AS a,
         CASE WHEN vc > (SELECT vm FROM med) THEN 1 ELSE 0 END AS b
  FROM v
), agg AS (
  SELECT sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS conc,
         sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS bb,
         sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS cc
  FROM lab
)
SELECT CAST(conc AS BIGINT) AS concordant,
       CAST(bb AS BIGINT) AS b_len_only,
       CAST(cc AS BIGINT) AS c_vocab_only,
       CAST(CASE WHEN bb + cc = 0 THEN 0
                 ELSE (bb - cc) * (bb - cc) * 1000 // (bb + cc) END
            AS BIGINT) AS mcnemar_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# shingle_size_sweep
# ---------------------------------------------------------------------------


def shingle_size_sweep(sf_dir: str):
    """Dedup-parameter curve: for word-shingle sizes 3, 5 and 8, the
    total occurrences, distinct shingles (60-bit md5) and the duplicated
    share (total − distinct)·10⁶ // total — smaller shingles dedup more
    aggressively; the sweep picks the knee.

    Scale shape: (size, shingle) pairs fold block-locally through ONE
    shingle-bucketed distinct fold emitting per-size counters; three
    bounded rows out."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        sz_l, sh_l, n_l = [], [], []
        for tx in df["text"]:
            ws = _WORD_RE.findall((tx or "").lower())
            for sz in _SHINGLE_NS:
                local: dict = {}
                for k in range(len(ws) - sz + 1):
                    h = int(hashlib.md5(
                        " ".join(ws[k:k + sz]).encode()).hexdigest()[:15],
                        16)
                    local[h] = local.get(h, 0) + 1
                for h, c in local.items():
                    sz_l.append(sz)
                    sh_l.append(h)
                    n_l.append(c)
        p = pd.DataFrame({"sz": pd.array(sz_l, "int64"),
                          "sh": pd.array(sh_l, "int64"),
                          "n": pd.array(n_l, "int64")})
        p = p.groupby(["sz", "sh"], sort=False)["n"].sum().reset_index()
        p["_kb"] = (p["sh"].to_numpy(np.int64) & 255).astype(np.int64)
        return p

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["sz", "sh"], sort=False)["n"].sum().reset_index()
        out = d.groupby("sz", sort=False).agg(
            total=("n", "sum"), n_distinct=("sh", "size")).reset_index()
        return out

    agg = (
        ds.map_batches(_pd_arrow(pairs), batch_format="pandas")
        .groupby("_kb").map_groups(_pd_arrow(fold), batch_format="pandas")
        .groupby("sz").aggregate(Sum("total", alias_name="total"),
                                 Sum("n_distinct", alias_name="n_distinct"))
        .to_pandas().sort_values("sz").reset_index(drop=True)
    )
    agg["dup_ppm"] = ((agg["total"].astype("int64")
                       - agg["n_distinct"].astype("int64")) * 1_000_000
                      // agg["total"].astype("int64"))
    out = agg.rename(columns={"sz": "shingle_words"})
    for c in ("shingle_words", "total", "n_distinct", "dup_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _sweep_sql() -> str:
    arms = []
    for sz in _SHINGLE_NS:
        concat = " || ' ' || ".join(f"ws[k+{i}]" for i in range(sz))
        arms.append(f"""
  SELECT {sz} AS shingle_words,
         unnest(list_transform(
           generate_series(1, greatest(len(ws) - {sz - 1}, 0)),
           k -> CAST(('0x' || substr(md5({concat}), 1, 15)) AS BIGINT)))
           AS h
  FROM w""")
    union = " UNION ALL ".join(arms)
    return f"""
WITH w AS (
  SELECT regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ws
  FROM documents
), sh AS ({union}),
agg AS (
  SELECT shingle_words, count(*) AS total,
         count(DISTINCT h) AS distinct_
  FROM sh GROUP BY 1
)
SELECT CAST(shingle_words AS BIGINT) AS shingle_words,
       CAST(total AS BIGINT) AS total,
       CAST(distinct_ AS BIGINT) AS n_distinct,
       CAST((total - distinct_) * 1000000 // total AS BIGINT) AS dup_ppm
FROM agg ORDER BY shingle_words
"""


SQL_SHINGLE_SIZE_SWEEP = _sweep_sql()


LMOMOPS_REGISTRY = {
    "l_moments_spend": (l_moments_spend, SQL_L_MOMENTS_SPEND),
    "mcnemar_len_vocab": (mcnemar_len_vocab, SQL_MCNEMAR_LEN_VOCAB),
    "shingle_size_sweep": (shingle_size_sweep, SQL_SHINGLE_SIZE_SWEEP),
}
