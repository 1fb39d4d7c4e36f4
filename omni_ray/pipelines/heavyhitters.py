"""Misra–Gries heavy hitters (round 5, batch 93): the bounded-memory
streaming top-k kernel every 100-TB term pipeline needs — per-block
Misra–Gries summaries (≤ k counters each, regardless of block vocabulary),
a driver-side mergeable-summary fold (bounded: #blocks × k, re-compressed
to k), then ONE exact counting pass restricted to the ≤ k surviving
candidates (broadcast set, no row-domain shuffle).

Correctness story (why a sketch can be hash-oracled exactly): MG's
deterministic guarantee — a block summary undercounts any key by at most
δ_block = n_block/(k+1), and merge errors add, so Σδ ≤ n_total/(k+1);
therefore EVERY key with true frequency > n_total/(k+1) survives into the
candidate set. The exact pass then reports true counts, and the output
(keys with count·(k+1) > n_total, integer compare) equals DuckDB's exact
word count — but only if the summary/merge/compress logic is right: a
buggy decrement that drops a true heavy hitter loses an output row and
hashes wrong. The sketch is load-bearing, the oracle exact.

Scale shape: map_batches emits k-bounded partials (never the block
vocabulary); the fold touches #blocks × k rows; the verify pass filters to
the broadcast candidate set before any aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .queries import _pd_arrow, _read

_K = 200  # counters per summary; heavy = freq > n/(k+1)


def _mg_compress(counts: pd.Series, k: int) -> pd.Series:
    """Compress an exact (or merged) counter set to ≤ k keys, MG-style:
    subtract the smallest δ that leaves at most k positive counters —
    every key's count drops by ≤ δ, the MG error bound."""
    if len(counts) <= k:
        return counts
    vals = np.sort(counts.to_numpy(np.int64))[::-1]
    delta = int(vals[k])  # (k+1)-th largest: subtracting it leaves ≤ k > 0
    out = counts - delta
    return out[out > 0]


def mg_heavy_hitters(sf_dir: str):
    import re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    word_re = re.compile(r"[a-z]+")

    # n_block rides along with the block's min doc_id as the block key
    # (n_block alone is NOT one: two blocks can hold equal token counts)
    parts = ds.map_batches(_pd_arrow(_summarize_with_id(word_re)),
                           batch_format="pandas").to_pandas()
    n_total = int(parts.drop_duplicates("block_id")["n_block"].sum())
    merged = _mg_compress(parts.groupby("term")["c"].sum(), _K)
    candidates = set(merged.index)

    # exact verify pass over the bounded candidate set only
    def count_candidates(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in df["text"]:
            toks.extend(
                w for w in word_re.findall(
                    (t if isinstance(t, str) else "").lower())
                if w in candidates)
        vc = pd.Series(toks).value_counts() if toks else pd.Series(dtype="int64")
        return pd.DataFrame({"term": vc.index.astype(object),
                             "n": vc.to_numpy(np.int64)})

    exact = ds.map_batches(_pd_arrow(count_candidates),
                           batch_format="pandas").to_pandas()
    exact = exact.groupby("term", as_index=False)["n"].sum()
    heavy = exact[exact["n"] * (_K + 1) > n_total] \
        .sort_values(["term"]).reset_index(drop=True)
    heavy["n"] = heavy["n"].astype("int64")
    return pa.Table.from_pandas(heavy[["term", "n"]], preserve_index=False) \
        .replace_schema_metadata(None)


def _summarize_with_id(word_re):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in df["text"]:
            toks.extend(word_re.findall((t if isinstance(t, str) else "").lower()))
        n = len(toks)
        if not n:
            return pd.DataFrame({"term": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="int64"),
                                 "n_block": pd.Series([], dtype="int64"),
                                 "block_id": pd.Series([], dtype="object")})
        # block id = the block's min doc_id: blocks partition the rows and
        # doc_id is unique, so this can NEVER collide across blocks (a
        # content hash of leading tokens could — near-duplicate boilerplate
        # docs can open two different blocks identically) and is stable
        # under task retries
        bid = str(int(min(df["doc_id"])))
        summary = _mg_compress(pd.Series(toks).value_counts(), _K)
        return pd.DataFrame({"term": summary.index.astype(object),
                             "c": summary.to_numpy(np.int64),
                             "n_block": np.int64(n),
                             "block_id": bid})

    return f


SQL_MG_HEAVY_HITTERS = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
    AS term
  FROM documents
), tot AS (
  SELECT count(*) AS n FROM toks
)
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM toks
GROUP BY term
HAVING count(*) * 201 > (SELECT n FROM tot)
ORDER BY term
"""


HEAVYHITTERS_REGISTRY = {
    "mg_heavy_hitters": (mg_heavy_hitters, SQL_MG_HEAVY_HITTERS),
}
