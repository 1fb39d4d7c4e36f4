"""Heavy-changer detection (round 5, batch 94): which terms' frequencies
shifted most between two corpus snapshots — the drift alarm a continuously
recrawled corpus needs (new boilerplate, template changes, topic surges).
Snapshot A = even doc_ids, snapshot B = odd (deterministic twin corpora).

Same bounded-memory exactization discipline as batch 93: per-window
Misra–Gries summaries (≤ k counters per block, merged and re-compressed),
candidate set = UNION of the two windows' survivors, then one exact
counting pass over the broadcast candidates. Guarantee: |Δ| ≤ max(c_A,
c_B), and any key with |Δ|·(k+1) > max(n_A, n_B) is heavy in whichever
window carries its larger count, so it survives that window's MG — the
candidate set provably covers every reported changer, making the output
(term, n_a, n_b, |Δ|) hash-equal to DuckDB's exact full-join diff.

Scale shape: two k-bounded summary folds + one candidate-filtered count
pass; nothing row-domain-sized ever shuffles or reaches the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .heavyhitters import _mg_compress
from .queries import _pd_arrow, _read

_K = 200
_WORD_RE = re.compile(r"[a-z]+")


def _window_summarize(which: int):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for i, t in zip(df["doc_id"], df["text"]):
            if int(i) % 2 == which:
                toks.extend(_WORD_RE.findall(
                    (t if isinstance(t, str) else "").lower()))
        if not toks:
            return pd.DataFrame({"term": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="int64"),
                                 "n_block": pd.Series([], dtype="int64"),
                                 "block_id": pd.Series([], dtype="object")})
        # min doc_id: collision-free across blocks (see heavyhitters.py —
        # a leading-token hash collides on duplicated boilerplate openings)
        bid = str(int(min(df["doc_id"])))
        s = _mg_compress(pd.Series(toks).value_counts(), _K)
        return pd.DataFrame({"term": s.index.astype(object),
                             "c": s.to_numpy(np.int64),
                             "n_block": np.int64(len(toks)),
                             "block_id": bid})

    return f


def heavy_change_census(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    cands: set[str] = set()
    totals = {}
    for w in (0, 1):
        parts = ds.map_batches(_pd_arrow(_window_summarize(w)),
                               batch_format="pandas").to_pandas()
        totals[w] = int(parts.drop_duplicates("block_id")["n_block"].sum())
        merged = _mg_compress(parts.groupby("term")["c"].sum(), _K)
        cands |= set(merged.index)

    def count_cands(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict[tuple, int] = {}
        for i, t in zip(df["doc_id"], df["text"]):
            w = int(i) % 2
            for tok in _WORD_RE.findall(
                    (t if isinstance(t, str) else "").lower()):
                if tok in cands:
                    rows[(tok, w)] = rows.get((tok, w), 0) + 1
        if not rows:
            return pd.DataFrame({"term": pd.Series([], dtype="object"),
                                 "w": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        ks = list(rows)
        return pd.DataFrame({"term": [k[0] for k in ks],
                             "w": np.array([k[1] for k in ks], np.int64),
                             "n": np.array([rows[k] for k in ks], np.int64)})

    exact = ds.map_batches(_pd_arrow(count_cands), batch_format="pandas") \
        .to_pandas().groupby(["term", "w"], as_index=False)["n"].sum()
    piv = exact.pivot_table(index="term", columns="w", values="n",
                            fill_value=0, aggfunc="sum")
    n_a = piv[0] if 0 in piv.columns else pd.Series(0, index=piv.index)
    n_b = piv[1] if 1 in piv.columns else pd.Series(0, index=piv.index)
    delta = (n_a - n_b).abs()
    bar = max(totals[0], totals[1])
    keep = delta * (_K + 1) > bar
    out = pd.DataFrame({
        "term": piv.index[keep].astype(object),
        "n_a": n_a[keep].to_numpy(np.int64),
        "n_b": n_b[keep].to_numpy(np.int64),
        "abs_delta": delta[keep].to_numpy(np.int64),
    }).sort_values("term").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_HEAVY_CHANGE_CENSUS = """
WITH toks AS (
  SELECT doc_id % 2 AS w,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
           AS term
  FROM documents
), counts AS (
  SELECT term,
         sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS n_b
  FROM toks GROUP BY 1
), tot AS (
  SELECT greatest(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END),
                  sum(CASE WHEN w = 1 THEN 1 ELSE 0 END)) AS bar
  FROM toks
)
SELECT term, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(abs(n_a - n_b) AS BIGINT) AS abs_delta
FROM counts
WHERE abs(n_a - n_b) * 201 > (SELECT bar FROM tot)
ORDER BY term
"""


HEAVYCHANGE_REGISTRY = {
    "heavy_change_census": (heavy_change_census, SQL_HEAVY_CHANGE_CENSUS),
}
