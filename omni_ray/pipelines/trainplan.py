"""Training-batching planners (round 4, batch 84):

- padding_waste_census: docs assigned to power-of-two length buckets
  (the dynamic-batching discipline: batch within a bucket, pad to the
  bucket cap); per bucket: doc count, token mass, and padding waste in
  exact ppm of the padded volume. The number that decides between
  bucketed batching and sequence packing (doc_pack) on a real corpus.
- oov_vocab_curve: covered token mass vs vocabulary size (top-S terms by
  frequency) for S ∈ {100, 1000, 10000} — computed WITHOUT any per-term
  global ordering: within a frequency tie every term contributes the same
  mass, so coverage is exact from the BOUNDED count-of-counts histogram
  (full count-groups greedily, then the partial group's remainder ×
  count). The vocab-size sizing read for tokenizer training.

Scale shape: padding folds on the bounded bucket domain; the OOV curve's
only row-sized fold is the term-frequency table (_bucketed_agg), reduced
immediately to the bounded count-of-counts histogram before the driver
sees anything.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_VOCAB_SIZES = [100, 1_000, 10_000]


def padding_waste_census(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_chars"].to_numpy(), np.int64)
        # tokens ~ chars // 4 (the packing proxy used by trainprep), min 1
        toks = np.maximum(1, n // 4)
        # bucket cap = next power of two >= toks
        cap = np.left_shift(1, np.ceil(np.log2(toks)).astype(np.int64))
        cap = np.maximum(cap, 1)
        # guard exact powers (log2 exact) — ceil keeps them in place
        return pa.table({
            "cap": pa.array(cap, pa.int64()),
            "toks": pa.array(toks, pa.int64()),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("cap")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("toks", alias_name="token_mass"))
        .to_pandas().sort_values("cap").reset_index(drop=True)
    )
    out["waste_ppm"] = [
        (int(c) * int(n) - int(m)) * 1_000_000 // (int(c) * int(n))
        for c, n, m in zip(out["cap"], out["n_docs"], out["token_mass"])]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# 2^ceil(log2(t)): DuckDB mirrors via bit math on (t-1) to avoid log2
# float-boundary risk? No - we mirror the EXACT same ceil(log2()) double
# expression; log2 of an int64 is exact enough only near powers, so use
# the integer bit-length form on BOTH sides instead. (Python's
# np.ceil(np.log2(2**k)) == k exactly - IEEE log2 of a power of two is
# exact - and for non-powers the double has 52 bits of headroom over the
# 31-bit inputs, so the two sides agree.)
SQL_PADDING_WASTE = """
WITH t AS (
  SELECT greatest(1, n_chars // 4) AS toks FROM documents
), b AS (
  SELECT toks,
         CAST(power(2, ceil(log2(CAST(toks AS DOUBLE)))) AS BIGINT) AS cap
  FROM t
)
SELECT greatest(cap, 1) AS cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS token_mass,
       CAST((greatest(cap, 1) * count(*) - sum(toks)) * 1000000
            // (greatest(cap, 1) * count(*)) AS BIGINT) AS waste_ppm
FROM b GROUP BY 1
"""


def oov_vocab_curve(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.lower().str.findall(r"[a-z]+")
        out = pd.DataFrame({"term": t}).explode("term").dropna()
        return out.groupby("term", sort=False).size() \
            .rename("tf").reset_index()

    tf = _bucketed_agg(
        ds.map_batches(_pd_arrow(toks), batch_format="pandas"),
        ["term"], {"tf": ("tf", "sum")}).to_pandas()
    # bounded count-of-counts: (cnt value, n_terms with it)
    coc = tf["tf"].value_counts().sort_index(ascending=False)
    total_mass = int((coc.index.to_numpy(np.int64)
                      * coc.to_numpy(np.int64)).sum())
    rows = []
    for size in _VOCAB_SIZES:
        slots = size
        mass = 0
        used = 0
        for cnt, nterms in zip(coc.index.to_numpy(np.int64),
                               coc.to_numpy(np.int64)):
            take = min(slots, int(nterms))
            mass += int(cnt) * take
            used += take
            slots -= take
            if slots == 0:
                break
        rows.append((size, used, mass * 1_000_000 // total_mass
                     if total_mass else 0))
    out = pd.DataFrame(rows, columns=["vocab_size", "n_terms_used",
                                      "covered_ppm"]).astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_OOV_CURVE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
    AS term
  FROM documents
), tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1
), coc AS (
  SELECT tf AS cnt, CAST(count(*) AS BIGINT) AS n_terms
  FROM tf GROUP BY 1
), tot AS (SELECT sum(CAST(cnt AS HUGEINT) * n_terms) AS m FROM coc),
sizes AS (SELECT unnest({_VOCAB_SIZES}) AS vocab_size),
cum AS (
  SELECT cnt, n_terms,
         coalesce(sum(n_terms) OVER (ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_terms,
         coalesce(sum(CAST(cnt AS HUGEINT) * n_terms) OVER (ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_mass
  FROM coc
), per AS (
  SELECT s.vocab_size,
         least(c.n_terms, greatest(s.vocab_size - c.before_terms, 0)) AS take,
         c.cnt, c.before_mass, c.before_terms
  FROM sizes s JOIN cum c ON c.before_terms < s.vocab_size
)
SELECT vocab_size,
       CAST(sum(take) AS BIGINT) AS n_terms_used,
       CAST(sum(CAST(cnt AS HUGEINT) * take) * 1000000
            // (SELECT m FROM tot) AS BIGINT) AS covered_ppm
FROM per GROUP BY 1
"""


TRAINPLAN_REGISTRY = {
    "padding_waste_census": (padding_waste_census, SQL_PADDING_WASTE),
    "oov_vocab_curve": (oov_vocab_curve, SQL_OOV_CURVE),
}
