"""Recrawl revalidation planning (round 5, batch 92): the bandwidth ledger
behind conditional GET (RFC 9110 — the CachingHttpBackend / PagesHTTPServer
ETag machinery added this round): given the previous epoch's validators,
which urls of the next cycle revalidate with a bodyless 304 and which
refetch, and how many bytes the 304s save per host.

Universe: pages = documents (host = doc_id % 9); a page's content changed
since the stored validator iff doc_id % 5 < 2 (changed → refetch 200,
entity bytes on the wire = utf-8 length of text; unchanged → 304, saved
bytes = that same length). Census per host: n_refetch, n_revalidated,
bytes_fetched, bytes_saved, saved_ppm (exact integer ppm of the host's
total entity bytes).

Scale shape: one vectorized map_batches pass (indicator + byte-length
arithmetic per block) into a bounded per-host groupby — the plan a crawl
scheduler derives before spending its bandwidth budget; no shuffle beyond
the 9-host aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .queries import _pd_arrow, _read

_HOSTS = 9


def conditional_get_plan(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        nbytes = np.fromiter(
            (len((t if isinstance(t, str) else "").encode("utf-8"))
             for t in df["text"]),
            dtype=np.int64, count=len(ids))
        changed = (ids % 5) < 2
        return pd.DataFrame({
            "host": [f"p{i % _HOSTS}.example.net" for i in ids],
            "refetch": changed.astype(np.int64),
            "reval": (~changed).astype(np.int64),
            "bytes_fetched": np.where(changed, nbytes, 0),
            "bytes_saved": np.where(changed, 0, nbytes),
        })

    parts = ds.map_batches(_pd_arrow(plan), batch_format="pandas").to_pandas()
    g = parts.groupby("host", as_index=False).sum().sort_values("host") \
        .reset_index(drop=True)
    total = g["bytes_fetched"] + g["bytes_saved"]
    g["saved_ppm"] = np.where(
        total > 0, (g["bytes_saved"] * 1_000_000) // np.maximum(total, 1), 0
    ).astype("int64")
    g = g.rename(columns={"refetch": "n_refetch", "reval": "n_revalidated"})
    for c in g.columns[1:]:
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(
        g[["host", "n_refetch", "n_revalidated", "bytes_fetched",
           "bytes_saved", "saved_ppm"]],
        preserve_index=False,
    ).replace_schema_metadata(None)


SQL_CONDITIONAL_GET_PLAN = """
WITH p AS (
  SELECT 'p' || (doc_id % 9) || '.example.net' AS host,
         octet_length(encode(coalesce(text, ''))) AS nb,
         CASE WHEN doc_id % 5 < 2 THEN 1 ELSE 0 END AS changed
  FROM documents
), agg AS (
  SELECT host,
         sum(changed) AS n_refetch,
         sum(1 - changed) AS n_revalidated,
         sum(changed * nb) AS bytes_fetched,
         sum((1 - changed) * nb) AS bytes_saved
  FROM p GROUP BY 1
)
SELECT host,
       CAST(n_refetch AS BIGINT) AS n_refetch,
       CAST(n_revalidated AS BIGINT) AS n_revalidated,
       CAST(bytes_fetched AS BIGINT) AS bytes_fetched,
       CAST(bytes_saved AS BIGINT) AS bytes_saved,
       CAST(CASE WHEN bytes_fetched + bytes_saved > 0
                 THEN (bytes_saved * 1000000)
                      // (bytes_fetched + bytes_saved)
                 ELSE 0 END AS BIGINT) AS saved_ppm
FROM agg
ORDER BY host
"""


REVALPLAN_REGISTRY = {
    "conditional_get_plan": (conditional_get_plan, SQL_CONDITIONAL_GET_PLAN),
}
