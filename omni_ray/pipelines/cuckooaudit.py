"""Cuckoo-filter placement audit (round 4, batch 67) — the query-surface
twin of the new cuckoo front tier in state/filters.CuckooFilter (the
north_rule names "Bloom/cuckoo-filter URL-seen set"; the bloom side already
has bloom_fp_audit / bloom_size_advisor).

``cuckoo_collision_audit`` reproduces the filter's EXACT placement
arithmetic over the documents key universe (md5 of the doc_id string, the
house audit keying) and reports the two quantities that size a cuckoo
deployment, both computable statically and hence SQL-oracle-able:

  * 'load'   — primary-bucket load histogram (k = items whose i1 lands in
    a bucket, n = buckets with that load; k=0 row included): the kick-rate
    predictor. Random placement should be Poisson(n_keys/n_buckets).
  * 'fpmult' — (i1, fingerprint) pair multiplicity histogram: pairs with
    m ≥ 2 are INDISTINGUISHABLE keys (the filter's intrinsic false-positive
    unit) — the fpp floor is derivable from this row set.

The insert-time dynamics (kick chains, stash) are deliberately NOT here —
they are order-dependent state, pinned by tests/test_cuckoo.py instead.

Scale shape: one map over the pruned doc_id column (per-row md5 — the
documented cross-engine-exact sketch cost), then: bucket loads fold on the
BOUNDED i1 domain (groupby.aggregate), pair counts fold on the ROW-SIZED
(i1, fp) domain (_bucketed_agg), and both histograms finish on bounded
multiplicity domains. Output is a three-column (metric, k, n) table.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count

from .queries import _bucketed_agg, _pd_arrow, _read

_N_BUCKETS = 4096  # power of two, matches CuckooFilter's default audit size


def cuckoo_collision_audit(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ks = df["doc_id"].to_numpy(np.int64)
        fps = np.empty(len(ks), np.int64)
        i1s = np.empty(len(ks), np.int64)
        md5 = hashlib.md5
        for j, k in enumerate(ks):
            d = md5(str(int(k)).encode()).digest()
            fps[j] = (int.from_bytes(d[4:6], "big") % 65535) + 1
            i1s[j] = int.from_bytes(d[8:12], "big") % _N_BUCKETS
        return pd.DataFrame({"i1": i1s, "fp": fps})

    keyed = ds.map_batches(_pd_arrow(prep), batch_format="pandas")

    # bounded i1 domain: builtin aggregate; load histogram on the driver
    loads = (
        keyed.groupby("i1").aggregate(Count(alias_name="load")).to_pandas()
    )
    lh = loads["load"].value_counts().sort_index()
    load_rows = [("load", int(k), int(n)) for k, n in lh.items()]
    n_empty = _N_BUCKETS - len(loads)
    if n_empty > 0:
        load_rows.insert(0, ("load", 0, n_empty))

    # row-sized (i1, fp) domain: bucketed pair counts, bounded m histogram
    pairs = _bucketed_agg(keyed, ["i1", "fp"], {"m": ("fp", "count")}) \
        .to_pandas()
    mh = pairs["m"].value_counts().sort_index()
    fp_rows = [("fpmult", int(k), int(n)) for k, n in mh.items()]

    out = pd.DataFrame(load_rows + fp_rows, columns=["metric", "k", "n"]) \
        .sort_values(["metric", "k"]).reset_index(drop=True)
    for c in ("k", "n"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CUCKOO_COLLISION_AUDIT = f"""
WITH f AS (
  SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4))
              AS UINTEGER) % 65535 + 1 AS BIGINT) AS fp,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8))
              AS UBIGINT) % {_N_BUCKETS} AS BIGINT) AS i1
  FROM documents
), loads AS (
  SELECT i1, count(*) AS load FROM f GROUP BY 1
), loadh AS (
  SELECT load AS k, CAST(count(*) AS BIGINT) AS n FROM loads GROUP BY 1
  UNION ALL
  SELECT 0 AS k, {_N_BUCKETS} - count(*) AS n FROM loads
), pairs AS (
  SELECT i1, fp, count(*) AS m FROM f GROUP BY 1, 2
), fph AS (
  SELECT m AS k, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1
)
SELECT 'load' AS metric, k, n FROM loadh WHERE n > 0
UNION ALL
SELECT 'fpmult' AS metric, k, n FROM fph
"""


CUCKOOAUDIT_REGISTRY = {
    "cuckoo_collision_audit": (cuckoo_collision_audit,
                               SQL_CUCKOO_COLLISION_AUDIT),
}
