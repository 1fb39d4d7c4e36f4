"""Feature-prep screening operators (round 4, batch 74): the three checks
an ML-data platform runs between raw tables and a feature store.

- nzv_screen_lineitem: near-zero-variance screen over lineitem's numeric
  columns — per column: distinct count, top/second value frequencies, the
  caret-style freq-ratio (top/second, milli) and unique-ppm. Columns with
  huge freq ratios + tiny unique rates carry no signal and blow up
  one-hot/target encoders; this is the standard pre-encoding screen. One
  pass per column over bounded value domains (quantity/discount/tax are
  small grids; extendedprice buckets via the cents grid's top values).
- loo_target_encoding: leave-one-out target encoding of `source` against
  n_chars — enc_i = (Σ_s − x_i) / (n_s − 1) per doc, exact integer ppm.
  The LOO form is THE leakage-safe variant (plain mean encoding leaks the
  row's own target); emitting it row-level with an exact oracle pins both
  the arithmetic and the no-self-leak property.
- group_kfold_assign: grouped 5-fold assignment — fold = md5(user)-based,
  so every event of a user lands in ONE fold (the group-leakage rule
  cross-validation needs); output is the per-(fold, type) census the
  balance check reads. Deterministic, shuffle-free, infinitely scalable
  (each row computes its fold independently).

Scale shape: screens fold to bounded per-column/per-fold summaries;
LOO encoding is one broadcast of the bounded per-source moment table into
a stateless row map.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_NZV_COLS = ["l_quantity", "l_discount", "l_tax", "l_linenumber"]
_K_FOLDS = 5


def nzv_screen_lineitem(sf_dir: str):
    ds = _read(sf_dir, "lineitem", columns=_NZV_COLS)

    def melt(t: pa.Table) -> pa.Table:
        cols, vals = [], []
        for c in _NZV_COLS:
            # exact value grid: quantity/linenumber are integers, discount/
            # tax are cent-grid floats — scale by 100 to an int domain
            v = np.asarray(t[c].to_numpy(zero_copy_only=False), np.float64)
            iv = np.floor(v * 100.0 + 0.5).astype(np.int64)
            cols.extend([c] * len(iv))
            vals.extend(iv.tolist())
        return pa.table({"col": pa.array(cols, pa.string()),
                         "v": pa.array(vals, pa.int64())})

    counts = (
        ds.map_batches(melt, batch_format="pyarrow")
        .groupby(["col", "v"]).aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    rows = []
    n_rows = None
    for col, g in counts.groupby("col"):
        freq = g.sort_values(["c", "v"], ascending=[False, True],
                             kind="mergesort")["c"].to_numpy(np.int64)
        tot = int(freq.sum())
        n_rows = tot
        top = int(freq[0])
        second = int(freq[1]) if len(freq) > 1 else 0
        rows.append((col, len(freq), top, second,
                     top * 1000 // second if second else -1,
                     len(freq) * 1_000_000 // tot))
    out = pd.DataFrame(rows, columns=["col", "n_distinct", "top_freq",
                                      "second_freq", "freq_ratio_milli",
                                      "unique_ppm"]) \
        .sort_values("col").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _nzv_sql_one(col: str) -> str:
    return f"""
  SELECT '{col}' AS col,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top_freq,
         CAST(coalesce(max(c) FILTER (WHERE rk = 2), 0) AS BIGINT)
           AS second_freq,
         CAST(CASE WHEN coalesce(max(c) FILTER (WHERE rk = 2), 0) = 0
                   THEN -1
                   ELSE max(c) * 1000 // max(c) FILTER (WHERE rk = 2) END
              AS BIGINT) AS freq_ratio_milli,
         CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS unique_ppm
  FROM (
    SELECT v, c, row_number() OVER (ORDER BY c DESC, v) AS rk
    FROM (SELECT CAST(floor({col} * 100 + 0.5) AS BIGINT) AS v,
                 count(*) AS c
          FROM lineitem GROUP BY 1)
  )"""


SQL_NZV_SCREEN = " UNION ALL ".join(_nzv_sql_one(c) for c in _NZV_COLS)


def loo_target_encoding(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    mom = (
        ds.groupby("source")
        .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="s"))
        .to_pandas()
    )
    mom_ref = ray.put({str(r["source"]): (int(r["n"]), int(r["s"]))
                       for _, r in mom.iterrows()})

    def enc(t: pa.Table) -> pa.Table:
        m = ray.get(mom_ref)
        src = t["source"].to_pylist()
        x = np.asarray(t["n_chars"].to_numpy(), np.int64)
        ns = np.array([m[s][0] for s in src], np.int64)
        ss = np.array([m[s][1] for s in src], np.int64)
        den = np.maximum(ns - 1, 1)  # guarded: ns==1 rows take the -1 branch
        enc_ppm = np.where(ns > 1, (ss - x) * 1_000_000 // den, -1)
        return pa.table({
            "doc_id": t["doc_id"],
            "enc_ppm": pa.array(enc_ppm, pa.int64()),
        })

    out = ds.map_batches(enc, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "enc_ppm"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_LOO_ENCODING = """
WITH mom AS (
  SELECT source, count(*) AS n, sum(CAST(n_chars AS BIGINT)) AS s
  FROM documents GROUP BY 1
)
SELECT d.doc_id,
       CAST(CASE WHEN m.n > 1
                 THEN (m.s - d.n_chars) * 1000000 // (m.n - 1)
                 ELSE -1 END AS BIGINT) AS enc_ppm
FROM documents d JOIN mom m ON d.source = m.source
"""


def group_kfold_assign(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        f = [int.from_bytes(md5(str(int(u)).encode()).digest()[:4], "big")
             % _K_FOLDS for u in df["user_id"]]
        return pd.DataFrame({"fold": pd.Series(f, dtype="int64"),
                             "event_type": df["event_type"].astype(str),
                             "user_id": df["user_id"].astype("int64")})

    keyed = ev.map_batches(_pd_arrow(fold), batch_format="pandas")
    per_user = (
        keyed.groupby(["fold", "event_type", "user_id"])
        .aggregate(Count(alias_name="n"))
    )
    out = (
        per_user.groupby(["fold", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"),
                   Count(alias_name="n_users"))
        .to_pandas().sort_values(["fold", "event_type"])
        .reset_index(drop=True)
    )
    for c in ("fold", "n_events", "n_users"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_GROUP_KFOLD = f"""
WITH f AS (
  SELECT CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS UBIGINT) % {_K_FOLDS} AS BIGINT) AS fold,
         event_type, user_id
  FROM events
)
SELECT fold, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM f GROUP BY 1, 2
"""


MLPREP_REGISTRY = {
    "nzv_screen_lineitem": (nzv_screen_lineitem, SQL_NZV_SCREEN),
    "loo_target_encoding": (loo_target_encoding, SQL_LOO_ENCODING),
    "group_kfold_assign": (group_kfold_assign, SQL_GROUP_KFOLD),
}
