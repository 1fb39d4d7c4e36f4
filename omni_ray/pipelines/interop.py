"""Interchange + survey-allocation operators (round 4, batch 69):
CSV and JSONL sharded round-trips (the S9/S10 exporter surface lifted to
Dataset-level sources/sinks, joining the ORC path from sources/orcfiles),
and Neyman optimal sample allocation per source.

- csv_roundtrip_stats / jsonl_roundtrip_stats: documents → deterministic
  sharded files (shard = doc_id % 16, tmp + os.replace atomic, re-runs
  byte-identical — the sinks/partitioned.py discipline) → Ray's streaming
  read_csv / read_json → per-source aggregate. The aggregate equals the
  same SQL over the parquet table iff the text encode/decode preserved
  every row and value — a REAL fidelity proof for the two interchange
  formats the reference exports (src/exporters/csv_exporter.py,
  data_exporter.py JSON envelope).
- neyman_allocation: a fixed budget of sample slots split across sources
  ∝ N_i·σ_i (σ of n_chars) — the variance-optimal stratified-sampling
  design. N_i·σ_i = √(N_i·Σx² − (Σx)²) exactly, so the weights are exact
  integer isqrt values (math.isqrt / the one-step-corrected floor-sqrt in
  SQL), and the split is largest-remainder apportionment in pure integer
  arithmetic (the allocops quota discipline). The sampling-plan twin of
  stratified_sample_by_lang: that op EXECUTES a fixed-rate design, this
  one DERIVES the optimal rates.

Scale shape: the round-trips stream shard-at-a-time through map_groups
writers and file-parallel readers (no driver materialization; 16 shards
here, one per key-range at 100 TB); the allocation folds to one bounded
per-source moment row before any driver math.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _pd_arrow, _read

_N_SHARDS = 16
_BUDGET = 10_000


def _write_shards(ds: ray.data.Dataset, out_dir: str, fmt: str) -> int:
    """Sharded deterministic text sink: shard = doc_id % 16, atomic per
    shard, sorted by doc_id inside a shard so re-runs are byte-identical."""
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(t: pa.Table) -> pa.Table:
        sh = pc.cast(pc.bit_wise_and(pc.cast(t["doc_id"], pa.int64()),
                                     _N_SHARDS - 1), pa.int32())
        return t.append_column("_shard", sh)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["_shard"].iloc[0])
        g = g.drop(columns=["_shard"]).sort_values("doc_id")
        ext = "csv" if fmt == "csv" else "json"
        tmp = os.path.join(out_dir, f".shard-{shard:04d}.{ext}.tmp")
        if fmt == "csv":
            import pyarrow.csv as pacsv

            pacsv.write_csv(
                pa.Table.from_pandas(g, preserve_index=False)
                .replace_schema_metadata(None), tmp)
        else:
            g.to_json(tmp, orient="records", lines=True)
        os.replace(tmp, os.path.join(out_dir, f"shard-{shard:04d}.{ext}"))
        return pd.DataFrame({"shard": [shard], "n_rows": [len(g)]})

    manifest = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(_pd_arrow(write_group), batch_format="pandas")
        .to_pandas()
    )
    return len(manifest)


def _roundtrip_stats(sf_dir: str, fmt: str):
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = f"/tmp/omni_ray_{fmt}_{tag}"
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    _write_shards(ds, out_dir, fmt)
    if fmt == "csv":
        back = ray.data.read_csv(out_dir, file_extensions=["csv"])
    else:
        back = ray.data.read_json(out_dir, file_extensions=["json"])
    out = (
        back.groupby("source")
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_chars", alias_name="sum_chars"),
                   Sum("doc_id", alias_name="sum_ids"))
        .to_pandas()
    )
    for c in ("n_docs", "sum_chars", "sum_ids"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def csv_roundtrip_stats(sf_dir: str):
    return _roundtrip_stats(sf_dir, "csv")


def jsonl_roundtrip_stats(sf_dir: str):
    return _roundtrip_stats(sf_dir, "jsonl")


_SQL_ROUNDTRIP = """
SELECT source,
       CAST(COUNT(*) AS BIGINT)     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT)  AS sum_ids
FROM documents
GROUP BY source
"""


def neyman_allocation(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def mom(t: pa.Table) -> pa.Table:
        x = pc.cast(t["n_chars"], pa.int64())
        return pa.table({
            "source": t["source"],
            "x": x,
            "xx": pc.multiply(x, x),
        })

    per = (
        ds.map_batches(mom, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Count(alias_name="n"), Sum("x", alias_name="sx"),
                   Sum("xx", alias_name="sxx"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    # w_i = N_i*sigma_i = isqrt(N*Sxx - Sx^2), exact
    ws = [math.isqrt(max(0, int(r["n"]) * int(r["sxx"])
                         - int(r["sx"]) ** 2)) for _, r in per.iterrows()]
    wtot = sum(ws)
    base = [_BUDGET * w // wtot for w in ws]
    rem = [_BUDGET * w % wtot for w in ws]
    left = _BUDGET - sum(base)
    order = sorted(range(len(ws)),
                   key=lambda i: (-rem[i], str(per["source"].iloc[i])))
    extra = set(order[:left])
    out = pd.DataFrame({
        "source": per["source"].astype(str),
        "n_docs": per["n"].astype("int64"),
        "weight": pd.Series(ws, dtype="int64"),
        "n_slots": pd.Series(
            [b + (1 if i in extra else 0) for i, b in enumerate(base)],
            dtype="int64"),
    }).sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_NEYMAN_ALLOCATION = f"""
WITH mom AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(n_chars AS BIGINT) * n_chars) AS BIGINT) AS sxx
  FROM documents GROUP BY 1
), d AS (
  -- HUGEINT: n*sxx crosses int64 past ~sf1
  SELECT source, n,
         greatest(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx, 0)
           AS q
  FROM mom
), isq AS (
  SELECT source, n, q,
         CAST(floor(sqrt(CAST(q AS DOUBLE))) AS HUGEINT) AS f
  FROM d
), w AS (
  SELECT source, n,
         f - (CASE WHEN f * f > q THEN 1 ELSE 0 END)
           + (CASE WHEN (f + 1) * (f + 1) <= q THEN 1 ELSE 0 END) AS weight
  FROM isq
), tot AS (SELECT sum(CAST(weight AS HUGEINT)) AS wt FROM w),
base AS (
  SELECT source, n, weight,
         CAST(CAST(weight AS HUGEINT) * {_BUDGET} // tot.wt AS BIGINT) AS b,
         CAST(CAST(weight AS HUGEINT) * {_BUDGET} % tot.wt AS BIGINT) AS r
  FROM w CROSS JOIN tot
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY r DESC, source) AS rk,
         {_BUDGET} - sum(b) OVER () AS leftover
  FROM base
)
SELECT source, n AS n_docs, CAST(weight AS BIGINT) AS weight,
       CAST(b + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS BIGINT)
         AS n_slots
FROM ranked
"""


_WARC_TS0 = 1_700_000_000_000_000


def warc_roundtrip_stats(sf_dir: str):
    """WARC round trip — the Common-Crawl wire format: documents become
    HTTP-response WARC records (payload = utf-8 text bytes; doc_id % 7 == 0
    rows carry status 404 for header diversity), sharded to .warc files,
    streamed back through WARCDatasource's REAL framing parser, and reduced
    per (source, http_status). The source and doc_id are recovered FROM THE
    PARSED URI, and byte sums come from the parsed bodies — a single
    mis-sliced Content-Length anywhere hashes wrong.

    Scale shape: write and read both stream shard-at-a-time; the aggregate
    is a bounded (source, status) groupby."""
    from ..sources.warcfiles import read_warc, write_warc_shards

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = f"/tmp/omni_ray_warc_{tag}"
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "url": ("https://" + df["source"].astype(str)
                    + ".example.com/doc/" + pd.Series(ids).astype(str)),
            "ts_us": _WARC_TS0 + ids,
            "payload": [
                (t or "").encode("utf-8") for t in df["text"]],
            "status": np.where(ids % 7 == 0, 404, 200),
        })

    write_warc_shards(
        ds.map_batches(_pd_arrow(prep), batch_format="pandas"),
        out_dir, "doc_id", n_shards=_N_SHARDS)

    back = read_warc(out_dir)

    def stats(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        src = [u.split("//")[1].split(".example.com")[0] for u in urls]
        ids = [int(u.rsplit("/", 1)[1]) for u in urls]
        return pa.table({
            "source": pa.array(src, pa.string()),
            "http_status": pc.cast(t["http_status"], pa.int64()),
            "payload_bytes": pa.array(
                [len(p) for p in t["payload"].to_pylist()], pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        })

    out = (
        back.map_batches(stats, batch_format="pyarrow")
        .groupby(["source", "http_status"])
        .aggregate(Count(alias_name="n_records"),
                   Sum("payload_bytes", alias_name="sum_bytes"),
                   Sum("doc_id", alias_name="sum_ids"))
        .to_pandas().sort_values(["source", "http_status"])
        .reset_index(drop=True)
    )
    for c in ("http_status", "n_records", "sum_bytes", "sum_ids"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_WARC_ROUNDTRIP = """
SELECT source,
       CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS BIGINT)
         AS http_status,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(octet_length(encode(coalesce(text, '')))) AS BIGINT)
         AS sum_bytes,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM documents
GROUP BY 1, 2
"""


INTEROP_REGISTRY = {
    "csv_roundtrip_stats": (csv_roundtrip_stats, _SQL_ROUNDTRIP),
    "jsonl_roundtrip_stats": (jsonl_roundtrip_stats, _SQL_ROUNDTRIP),
    "neyman_allocation": (neyman_allocation, SQL_NEYMAN_ALLOCATION),
    "warc_roundtrip_stats": (warc_roundtrip_stats, SQL_WARC_ROUNDTRIP),
}
