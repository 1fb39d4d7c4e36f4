"""WARC CDX indexing (round 5, batch 90): write REAL WARC/1.0 shards from a
documents-derived page set (sources/warcfiles.write_warc_shards — CRLF
framing, Content-Length blocks), then build the Common-Crawl-style CDX
index by byte-walking each shard (warcfiles.build_cdx: (uri, offset,
length) such that offset+length slices one complete record), and census it
per shard.

The DuckDB twin re-derives every record's byte length FROM FIRST
PRINCIPLES — the framing arithmetic of build_warc_record:

    http_len   = 62 + digits(n) + n        (status line, Content-Type,
                                            Content-Length, blank, body)
    head_len   = 153 + len(url) + digits(http_len)
    record_len = head_len + http_len + 4   (trailing CRLF CRLF)

(n = utf-8 byte length of the payload; WARC-Date is always 20 chars) —
and offsets as within-shard prefix sums in the writer's order (sorted by
doc_id inside shard = doc_id % 8). A one-byte framing drift in writer OR
scanner changes file_bytes / sum_offsets and hashes wrong; the formula's
match to the real builder is additionally pinned byte-for-byte by pytest.

Scale shape: shard writes and CDX scans are one task per shard file (the
Common Crawl layout: index built per-warc, merged after); the census is
bounded (one row per shard).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

from .queries import _pd_arrow, _read

_N_SHARDS = 8
_BASE_TS = 1_700_000_000_000_000


def warc_cdx_census(sf_dir: str):
    import ray.data

    from ..sources.warcfiles import build_cdx, write_warc_shards

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "url": [f"https://w{i % 7}.example.org/doc/{i}" for i in ids],
            "ts_us": np.full(len(ids), _BASE_TS, dtype=np.int64),
            "payload": [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in df["text"]
            ],
        })

    out_dir = tempfile.mkdtemp(prefix="omni_ray_cdx_")
    write_warc_shards(
        ds.map_batches(_pd_arrow(prep), batch_format="pandas"),
        out_dir, key_col="doc_id", n_shards=_N_SHARDS,
    )

    shards = ray.data.from_items([
        {"path": os.path.join(out_dir, f)}
        for f in sorted(os.listdir(out_dir)) if f.endswith(".warc")
    ])

    def scan(t: pa.Table) -> pa.Table:
        rows = []
        for p in t["path"].to_pylist():
            with open(p, "rb") as f:
                data = f.read()
            idx = build_cdx(data)
            offs = np.array([o for _u, o, _l in idx], dtype=np.int64)
            lens = np.array([ln for _u, _o, ln in idx], dtype=np.int64)
            shard = int(os.path.basename(p)[6:10])
            # internal consistency: records tile the file exactly
            assert int(offs[-1] + lens[-1]) == len(data)
            rows.append((shard, len(idx), len(data),
                         int(offs.sum()), int(lens.max())))
        return pa.table({
            "shard": pa.array([r[0] for r in rows], pa.int64()),
            "n_records": pa.array([r[1] for r in rows], pa.int64()),
            "file_bytes": pa.array([r[2] for r in rows], pa.int64()),
            "sum_offsets": pa.array([r[3] for r in rows], pa.int64()),
            "max_record_len": pa.array([r[4] for r in rows], pa.int64()),
        })

    out = shards.map_batches(scan, batch_format="pyarrow").to_pandas() \
        .sort_values("shard").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_WARC_CDX_CENSUS = """
WITH recs AS (
  SELECT doc_id, doc_id % 8 AS shard,
         octet_length(encode(coalesce(text, ''))) AS n,
         length('https://w' || (doc_id % 7) || '.example.org/doc/' || doc_id)
           AS ulen
  FROM documents
), sized AS (
  SELECT doc_id, shard,
         62 + length(CAST(n AS VARCHAR)) + n AS http_len,
         ulen
  FROM recs
), rec_len AS (
  SELECT doc_id, shard,
         153 + ulen + length(CAST(http_len AS VARCHAR))
           + http_len + 4 AS rlen
  FROM sized
), offs AS (
  SELECT shard, rlen,
         sum(rlen) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - rlen AS off
  FROM rec_len
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(rlen) AS BIGINT) AS file_bytes,
       CAST(sum(off) AS BIGINT) AS sum_offsets,
       CAST(max(rlen) AS BIGINT) AS max_record_len
FROM offs
GROUP BY 1
ORDER BY 1
"""


CDXOPS_REGISTRY = {
    "warc_cdx_census": (warc_cdx_census, SQL_WARC_CDX_CENSUS),
}
