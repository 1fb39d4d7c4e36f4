"""WARC/1.0 source + sharded sink — the web-archive format Common Crawl
ships (the reference consumes CC-style pages; WARC is their wire form).
Stdlib-only and REAL: records carry proper WARC headers with CRLF framing
and Content-Length-delimited blocks wrapping an HTTP/1.1 response (status
line + headers + body), and the reader parses that framing byte-for-byte —
slicing by Content-Length, never splitting on sentinels, so binary bodies
containing 'WARC/1.0' are handled correctly.

Reader: ``WARCDatasource`` streams through Ray Data's FileBasedDatasource
extension point (one read task per file, record-batched), like the ORC
path in sources/orcfiles.py. Writer: ``write_warc_shards`` — deterministic
``shard = key % n_shards`` layout, tmp + os.replace atomic, sorted inside
a shard, so re-runs are byte-identical and a killed run leaves only whole
shards (the sinks/partitioned.py discipline).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data
from ray.data.datasource import FileBasedDatasource

_CRLF = b"\r\n"


def build_warc_record(url: str, ts_us: int, payload: bytes,
                      status: int = 200,
                      content_type: str = "text/html") -> bytes:
    """One WARC/1.0 response record wrapping an HTTP/1.1 response."""
    import datetime

    iso = datetime.datetime.utcfromtimestamp(ts_us / 1e6).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    http = (f"HTTP/1.1 {status} OK".encode() + _CRLF
            + f"Content-Type: {content_type}".encode() + _CRLF
            + f"Content-Length: {len(payload)}".encode() + _CRLF
            + _CRLF + payload)
    head = (b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + f"WARC-Target-URI: {url}".encode() + _CRLF
            + f"WARC-Date: {iso}".encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response" + _CRLF
            + f"Content-Length: {len(http)}".encode() + _CRLF
            + _CRLF)
    return head + http + _CRLF + _CRLF


def parse_warc_stream(data: bytes):
    """Yield (warc_headers: dict, http_status: int, http_headers: dict,
    body: bytes) per record. Content-Length framing end-to-end; raises
    ValueError on malformed records."""
    i, n = 0, len(data)
    while i < n:
        # skip inter-record CRLFs
        while i < n and data[i:i + 2] == _CRLF:
            i += 2
        if i >= n:
            return
        if data[i:i + 8] != b"WARC/1.0":
            raise ValueError(f"bad WARC version at offset {i}")
        hdr_end = data.index(_CRLF + _CRLF, i)
        headers = {}
        for line in data[i:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers["Content-Length"])
        block = data[hdr_end + 4:hdr_end + 4 + length]
        if len(block) != length:
            raise ValueError("truncated WARC block")
        # HTTP response inside the block
        http_hdr_end = block.index(_CRLF + _CRLF)
        lines = block[:http_hdr_end].split(_CRLF)
        status = int(lines[0].split()[1])
        http_headers = {}
        for line in lines[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            http_headers[k.strip()] = v.strip()
        body = block[http_hdr_end + 4:]
        clen = int(http_headers.get("Content-Length", len(body)))
        if len(body) != clen:
            raise ValueError("HTTP body length mismatch")
        yield headers, status, http_headers, body
        i = hdr_end + 4 + length


def build_cdx(data: bytes) -> list[tuple[str, int, int]]:
    """CDX-style index of a WARC byte stream: (target_uri, offset, length)
    per record, by REAL byte walking — offset is where 'WARC/1.0' starts,
    length spans through the record's trailing CRLF CRLF (the Common Crawl
    cdx(j) contract: offset+length slices one complete record out of the
    .warc). Content-Length framing only; never splits on sentinels."""
    out = []
    i, n = 0, len(data)
    while i < n:
        while i < n and data[i:i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        start = i
        if data[i:i + 8] != b"WARC/1.0":
            raise ValueError(f"bad WARC version at offset {i}")
        hdr_end = data.index(_CRLF + _CRLF, i)
        headers = {}
        for line in data[i:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers["Content-Length"])
        end = hdr_end + 4 + length + 4  # block + trailing CRLF CRLF
        out.append((headers.get("WARC-Target-URI", ""), start, end - start))
        i = end
    return out


class WARCDatasource(FileBasedDatasource):
    """Streaming WARC reader: one Ray task per file; each record becomes a
    row (url, warc_date, http_status, content_type, payload)."""

    _FILE_EXTENSIONS = ["warc"]

    def _read_stream(self, f: "pa.NativeFile", path: str):
        data = f.readall()
        urls, dates, stats, ctypes, bodies = [], [], [], [], []
        for headers, status, http_headers, body in parse_warc_stream(data):
            urls.append(headers.get("WARC-Target-URI", ""))
            dates.append(headers.get("WARC-Date", ""))
            stats.append(status)
            ctypes.append(http_headers.get("Content-Type", ""))
            bodies.append(body)
        yield pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_date": pa.array(dates, pa.string()),
            "http_status": pa.array(stats, pa.int32()),
            "content_type": pa.array(ctypes, pa.string()),
            "payload": pa.array(bodies, pa.binary()),
        }).replace_schema_metadata(None)


def read_warc(paths, **kwargs) -> ray.data.Dataset:
    kwargs.setdefault("file_extensions", WARCDatasource._FILE_EXTENSIONS)
    return ray.data.read_datasource(WARCDatasource(paths, **kwargs))


def write_warc_shards(ds: ray.data.Dataset, out_dir: str, key_col: str,
                      n_shards: int = 16) -> int:
    """``ds`` rows (url, ts_us, payload, [status, content_type]) →
    ``out_dir/shard-XXXX.warc``, sharded by ``key_col % n_shards``."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..pipelines.queries import _pd_arrow

    os.makedirs(out_dir, exist_ok=True)

    def add_shard(t: pa.Table) -> pa.Table:
        sh = pc.cast(pc.bit_wise_and(pc.cast(t[key_col], pa.int64()),
                                     n_shards - 1)
                     if (n_shards & (n_shards - 1)) == 0 else
                     pc.subtract(pc.cast(t[key_col], pa.int64()),
                                 pc.multiply(pc.divide(pc.cast(t[key_col],
                                                               pa.int64()),
                                                       n_shards),
                                             n_shards)),
                     pa.int32())
        return t.append_column("_shard", sh)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["_shard"].iloc[0])
        g = g.sort_values(key_col)
        tmp = os.path.join(out_dir, f".shard-{shard:04d}.warc.tmp")
        with open(tmp, "wb") as f:
            for _, r in g.iterrows():
                st = int(r["status"]) if "status" in g.columns else 200
                ct = (str(r["content_type"]) if "content_type" in g.columns
                      else "text/html")
                f.write(build_warc_record(str(r["url"]), int(r["ts_us"]),
                                          bytes(r["payload"]), st, ct))
        os.replace(tmp, os.path.join(out_dir, f"shard-{shard:04d}.warc"))
        return pd.DataFrame({"shard": [shard], "n_rows": [len(g)]})

    manifest = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(_pd_arrow(write_group), batch_format="pandas")
        .to_pandas()
    )
    return len(manifest)
