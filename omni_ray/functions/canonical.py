"""URL canonicalization + hashing (SURVEY.md M4, M5, M20, D1 keys).

Hash parity with the reference is load-bearing:
  * url_hash  = md5(url)              (url_discovery_engine.py:111 — Redis seen-set key)
  * article_id = f"article_{md5(url)[:8]}_{md5(content)[:8]}" (simple_crawler.py:134-143)
  * content_hash = sha256(title+content+url)  (enhanced_article.py:84-87)

Canonicalization (our addition, required by north_rule's "canonicalized+hashed
URLs"): lowercase scheme+host, strip ``www.``, drop default ports, drop
fragments, strip trailing slash on non-root paths. Deterministic and pure.

All batch functions are vectorized map_batches UDFs: hashing is hashlib per
row (no Arrow kernel exists), everything else stays in Arrow.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit, urlunsplit

import numpy as np
import pyarrow as pa


def _canon_and_host(url: str) -> tuple[str, str]:
    """One urlsplit per url: the canonical form's netloc IS the host key
    (lowercased, www/default-port-stripped), so computing both together
    halves the parse cost of the batch path below."""
    u = url.strip()
    try:
        parts = urlsplit(u)
    except ValueError:
        return u, host_of(u)
    scheme = parts.scheme.lower() or "http"
    host = parts.netloc.lower()
    if host.startswith("www."):
        host = host[4:]
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    return urlunsplit((scheme, host, path, parts.query, "")), host


def canonicalize_url(url: str) -> str:
    return _canon_and_host(url)[0]


def host_of(url: str) -> str:
    """netloc lowercased, www-stripped (simple_crawler.py:122-132) — the
    partitioning key for politeness + frontier shuffles."""
    try:
        host = urlsplit(url).netloc.lower()
    except ValueError:
        return ""
    return host[4:] if host.startswith("www.") else host


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def article_id(url: str, content: str) -> str:
    """simple_crawler.py:134-143 parity."""
    return f"article_{md5_hex(url)[:8]}_{md5_hex(content)[:8]}"


def content_hash(title: str, content: str, url: str) -> str:
    """enhanced_article.py:84-87 parity: sha256(title+content+url)."""
    return sha256_hex(f"{title}{content}{url}")


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append (or replace — idempotent) canonical_url, host, url_hash columns."""
    urls = batch.column(url_col).to_pylist()
    pairs = [_canon_and_host(u or "") for u in urls]
    canon = [p[0] for p in pairs]
    hosts = [p[1] for p in pairs]
    hashes = [md5_hex(c) for c in canon]
    for name, vals in (
        ("canonical_url", canon), ("host", hosts), ("url_hash", hashes)
    ):
        arr = pa.array(vals, pa.string())
        if name in batch.column_names:
            batch = batch.set_column(batch.column_names.index(name), name, arr)
        else:
            batch = batch.append_column(name, arr)
    return batch


def hash_partition_batch(batch: pa.Table, col: str, n: int, out: str = "shard") -> pa.Table:
    """Append ``out`` = int(md5-prefix of col) % n — the explicit hash-partition
    key used to route rows to filter shards / buckets."""
    vals = batch.column(col).to_pylist()
    shards = np.fromiter(
        (int(hashlib.md5((v or "").encode()).hexdigest()[:8], 16) % n for v in vals),
        dtype=np.int32,
        count=len(vals),
    )
    return batch.append_column(out, pa.array(shards, pa.int32()))
