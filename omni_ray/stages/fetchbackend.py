"""Pluggable fetch-backend seam for the crawl pipeline.

The reference fetches live over HTTP with per-request timeout and an
engine-fallback chain (src/crawler/simple_crawler.py:43-58 — requests with
timeout + UA; src/crawler/multi_engine_crawler.py:29-53 — try engines in
order until one yields usable content). In this sandbox the only lawful
"network" is the bucketed parquet pages store, so the crawl wires
``_FetchBucket`` directly; this module defines the INTERFACE that makes a
real network backend a drop-in:

  * ``FetchBackend.fetch_one(url, timeout_s)`` → ``FetchResult`` — one
    engine. Implementations: ``ParquetStoreBackend`` (the sandbox "network":
    url-keyed lookup in one bucket file) and, on a real deployment, an
    aiohttp/requests backend with the same signature.
  * ``FallbackChainBackend`` — the multi-engine chain: first engine whose
    result is usable (status 200 + non-empty html) wins; timeouts and errors
    fall through; the winning engine's name is recorded per row
    (multi_engine_crawler.py:29-53 semantics).
  * ``FetchStage`` — the map_batches actor body: backends are built ONCE per
    actor in ``__init__`` (connection pools / file handles are actor state,
    never per batch), batches are grouped per host and capped by the
    politeness budget (rows over budget come back ``deferred=True`` for the
    frontier to requeue — the per-host budget contract of
    pipelines/frontier.py), and every row gets (http_status, html, engine,
    deferred) columns.

Scale shape: the stage is stateless across batches apart from backend
handles, so it runs as a plain actor pool at any concurrency; politeness is
enforced per (host, batch) against the same budget the frontier schedules
with, so no cross-actor coordination is needed — the frontier already
guarantees a host's rows land in the same wave slice.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class FetchResult:
    url: str
    status: int          # HTTP-shaped: 200 ok, 404 miss, 408 timeout, 599 error
    html: bytes | None
    engine: str
    elapsed_ms: float
    # page metadata the article chain consumes (warc_ts µs, lang, ...);
    # store-backed engines read it off the row, HTTP engines off response
    # headers (X-Warc-Ts / X-Lang from PagesHTTPServer)
    meta: dict | None = None


class FetchTimeout(Exception):
    """Raised by a backend when the fetch exceeded timeout_s."""


class FetchBackend:
    """One fetch engine. Subclasses implement ``fetch_one``; ``name`` labels
    the engine in per-row lineage."""

    name = "base"

    def fetch_one(self, url: str, timeout_s: float) -> FetchResult:
        raise NotImplementedError


class ParquetStoreBackend(FetchBackend):
    """The sandbox 'network': url-keyed lookup in the hash-bucketed pages
    store (one bucket file per md5 bucket — sources/pages.py layout). Opens
    nothing until first use; caches per-bucket url→html maps for the
    lifetime of the actor that holds it."""

    name = "store"

    def __init__(self, pages_dir: str, n_files: int):
        self.pages_dir = pages_dir
        self.n_files = n_files
        self._cache: dict[int, dict[str, bytes]] = {}

    def _bucket_map(self, bucket: int) -> dict[str, tuple]:
        if bucket not in self._cache:
            path = os.path.join(self.pages_dir, f"bucket-{bucket:04d}.parquet")
            m: dict[str, tuple] = {}
            if os.path.exists(path):
                cols = ["url", "html"]
                avail = pq.read_schema(path).names
                extra = [c for c in ("warc_ts", "lang") if c in avail]
                t = pq.read_table(path, columns=cols + extra)
                ts = (t.column("warc_ts").cast("int64").to_pylist()
                      if "warc_ts" in extra else [None] * t.num_rows)
                lg = (t.column("lang").to_pylist() if "lang" in extra
                      else [None] * t.num_rows)
                for u, h, w, l in zip(t.column("url").to_pylist(),
                                      t.column("html").to_pylist(), ts, lg):
                    if h is not None:
                        m[u] = (h if isinstance(h, bytes) else str(h).encode(),
                                w, l)
            self._cache[bucket] = m
        return self._cache[bucket]

    def fetch_one(self, url: str, timeout_s: float) -> FetchResult:
        from ..sources.pages import url_bucket

        t0 = time.perf_counter()
        row = self._bucket_map(url_bucket(url, self.n_files)).get(url)
        ms = (time.perf_counter() - t0) * 1000.0
        if row is None:
            return FetchResult(url, 404, None, self.name, ms)
        html, warc_ts, lang = row
        return FetchResult(url, 200, html, self.name, ms,
                           meta={"warc_ts": warc_ts, "lang": lang})


def _meta_from_headers(headers) -> dict | None:
    """Page metadata carried on response headers (PagesHTTPServer sends the
    store row's warc_ts/lang as X-Warc-Ts / X-Lang; a production mirror
    would do the same or the crawl stamps fetch time)."""
    meta = {}
    wt = headers.get("X-Warc-Ts")
    if wt:
        try:
            meta["warc_ts"] = int(wt)
        except ValueError:
            pass
    lg = headers.get("X-Lang")
    if lg:
        meta["lang"] = lg
    return meta or None


def loopback_rewrite(port: int):
    """url_rewrite for HttpBackend against a PagesHTTPServer on ``port``.
    Module-level (captures only the int) so FetchStage actor pools can
    serialize it — PagesHTTPServer.rewrite itself holds the live socket."""
    from urllib.parse import quote

    def rw(url: str) -> str:
        return f"http://127.0.0.1:{port}/page?url={quote(url, safe='')}"

    return rw


class HttpBackend(FetchBackend):
    """REAL network engine over stdlib urllib — the production body behind
    the seam (reference simple_crawler.py:43-58: requests.get with
    per-request timeout + User-Agent header). ``url_rewrite`` maps the
    logical page url to the transport url (a proxy/mirror seam: identity in
    production, the loopback PagesHTTPServer in-sandbox so socket/timeout
    semantics are exercised for real).

    Timeout → FetchTimeout (so FallbackChainBackend falls through, shaped
    408 if terminal); HTTP error status → FetchResult with that status and
    html=None (a 404 is an answer, not an engine failure); connection-level
    errors raise (the chain shapes them 599)."""

    name = "http"

    def __init__(self, user_agent: str = "omni-ray/1.0", url_rewrite=None):
        self.user_agent = user_agent
        self.url_rewrite = url_rewrite

    def fetch_one(self, url: str, timeout_s: float) -> FetchResult:
        import socket
        import urllib.error
        import urllib.request

        target = self.url_rewrite(url) if self.url_rewrite else url
        req = urllib.request.Request(
            target, headers={"User-Agent": self.user_agent})
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read()
                status = int(resp.status)
                meta = _meta_from_headers(resp.headers)
        except urllib.error.HTTPError as e:
            return FetchResult(url, int(e.code), None, self.name,
                               (time.perf_counter() - t0) * 1000.0)
        except (socket.timeout, TimeoutError) as e:
            raise FetchTimeout(url) from e
        except urllib.error.URLError as e:
            if isinstance(e.reason, (socket.timeout, TimeoutError)):
                raise FetchTimeout(url) from e
            raise
        return FetchResult(url, status, body, self.name,
                           (time.perf_counter() - t0) * 1000.0, meta=meta)


class CachingHttpBackend(HttpBackend):
    """HttpBackend + ETag revalidation cache (RFC 9110 conditional GET —
    the recrawl bandwidth saver a continuous crawler relies on): remembers
    (ETag, body) per url FOR THE LIFETIME OF THE ACTOR holding it; repeat
    fetches send If-None-Match, and a 304 serves the cached entity with
    zero body bytes on the wire. ``n_revalidated`` counts 304 hits (per
    actor — fold across the pool for lineage)."""

    name = "http"

    def __init__(self, user_agent: str = "omni-ray/1.0", url_rewrite=None):
        super().__init__(user_agent, url_rewrite)
        self.cache: dict[str, tuple[str, bytes, dict | None]] = {}
        self.n_revalidated = 0

    def fetch_one(self, url: str, timeout_s: float) -> FetchResult:
        import socket
        import urllib.error
        import urllib.request

        target = self.url_rewrite(url) if self.url_rewrite else url
        headers = {"User-Agent": self.user_agent}
        cached = self.cache.get(url)
        if cached:
            headers["If-None-Match"] = cached[0]
        req = urllib.request.Request(target, headers=headers)
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read()
                status = int(resp.status)
                etag = resp.headers.get("ETag")
                meta = _meta_from_headers(resp.headers)
        except urllib.error.HTTPError as e:
            if e.code == 304 and cached:
                self.n_revalidated += 1
                return FetchResult(url, 200, cached[1], self.name,
                                   (time.perf_counter() - t0) * 1000.0,
                                   meta=cached[2])
            return FetchResult(url, int(e.code), None, self.name,
                               (time.perf_counter() - t0) * 1000.0)
        except (socket.timeout, TimeoutError) as e:
            raise FetchTimeout(url) from e
        except urllib.error.URLError as e:
            if isinstance(e.reason, (socket.timeout, TimeoutError)):
                raise FetchTimeout(url) from e
            raise
        if status == 200 and etag:
            self.cache[url] = (etag, body, meta)
        return FetchResult(url, status, body, self.name,
                           (time.perf_counter() - t0) * 1000.0, meta=meta)


class ScriptedBackend(FetchBackend):
    """Deterministic fake-network engine for tests and dry runs: per-url
    scripted behavior — ``('ok', html)``, ``('timeout',)``, ``('error',)``,
    ``('empty',)`` — plus a default response for unscripted urls and a call
    log for asserting chain try-order. Lives in the library (not the test
    module) so Ray actor pools can deserialize it by module reference on any
    worker."""

    def __init__(self, name: str, script: dict | None = None,
                 default_html: bytes = b"<html>default</html>",
                 latency_ms: float = 1.0):
        self.name = name
        self.script = script or {}
        self.default_html = default_html
        self.latency_ms = latency_ms
        self.calls: list[str] = []

    def fetch_one(self, url: str, timeout_s: float) -> FetchResult:
        self.calls.append(url)
        action = self.script.get(url, ("ok", self.default_html))
        if action[0] == "timeout":
            raise FetchTimeout(url)
        if action[0] == "error":
            raise RuntimeError(f"scripted error for {url}")
        if action[0] == "empty":
            return FetchResult(url, 200, b"", self.name, self.latency_ms)
        return FetchResult(url, 200, action[1], self.name, self.latency_ms)


class FallbackChainBackend(FetchBackend):
    """multi_engine_crawler.py:29-53 semantics: engines tried in order; a
    result is USABLE iff status == 200 and html is non-empty; FetchTimeout
    and exceptions fall through to the next engine; if every engine fails
    the LAST failure is returned (timeout → 408, error → 599)."""

    name = "chain"

    def __init__(self, backends: list[FetchBackend]):
        if not backends:
            raise ValueError("FallbackChainBackend needs >= 1 backend")
        self.backends = backends

    def fetch_one(self, url: str, timeout_s: float) -> FetchResult:
        last: FetchResult | None = None
        for b in self.backends:
            try:
                r = b.fetch_one(url, timeout_s)
            except FetchTimeout:
                last = FetchResult(url, 408, None, b.name, timeout_s * 1000.0)
                continue
            except Exception:
                last = FetchResult(url, 599, None, b.name, 0.0)
                continue
            if r.status == 200 and r.html:
                return r
            last = r
        assert last is not None
        return last


class FetchStage:
    """map_batches actor body over url batches: per-host politeness cap +
    backend fetch, emitting (http_status, html, engine, elapsed_ms,
    deferred) columns. ``backend_factory`` runs in ``__init__`` — once per
    actor — so pools/caches are actor state (the actor-pool rule)."""

    def __init__(self, backend_factory, timeout_s: float = 10.0,
                 max_per_host: int | None = None):
        self.backend = backend_factory()
        self.timeout_s = timeout_s
        self.max_per_host = max_per_host

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        urls = batch["url"].tolist()
        hosts = batch["host"].tolist() if "host" in batch.columns else [
            u.split("/", 3)[2] if "://" in u else u for u in urls]
        taken: dict[str, int] = {}
        status, html, engine, elapsed, deferred = [], [], [], [], []
        warc_ts, lang = [], []
        for u, h in zip(urls, hosts):
            if self.max_per_host is not None:
                c = taken.get(h, 0)
                if c >= self.max_per_host:
                    status.append(0); html.append(None)
                    engine.append(""); elapsed.append(0.0)
                    deferred.append(True)
                    warc_ts.append(None); lang.append(None)
                    continue
                taken[h] = c + 1
            r = self.backend.fetch_one(u, self.timeout_s)
            status.append(r.status); html.append(r.html)
            engine.append(r.engine); elapsed.append(r.elapsed_ms)
            deferred.append(False)
            meta = r.meta or {}
            warc_ts.append(meta.get("warc_ts"))
            lang.append(meta.get("lang"))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "http_status": pa.array(status, pa.int32()),
            "html": pa.array(html, pa.binary()),
            "engine": pa.array(engine, pa.string()),
            "elapsed_ms": pa.array(elapsed, pa.float64()),
            "deferred": pa.array(deferred, pa.bool_()),
            # page metadata for the article chain (store rows / X- headers)
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "lang": pa.array(lang, pa.string()),
        })
