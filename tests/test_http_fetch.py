"""HttpBackend over a real loopback HTTP server (VERDICT r4 item 2): the
urllib engine behind the fetch seam exercised against PagesHTTPServer
serving the parquet pages store — status/miss/timeout semantics, the
timeout → fallback chain, FetchStage politeness through a real actor pool,
and byte-identical article output vs ParquetStoreBackend on the same pages
(reference network surface: simple_crawler.py:43-58,
multi_engine_crawler.py:29-53)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from omni_ray.serve import PagesHTTPServer
from omni_ray.stages.fetchbackend import (
    FallbackChainBackend,
    FetchStage,
    FetchTimeout,
    HttpBackend,
    ParquetStoreBackend,
    loopback_rewrite,
)

N_FILES = 8


@pytest.fixture(scope="module")
def pages_urls(pages_dir):
    return sorted(pq.read_table(f"{pages_dir}/pages").column("url").to_pylist())


def test_http_backend_matches_store_bytes(pages_dir, pages_urls):
    srv = PagesHTTPServer(f"{pages_dir}/pages", N_FILES).start()
    try:
        http = HttpBackend(url_rewrite=loopback_rewrite(srv.port))
        store = ParquetStoreBackend(f"{pages_dir}/pages", N_FILES)
        for u in pages_urls[:20] + ["https://missing.example.org/nope"]:
            rh = http.fetch_one(u, timeout_s=5.0)
            rs = store.fetch_one(u, timeout_s=5.0)
            assert rh.status == rs.status, u
            assert rh.html == rs.html, u
            assert rh.engine == "http"
    finally:
        srv.stop()


def test_http_timeout_raises_and_chain_falls_back(pages_dir, pages_urls):
    slow = pages_urls[0]
    srv = PagesHTTPServer(f"{pages_dir}/pages", N_FILES,
                          delays={slow: 2.0}).start()
    try:
        http = HttpBackend(url_rewrite=loopback_rewrite(srv.port))
        # bare engine: read timeout surfaces as FetchTimeout
        with pytest.raises(FetchTimeout):
            http.fetch_one(slow, timeout_s=0.3)
        # chain: http times out, store serves the identical bytes
        store = ParquetStoreBackend(f"{pages_dir}/pages", N_FILES)
        chain = FallbackChainBackend([http, store])
        r = chain.fetch_one(slow, timeout_s=0.3)
        assert (r.engine, r.status) == ("store", 200)
        assert r.html == store.fetch_one(slow, 5.0).html
        # http-only chain: terminal timeout is shaped 408
        r408 = FallbackChainBackend([http]).fetch_one(slow, timeout_s=0.3)
        assert (r408.status, r408.html) == (408, None)
        # the fast path still goes over the wire
        fast = pages_urls[1]
        r = chain.fetch_one(fast, timeout_s=5.0)
        assert (r.engine, r.status) == ("http", 200)
    finally:
        srv.stop()


def test_http_connection_error_shapes_599():
    # nothing listens on the rewritten port -> connection refused -> chain 599
    http = HttpBackend(url_rewrite=loopback_rewrite(1))  # port 1: refused
    r = FallbackChainBackend([http]).fetch_one("https://x.test/a", timeout_s=1.0)
    assert (r.status, r.html) == (599, None)


@pytest.mark.usefixtures("ray_session")
def test_fetch_stage_http_actor_pool_byte_identical_articles(pages_dir, pages_urls):
    """FetchStage(HttpBackend) through a REAL map_batches actor pool +
    politeness budget, then the article pipeline: output must be
    byte-identical to the ParquetStoreBackend run on the same pages."""
    import ray.data

    from omni_ray.pipelines.articles import article_pipeline

    urls = pages_urls[:60]
    pages_meta = pq.read_table(
        f"{pages_dir}/pages", columns=["url", "warc_ts", "lang"]
    ).to_pandas().set_index("url")
    srv = PagesHTTPServer(f"{pages_dir}/pages", N_FILES).start()
    try:
        port = srv.port

        def run(factory):
            ds = ray.data.from_pandas(pd.DataFrame({
                "url": urls, "host": [u.split("/")[2] for u in urls]}))
            fetched = ds.map_batches(
                FetchStage,
                fn_constructor_kwargs={
                    "backend_factory": factory,
                    "timeout_s": 5.0,
                    "max_per_host": 1000,
                },
                batch_format="pandas", concurrency=2, batch_size=16,
            ).to_pandas()
            assert (fetched["http_status"] == 200).all()
            # attach store metadata (same on both sides) for the article chain
            fetched["warc_ts"] = fetched["url"].map(pages_meta["warc_ts"])
            fetched["lang"] = fetched["url"].map(pages_meta["lang"])
            arts = article_pipeline(
                ray.data.from_pandas(
                    fetched[["url", "warc_ts", "html", "lang"]]),
                gate_articles=False,
            ).to_pandas().sort_values("url").reset_index(drop=True)
            return fetched, arts

        f_http, a_http = run(
            lambda: HttpBackend(url_rewrite=loopback_rewrite(port)))
        f_store, a_store = run(
            lambda: ParquetStoreBackend(f"{pages_dir}/pages", N_FILES))

        assert (f_http["engine"] == "http").all()
        assert (f_store["engine"] == "store").all()
        # identical page bytes...
        assert f_http.set_index("url")["html"].to_dict() \
            == f_store.set_index("url")["html"].to_dict()
        # ...and byte-identical article output (41 columns, entity lists etc.)
        drop = [c for c in a_http.columns if a_http[c].dtype == object
                and a_http[c].map(lambda v: isinstance(v, (list, dict))).any()]
        pd.testing.assert_frame_equal(a_http.drop(columns=drop),
                                      a_store.drop(columns=drop))
        for c in drop:
            assert a_http[c].map(str).tolist() == a_store[c].map(str).tolist()
    finally:
        srv.stop()


def test_etag_revalidation_304(pages_dir, pages_urls):
    """RFC 9110 conditional GET over real loopback: the first fetch caches
    the ETag, the second revalidates with If-None-Match, the server answers
    304 with no body, and the backend serves the identical cached bytes."""
    from omni_ray.stages.fetchbackend import CachingHttpBackend

    srv = PagesHTTPServer(f"{pages_dir}/pages", N_FILES).start()
    try:
        http = CachingHttpBackend(url_rewrite=loopback_rewrite(srv.port))
        u = pages_urls[0]
        r1 = http.fetch_one(u, 5.0)
        assert r1.status == 200 and r1.html
        assert srv.n_not_modified == 0 and http.n_revalidated == 0
        r2 = http.fetch_one(u, 5.0)
        assert srv.n_not_modified == 1 and http.n_revalidated == 1
        assert r2.status == 200 and r2.html == r1.html  # cached entity
        # a different url is a fresh 200, not a revalidation
        r3 = http.fetch_one(pages_urls[1], 5.0)
        assert r3.status == 200 and srv.n_not_modified == 1
        # misses still 404 (no ETag involved)
        r4 = http.fetch_one("https://missing.example.org/x", 5.0)
        assert r4.status == 404
    finally:
        srv.stop()
