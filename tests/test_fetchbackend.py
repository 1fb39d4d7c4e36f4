"""FetchBackend seam: timeout/fallback chain semantics + the parquet-store
backend as the sandbox engine + FetchStage politeness deferral, run both
directly and through a real map_batches actor pool."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from omni_ray.stages.fetchbackend import (
    FallbackChainBackend,
    FetchStage,
    ParquetStoreBackend,
    ScriptedBackend as FakeNetworkBackend,
)


def test_fallback_chain_order_and_reasons():
    a = FakeNetworkBackend("engine_a", {
        "http://t/slow": ("timeout",),
        "http://t/err": ("error",),
        "http://t/empty": ("empty",),
    })
    b = FakeNetworkBackend("engine_b", {
        "http://t/slow": ("ok", b"<html>b-slow</html>"),
        "http://t/err": ("timeout",),
    })
    chain = FallbackChainBackend([a, b])

    # engine_a ok → b never called
    r = chain.fetch_one("http://t/fine", timeout_s=1.0)
    assert (r.engine, r.status) == ("engine_a", 200)
    assert "http://t/fine" not in b.calls

    # a times out → b answers
    r = chain.fetch_one("http://t/slow", timeout_s=1.0)
    assert (r.engine, r.status, r.html) == ("engine_b", 200, b"<html>b-slow</html>")

    # a errors, b times out → LAST failure wins, shaped as 408
    r = chain.fetch_one("http://t/err", timeout_s=1.0)
    assert (r.engine, r.status, r.html) == ("engine_b", 408, None)

    # empty 200 is NOT usable → falls through to b's default ok
    r = chain.fetch_one("http://t/empty", timeout_s=1.0)
    assert (r.engine, r.status) == ("engine_b", 200)

    # try order was a then b each time a failed
    assert a.calls.count("http://t/slow") == 1
    assert b.calls.count("http://t/slow") == 1


def test_parquet_store_backend(tmp_path):
    from omni_ray.sources.pages import url_bucket

    n_files = 4
    urls = [f"http://site{i}.test/page" for i in range(8)]
    rows = {}
    for u in urls:
        rows.setdefault(url_bucket(u, n_files), []).append(u)
    import pyarrow.parquet as pq
    for b, us in rows.items():
        pq.write_table(
            pa.table({"url": pa.array(us),
                      "html": pa.array([f"<html>{u}</html>".encode() for u in us],
                                       pa.binary())}),
            os.path.join(tmp_path, f"bucket-{b:04d}.parquet"))

    be = ParquetStoreBackend(str(tmp_path), n_files)
    for u in urls:
        r = be.fetch_one(u, timeout_s=1.0)
        assert (r.status, r.html) == (200, f"<html>{u}</html>".encode())
    miss = be.fetch_one("http://nowhere.test/x", timeout_s=1.0)
    assert (miss.status, miss.html) == (404, None)


def test_fetch_stage_politeness_and_chain():
    """Direct-call stage: per-host cap defers overflow rows; fallback chain
    lineage lands in the engine column."""
    a = FakeNetworkBackend("engine_a", {"http://h1.test/1": ("timeout",)})
    b = FakeNetworkBackend("engine_b", {})
    stage = FetchStage(lambda: FallbackChainBackend([a, b]),
                       timeout_s=1.0, max_per_host=2)
    batch = pd.DataFrame({
        "url": [f"http://h1.test/{i}" for i in range(4)]
        + ["http://h2.test/0"],
        "host": ["h1.test"] * 4 + ["h2.test"],
    })
    out = stage(batch).to_pandas()
    assert out["deferred"].tolist() == [False, False, True, True, False]
    # deferred rows untouched: no status, no engine
    assert out.loc[2, "http_status"] == 0 and out.loc[2, "engine"] == ""
    # h1's second url timed out on a, served by b; rest by a
    assert out.loc[0, "engine"] == "engine_a"
    assert out.loc[1, "engine"] == "engine_b"
    assert out.loc[4, "engine"] == "engine_a"
    assert all(out.loc[[0, 1, 4], "http_status"] == 200)


@pytest.mark.usefixtures("ray_session")
def test_fetch_stage_as_actor_pool():
    """The seam through a real Dataset: FetchStage as a map_batches actor
    class (backend built once per actor in __init__), politeness budget
    honored per batch."""
    import ray.data

    urls = [f"http://host{i % 3}.test/p{i}" for i in range(30)]
    ds = ray.data.from_pandas(pd.DataFrame({
        "url": urls, "host": [u.split("/")[2] for u in urls]}))
    out = ds.map_batches(
        FetchStage,
        fn_constructor_kwargs={
            "backend_factory": lambda: FakeNetworkBackend("engine_a", {}),
            "timeout_s": 1.0,
            "max_per_host": 100,
        },
        batch_format="pandas",
        concurrency=2,
        batch_size=8,
    ).to_pandas()
    assert len(out) == 30
    assert (out["http_status"] == 200).all()
    assert (out["engine"] == "engine_a").all()
    assert not out["deferred"].any()
