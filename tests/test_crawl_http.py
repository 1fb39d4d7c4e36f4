"""run_crawl over the pluggable fetch seam (stages/fetchbackend.py wired
into the wave loop): the SAME crawl — schedules, lineage counters, stored
articles — whether pages come from the hash-bucketed parquet lookup
(default), a FetchStage pool over ParquetStoreBackend, or a FetchStage
pool fetching over REAL loopback HTTP (PagesHTTPServer, with page
metadata on X-Warc-Ts / X-Lang headers)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _run(pages_dir, out_dir, **kw):
    from omni_ray.pipelines.crawl import run_crawl

    return run_crawl(
        pages_dir=f"{pages_dir}/pages", seeds_path=f"{pages_dir}/seeds.parquet",
        out_dir=out_dir, n_buckets=8, n_seen_shards=2, budget_per_host=6, **kw,
    )


def _article_ids(out_dir):
    import ray.data

    ids = []
    for e in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, e, "articles")
        if os.path.isdir(p):
            ids.extend(r["article_id"] for r in ray.data.read_parquet(p)
                       .select_columns(["article_id"]).take_all())
    return sorted(ids)


def _sched_urls(out_dir):
    out = []
    for e in sorted(os.listdir(out_dir)):
        p1 = os.path.join(out_dir, e, "schedule.parquet")
        p2 = os.path.join(out_dir, e, "schedule")
        if os.path.exists(p1):
            out.extend(pq.read_table(p1).column("url").to_pylist())
        elif os.path.isdir(p2) and any(
                f.endswith(".parquet") for f in os.listdir(p2)):
            out.extend(pq.read_table(p2).column("url").to_pylist())
    return out


@pytest.mark.usefixtures("ray_session")
def test_crawl_identical_across_fetch_backends(pages_dir, tmp_path):
    from omni_ray.serve import PagesHTTPServer
    from omni_ray.stages.fetchbackend import (
        HttpBackend,
        ParquetStoreBackend,
        loopback_rewrite,
    )

    base_dir = str(tmp_path / "fb_default")
    t0 = _run(pages_dir, base_dir)

    store_dir = str(tmp_path / "fb_store")
    pages_path = f"{pages_dir}/pages"
    t1 = _run(pages_dir, store_dir,
              fetch_backend_factory=lambda: ParquetStoreBackend(pages_path, 8))

    srv = PagesHTTPServer(pages_path, 8).start()
    try:
        port = srv.port
        http_dir = str(tmp_path / "fb_http")
        t2 = _run(pages_dir, http_dir,
                  fetch_backend_factory=(
                      lambda: HttpBackend(url_rewrite=loopback_rewrite(port))),
                  fetch_timeout_s=10.0)
    finally:
        srv.stop()

    # identical frontier behavior and lineage across all three backends
    for k in ("waves", "scheduled", "seen_total", "fetched", "fetch_missed",
              "articles_stored"):
        assert t0[k] == t1[k] == t2[k], k
    assert t0["fetched"] > 0 and t0["fetch_missed"] > 0  # both paths real

    s0, s1, s2 = map(_sched_urls, (base_dir, store_dir, http_dir))
    assert s0 == s1 == s2

    a0, a1, a2 = map(_article_ids, (base_dir, store_dir, http_dir))
    assert a0 == a1 == a2
    assert len(a0) == t0["articles_stored"]


@pytest.mark.usefixtures("ray_session")
def test_continuous_robots_http_full_composition(pages_dir, tmp_path):
    """The maximal composition: CONTINUOUS crawl (mid-run RSS discovery via
    the real parser) + ROBOTS gating + fetching over REAL loopback HTTP —
    must equal the same run on the parquet-store path, bit for bit."""
    import pyarrow as pa

    from omni_ray.functions.canonical import canonicalize_url, host_of
    from omni_ray.pipelines.crawl import run_continuous
    from omni_ray.serve import PagesHTTPServer
    from omni_ray.stages.fetchbackend import HttpBackend, loopback_rewrite

    urls = sorted(pq.read_table(f"{pages_dir}/pages").column("url").to_pylist())
    seeds_urls, c1_urls = urls[:80], urls[80:140]
    # block a (host, section) that provably occurs in the selected slice
    u0 = canonicalize_url(seeds_urls[0])
    sect = "/" + u0.split("/", 3)[3].split("/")[0] + "/"
    robots_map = {host_of(u0): f"User-agent: *\nDisallow: {sect}\n"}

    seeds = pa.table({
        "url": pa.array(seeds_urls, pa.string()),
        "source": pa.array(["rss"] * len(seeds_urls), pa.string()),
        "priority": pa.array([10] * len(seeds_urls), pa.int32()),
        "depth": pa.array([0] * len(seeds_urls), pa.int32()),
        "discovery_ts": pa.array(
            [1_700_000_000_000_000 + i * 1_000_000
             for i in range(len(seeds_urls))], pa.timestamp("us")),
    })
    seeds_path = str(tmp_path / "comp_seeds.parquet")
    pq.write_table(seeds, seeds_path)

    body = "<rss><channel>" + "".join(
        f"<item><title>t</title><link>{u}</link></item>" for u in c1_urls
    ) + "</channel></rss>"

    def feeds_fn(cycle: int):
        if cycle == 1:
            return pa.table({
                "feed_url": pa.array(["https://f.test/feed"], pa.string()),
                "kind": pa.array(["rss"], pa.string()),
                "body": pa.array([body], pa.string()),
                "feed_seq": pa.array([900], pa.int64()),
            })
        return None if cycle > 1 else pa.table({
            "feed_url": pa.array([], pa.string()),
            "kind": pa.array([], pa.string()),
            "body": pa.array([], pa.string()),
            "feed_seq": pa.array([], pa.int64()),
        })

    def run(out_dir, factory):
        return run_continuous(
            pages_dir=f"{pages_dir}/pages", seeds_path=seeds_path,
            out_dir=out_dir, feeds_fn=feeds_fn, cycles=40,
            budget_per_host=4, n_buckets=8, n_seen_shards=2,
            robots_map=robots_map, respect_robots=True,
            fetch_backend_factory=factory,
        )

    t_store = run(str(tmp_path / "comp_store"), None)

    srv = PagesHTTPServer(f"{pages_dir}/pages", 8).start()
    try:
        port = srv.port
        t_http = run(str(tmp_path / "comp_http"),
                     lambda: HttpBackend(url_rewrite=loopback_rewrite(port)))
    finally:
        srv.stop()

    for k in ("waves", "scheduled", "seen_total", "discovered",
              "robots_blocked", "fetched", "fetch_missed", "articles_stored"):
        assert t_store[k] == t_http[k], k
    assert t_store["discovered"] == len(c1_urls)
    assert t_store["robots_blocked"] > 0

    s0 = _sched_urls(str(tmp_path / "comp_store"))
    s1 = _sched_urls(str(tmp_path / "comp_http"))
    assert s0 == s1
    assert _article_ids(str(tmp_path / "comp_store")) \
        == _article_ids(str(tmp_path / "comp_http"))
