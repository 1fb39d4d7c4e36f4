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
