"""Crawl-loop conformance tests (BASELINE.md targets):
  * crawl ordering == single-process oracle of reference semantics
  * final URL-seen set == oracle's md5 set
  * resume after kill-at-wave-k produces identical outputs
  * robots gating counts blocked urls
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.functions.canonical import canonicalize_url, host_of, md5_hex
from omni_ray.pipelines.frontier import reference_oracle_schedule


def _seed_frame(pages_dir):
    seeds = pq.read_table(f"{pages_dir}/seeds.parquet").to_pandas()
    seeds["canonical_url"] = seeds["url"].map(canonicalize_url)
    seeds["host"] = seeds["canonical_url"].map(host_of)
    seeds["url_hash"] = seeds["canonical_url"].map(md5_hex)
    return seeds


def _run(pages_dir, out_dir, **kw):
    from omni_ray.pipelines.crawl import run_crawl

    return run_crawl(
        pages_dir=f"{pages_dir}/pages",
        seeds_path=f"{pages_dir}/seeds.parquet",
        out_dir=out_dir,
        n_buckets=8,
        n_seen_shards=2,
        **kw,
    )


def _all_schedules(out_dir) -> pd.DataFrame:
    """Read per-wave schedules in either layout: single schedule.parquet with
    a crawl_order column (driver mode) or a sorted-parts schedule/ directory
    where crawl_order = row position in filename order (distributed mode)."""
    frames = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("epoch="):
            continue
        p1 = os.path.join(out_dir, d, "schedule.parquet")
        p2 = os.path.join(out_dir, d, "schedule")
        if os.path.exists(p1):
            f = pq.read_table(p1).to_pandas()
        elif os.path.isdir(p2):
            parts = sorted(
                os.path.join(p2, f) for f in os.listdir(p2) if f.endswith(".parquet")
            )
            f = pd.concat([pq.read_table(fp).to_pandas() for fp in parts],
                          ignore_index=True)
            f["crawl_order"] = range(len(f))
        else:
            continue
        f["wave"] = int(d.split("=")[1])
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    out = out.sort_values(["wave", "crawl_order"], kind="mergesort").reset_index(drop=True)
    out["global_order"] = range(len(out))
    return out


@pytest.mark.usefixtures("ray_session")
def test_unbounded_budget_matches_reference_order(pages_dir, tmp_path):
    out_dir = str(tmp_path / "crawl_unbounded")
    totals = _run(pages_dir, out_dir, budget_per_host=None)
    assert totals["waves"] == 1

    sched = _all_schedules(out_dir)
    oracle = reference_oracle_schedule(_seed_frame(pages_dir), budget_per_host=None)
    # identical crawl order (url sequence) and identical URL-seen set
    assert sched["url"].tolist() == oracle["url"].tolist()
    assert set(sched["url_hash"]) == set(oracle["url_hash"])
    # fetched + missed == scheduled
    assert totals["fetched"] + totals["fetch_missed"] == len(sched)
    assert totals["seen_total"] == len(oracle)


@pytest.mark.usefixtures("ray_session")
def test_budgeted_waves_match_oracle(pages_dir, tmp_path):
    out_dir = str(tmp_path / "crawl_budget")
    totals = _run(pages_dir, out_dir, budget_per_host=5)
    assert totals["waves"] > 1

    sched = _all_schedules(out_dir)
    oracle = reference_oracle_schedule(_seed_frame(pages_dir), budget_per_host=5)
    assert sched["url"].tolist() == oracle["url"].tolist()
    # politeness invariant: ≤5 urls per host per wave
    per = sched.groupby(["wave", "host"]).size()
    assert per.max() <= 5
    assert set(sched["url_hash"]) == set(oracle["url_hash"])


@pytest.mark.usefixtures("ray_session")
def test_deferred_snapshot_is_pre_ranked(pages_dir, tmp_path):
    """The distributed deferred snapshot must carry a fully non-null
    host_rank column — the trigger for the incremental-frontier fast path
    (waves after the first split on rank comparison alone, no seen-shard
    round-trips, no host shuffle). A regression that drops the column would
    silently fall back to the full re-annotate path; this pins it."""
    import pyarrow.parquet as pq

    out_dir = str(tmp_path / "crawl_preranked")
    _run(pages_dir, out_dir, budget_per_host=5, max_waves=1)
    fdir = os.path.join(out_dir, "epoch=0000", "frontier_next")
    parts = [f for f in os.listdir(fdir) if f.endswith(".parquet")]
    assert parts
    t = pq.read_table(fdir)
    assert t.num_rows > 0  # budget 5 defers most of the seed list
    assert "host_rank" in t.column_names
    assert t.column("host_rank").null_count == 0
    # shifted ranks restart at 0 for every host (what a full recompute
    # would assign), so each host's minimum deferred rank must be 0
    df = t.select(["host", "host_rank"]).to_pandas()
    assert (df.groupby("host")["host_rank"].min() == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_resume_after_kill_produces_identical_outputs(pages_dir, tmp_path):
    full_dir = str(tmp_path / "crawl_full")
    _run(pages_dir, full_dir, budget_per_host=5)
    full_sched = _all_schedules(full_dir)

    # run 1: killed after wave 0 (max_waves=1), run 2: resume to completion
    part_dir = str(tmp_path / "crawl_part")
    _run(pages_dir, part_dir, budget_per_host=5, max_waves=1)
    assert os.path.exists(os.path.join(part_dir, "epoch=0000", "_COMPLETE"))
    _run(pages_dir, part_dir, budget_per_host=5, resume=True)
    part_sched = _all_schedules(part_dir)

    assert part_sched["url"].tolist() == full_sched["url"].tolist()
    assert part_sched["wave"].tolist() == full_sched["wave"].tolist()
    # article outputs of epoch 1+ identical row sets
    def articles(d):
        ids = []
        for e in sorted(os.listdir(d)):
            p = os.path.join(d, e, "articles")
            if os.path.isdir(p):
                import ray.data

                ids.extend(
                    r["article_id"] for r in ray.data.read_parquet(p).select_columns(["article_id"]).take_all()
                )
        return sorted(ids)

    assert articles(part_dir) == articles(full_dir)


@pytest.mark.usefixtures("ray_session")
def test_robots_gating(pages_dir, tmp_path):
    seeds = _seed_frame(pages_dir)
    # block /sport/ on the busiest host
    host = seeds["host"].value_counts().index[0]
    robots_map = {host: "User-agent: *\nDisallow: /sport/\n"}
    blocked_expected = len(
        seeds.drop_duplicates("url_hash")[
            (seeds["host"] == host) & seeds["canonical_url"].str.contains("/sport/")
        ]
    )
    out_dir = str(tmp_path / "crawl_robots")
    totals = _run(
        pages_dir, out_dir, budget_per_host=None,
        robots_map=robots_map, respect_robots=True,
    )
    assert totals.get("robots_blocked", 0) == blocked_expected
    sched = _all_schedules(out_dir)
    assert not any(
        (h == host and "/sport/" in u) for h, u in zip(sched["host"], sched["url"])
    )


@pytest.mark.usefixtures("ray_session")
def test_distributed_frontier_equals_driver_mode(pages_dir, tmp_path):
    """The 10^10-scale regime: same scheduled sets per wave, same final
    URL-seen set, same stored articles as the driver-pandas path."""
    drv = str(tmp_path / "drv")
    dst = str(tmp_path / "dst")
    t1 = _run(pages_dir, drv, budget_per_host=7, distributed_frontier=False)
    t2 = _run(pages_dir, dst, budget_per_host=7, distributed_frontier=True)
    assert t1["seen_total"] == t2["seen_total"]
    assert t1["scheduled"] == t2["scheduled"]
    assert t1["waves"] == t2["waves"]

    def sched_sets(d):
        out = {}
        for e in sorted(os.listdir(d)):
            p = os.path.join(d, e)
            if not e.startswith("epoch="):
                continue
            f1 = os.path.join(p, "schedule.parquet")
            f2 = os.path.join(p, "schedule")
            if os.path.exists(f1):
                out[e] = set(pq.read_table(f1).column("url").to_pylist())
            elif os.path.isdir(f2):
                out[e] = set(pq.read_table(f2).column("url").to_pylist())
        return out

    s1, s2 = sched_sets(drv), sched_sets(dst)
    assert s1 == s2  # identical per-wave scheduled URL sets

    # distributed schedule order (sorted parts) equals driver crawl order
    import pandas as pd

    e0 = sorted(k for k in s1)[0]
    drv_order = pq.read_table(os.path.join(drv, e0, "schedule.parquet")).to_pandas()
    drv_order = drv_order.sort_values("crawl_order")["url"].tolist()
    parts = sorted(
        os.path.join(dst, e0, "schedule", f)
        for f in os.listdir(os.path.join(dst, e0, "schedule"))
        if f.endswith(".parquet")
    )
    dst_order = [u for f in parts for u in pq.read_table(f).column("url").to_pylist()]
    assert dst_order == drv_order

    def articles(d):
        import ray.data

        ids = []
        for e in sorted(os.listdir(d)):
            p = os.path.join(d, e, "articles")
            if os.path.isdir(p):
                ids.extend(r["article_id"] for r in ray.data.read_parquet(p)
                           .select_columns(["article_id"]).take_all())
        return sorted(ids)

    assert articles(drv) == articles(dst)


@pytest.mark.usefixtures("ray_session")
def test_hot_host_skew(tmp_path):
    """Skew guard: a frontier where ONE host owns ~70% of all urls must still
    respect per-wave politeness, match the oracle order, and terminate."""
    import pyarrow as pa

    from omni_ray.sources.pages import write_pages_dataset

    base = str(tmp_path / "skewpages")
    write_pages_dataset(base, n_rows=300, seed=55, n_buckets=8)
    # replace seeds: 70% hot host (bbc.com pages), rest long tail
    pages = pq.read_table(f"{base}/pages")
    urls = pages.column("url").to_pylist()
    hot = [u for u in urls if "bbc" in u]
    tail = [u for u in urls if "bbc" not in u][:60]
    seeds_urls = hot + tail
    base_ts = 1_700_000_000_000_000
    seeds = pa.table(
        {
            "url": pa.array(seeds_urls, pa.string()),
            "source": pa.array(["rss"] * len(seeds_urls), pa.string()),
            "priority": pa.array([10] * len(seeds_urls), pa.int32()),
            "depth": pa.array([0] * len(seeds_urls), pa.int32()),
            "discovery_ts": pa.array(
                [base_ts + i * 1_000_000 for i in range(len(seeds_urls))], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(seeds, f"{base}/skew_seeds.parquet")

    out_dir = str(tmp_path / "skewcrawl")
    from omni_ray.pipelines.crawl import run_crawl

    totals = run_crawl(
        pages_dir=f"{base}/pages", seeds_path=f"{base}/skew_seeds.parquet",
        out_dir=out_dir, budget_per_host=8, n_buckets=8, n_seen_shards=2,
    )
    sched = _all_schedules(out_dir)
    per = sched.groupby(["wave", "host"]).size()
    assert per.max() <= 8  # politeness holds under skew
    # the hot host drains across many waves; tail hosts finish in wave 0
    seeds_pdf = seeds.to_pandas()
    seeds_pdf["canonical_url"] = seeds_pdf["url"].map(canonicalize_url)
    seeds_pdf["host"] = seeds_pdf["canonical_url"].map(host_of)
    seeds_pdf["url_hash"] = seeds_pdf["canonical_url"].map(md5_hex)
    oracle = reference_oracle_schedule(seeds_pdf, budget_per_host=8)
    assert sched["url"].tolist() == oracle["url"].tolist()
    assert totals["seen_total"] == len(oracle)


@pytest.mark.usefixtures("ray_session")
def test_resume_clears_partial_epoch_dir(pages_dir, tmp_path):
    """A killed run can leave an epoch dir WITHOUT _COMPLETE but with partial
    part files (write_parquet appends); resume must clear it, not duplicate
    rows into it."""
    full_dir = str(tmp_path / "crawl_full2")
    _run(pages_dir, full_dir, budget_per_host=5)
    full_sched = _all_schedules(full_dir)

    crash_dir = str(tmp_path / "crawl_crash")
    # simulate a run killed mid-wave-0: partial article parts, no _COMPLETE
    ep0 = os.path.join(crash_dir, "epoch=0000")
    os.makedirs(os.path.join(ep0, "articles"), exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"article_id": pa.array(["stale-row"], pa.string())}),
        os.path.join(ep0, "articles", "part-stale.parquet"),
    )
    _run(pages_dir, crash_dir, budget_per_host=5, resume=True)
    crash_sched = _all_schedules(crash_dir)
    assert crash_sched["url"].tolist() == full_sched["url"].tolist()

    import ray.data

    ids = [
        r["article_id"]
        for r in ray.data.read_parquet(os.path.join(ep0, "articles"))
        .select_columns(["article_id"]).take_all()
    ]
    assert "stale-row" not in ids


@pytest.mark.usefixtures("ray_session")
def test_failed_epoch_completion_blocks_later_markers(pages_dir, tmp_path, monkeypatch):
    """If an epoch's background completion fails, no LATER epoch may gain a
    _COMPLETE marker — resume treats the last marker as closing a complete
    prefix."""
    import omni_ray.pipelines.articles as articles_mod

    real = articles_mod.entities_pipeline
    calls = {"n": 0}

    def flaky(ds):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected entities-write failure")
        return real(ds)

    monkeypatch.setattr(articles_mod, "entities_pipeline", flaky)
    out_dir = str(tmp_path / "crawl_poison")
    with pytest.raises(RuntimeError):
        _run(pages_dir, out_dir, budget_per_host=5)
    epochs = sorted(d for d in os.listdir(out_dir) if d.startswith("epoch="))
    complete = [d for d in epochs if os.path.exists(os.path.join(out_dir, d, "_COMPLETE"))]
    # wave 0's completion failed -> nothing may be marked complete
    assert complete == []
    # and a fresh-resume run recovers to the full-run schedule
    monkeypatch.setattr(articles_mod, "entities_pipeline", real)
    _run(pages_dir, out_dir, budget_per_host=5, resume=True)
    full_dir = str(tmp_path / "crawl_ref")
    _run(pages_dir, full_dir, budget_per_host=5)
    assert (_all_schedules(out_dir)["url"].tolist()
            == _all_schedules(full_dir)["url"].tolist())


@pytest.mark.usefixtures("ray_session")
def test_fetch_subbucket_pruning_equivalence(pages_dir):
    """The sub_bucket row-group filter must be invisible to results: a fine
    fetch task (n_fine > n_files) with pruning returns exactly the rows an
    unpruned url-only lookup returns, for every fine bucket incl. misses."""
    from omni_ray.pipelines.crawl import _FetchBucket
    from omni_ray.sources.pages import url_bucket

    pages = f"{pages_dir}/pages"
    assert os.path.exists(os.path.join(pages, "_PAGES_META.json"))
    seeds = pq.read_table(f"{pages_dir}/seeds.parquet").to_pandas()
    n_files, n_fine = 8, 32  # factor 4 — forces the sub filter on
    pruned = _FetchBucket(pages, n_files=n_files, n_fine=n_fine)
    assert pruned.n_sub is not None  # meta accepted, filter active
    plain = _FetchBucket(pages, n_files=n_files)
    seeds["bucket"] = seeds["url"].map(lambda u: url_bucket(u, n_fine))
    n_hits = 0
    for _, group in seeds.groupby("bucket"):
        at = pruned(group.reset_index(drop=True))
        bt = plain(group.reset_index(drop=True))
        # fetch returns Arrow with schema metadata stripped so downstream
        # block schemas stay hashable (pyarrow 16 hash(schema) raises on
        # schema-level metadata)
        assert at.schema.metadata is None and hash(at.schema) == hash(at.schema)
        a = at.to_pandas().sort_values("url")
        b = bt.to_pandas().sort_values("url")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )
        n_hits += int((a["http_status"] == 200).sum())
    assert n_hits > 0


@pytest.mark.usefixtures("ray_session")
def test_fetch_subbucket_meta_mismatch_falls_back(pages_dir, tmp_path):
    """A store whose sub granularity does not divide n_fine must disable the
    filter (correctness over pruning), not silently drop rows."""
    from omni_ray.pipelines.crawl import _FetchBucket

    pages = f"{pages_dir}/pages"
    # n_fine = 24 does not divide n_sub = 8*8 = 64 -> filter must stay off
    fb = _FetchBucket(pages, n_files=8, n_fine=24)
    assert fb.n_sub is None


def test_dedup_and_rank_schema_is_hashable():
    """Regression: map_groups(pandas) stage outputs must be Arrow tables with
    NO schema-level metadata — pyarrow 16's hash(schema) raises on schema
    metadata, which made every downstream articles-chain task log "Failed to
    hash the schemas" and defeated Ray's schema-unify fast path."""
    from omni_ray.pipelines.crawl import _dedup_and_rank

    df = pd.DataFrame({
        "url": [f"https://h{i % 2}.example.com/p{i}" for i in range(6)],
        "url_hash": [f"{i:032x}" for i in range(6)],
        "host": [f"h{i % 2}.example.com" for i in range(6)],
        "priority": pd.array([5, 4, 3, 2, 1, 0], dtype="int32"),
        "discovery_ts": pd.to_datetime("2026-01-01"),
        "seen": [False] * 6,
        "robots_allowed": [True] * 6,
    })
    t = _dedup_and_rank(df, 2)
    assert isinstance(t, pa.Table)
    assert t.schema.metadata is None
    hash(t.schema)  # must not raise
    got = t.to_pandas()
    assert int(got["scheduled"].sum()) == 4  # 2 hosts x budget 2
