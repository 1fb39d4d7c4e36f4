"""Continuous-mode crawl conformance (reference flagship:
omni_orchestrator.py:209-245 run_continuous + per-cycle discovery,
url_discovery_engine.py:91-106):

  * feeds parsed by the REAL RSS/sitemap parsers mid-crawl, unioned into the
    live frontier; schedule + final seen-set == extended single-process oracle
  * re-discovered already-crawled urls dropped (seen anti-join), pending
    duplicates resolve first-wins
  * idle cycles (nothing deferred, nothing discovered) write no epoch but
    advance the cycle clock; crawl drains deferred work after feeds dry up
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.functions.canonical import canonicalize_url, host_of, md5_hex
from omni_ray.pipelines.frontier import reference_oracle_schedule_continuous
from tests.test_crawl import _all_schedules

BASE_TS_US = 1_700_000_000_000_000


def _rss_xml(urls: list[str]) -> str:
    items = "".join(
        f"<item><title>t{i}</title><link>{u}</link>"
        f"<pubDate>Mon, 01 Jan 2024 00:00:0{i % 10} GMT</pubDate></item>"
        for i, u in enumerate(urls)
    )
    return f"<rss><channel>{items}</channel></rss>"


def _sitemap_xml(urls: list[str]) -> str:
    body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return f'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{body}</urlset>'


def _feed_table(kind: str, body: str, seq: int) -> pa.Table:
    return pa.table(
        {
            "feed_url": pa.array([f"https://feeds.example.org/{kind}/{seq}"], pa.string()),
            "kind": pa.array([kind], pa.string()),
            "body": pa.array([body], pa.string()),
            "feed_seq": pa.array([seq], pa.int64()),
        }
    )


def _canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["canonical_url"] = df["url"].map(canonicalize_url)
    df["host"] = df["canonical_url"].map(host_of)
    df["url_hash"] = df["canonical_url"].map(md5_hex)
    return df


def _discovery_frame(urls: list[str], kind: str, seq: int) -> pd.DataFrame:
    """Independent hand-derivation of discover_batch's record contract:
    priority 10 rss / 5 sitemap, depth 0, ts = BASE + seq*1e6 + position."""
    prio = 10 if kind == "rss" else 5
    return _canon_frame(
        pd.DataFrame(
            {
                "url": urls,
                "source": kind,
                "priority": pd.array([prio] * len(urls), dtype="int32"),
                "depth": pd.array([0] * len(urls), dtype="int32"),
                "discovery_ts": pd.to_datetime(
                    [BASE_TS_US + seq * 1_000_000 + p for p in range(len(urls))],
                    unit="us",
                ),
            }
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_continuous_discovery_matches_extended_oracle(pages_dir, tmp_path):
    """Three discovery cycles landing mid-crawl: cycle 1 RSS (with re-discoveries
    of seed urls), cycle 2 sitemap (with re-discoveries of cycle-1 urls); then
    the frontier drains on the pre-ranked fast path. Schedule order, per-wave
    politeness, and the final seen set must equal the continuous oracle."""
    from omni_ray.pipelines.crawl import run_continuous

    pages = pq.read_table(f"{pages_dir}/pages").column("url").to_pylist()
    urls = sorted(pages)
    seeds_urls = urls[:120]
    c1_urls = urls[120:200] + seeds_urls[:10]   # 10 re-discoveries of seeds
    c2_urls = urls[200:280] + c1_urls[:10]      # 10 re-discoveries of cycle 1

    seeds = pa.table(
        {
            "url": pa.array(seeds_urls, pa.string()),
            "source": pa.array(["rss"] * len(seeds_urls), pa.string()),
            "priority": pa.array([10] * len(seeds_urls), pa.int32()),
            "depth": pa.array([0] * len(seeds_urls), pa.int32()),
            "discovery_ts": pa.array(
                [BASE_TS_US + i * 1_000_000 for i in range(len(seeds_urls))],
                pa.timestamp("us"),
            ),
        }
    )
    seeds_path = str(tmp_path / "cont_seeds.parquet")
    pq.write_table(seeds, seeds_path)

    feeds = {
        1: _feed_table("rss", _rss_xml(c1_urls), seq=500),
        2: _feed_table("sitemap", _sitemap_xml(c2_urls), seq=600),
    }

    def feeds_fn(cycle: int):
        if cycle in feeds:
            return feeds[cycle]
        if cycle == 0:
            return feeds[1].slice(0, 0)  # quiet first cycle: seeds only
        return None  # feed schedule exhausted -> drain and stop

    out_dir = str(tmp_path / "cont_out")
    totals = run_continuous(
        pages_dir=f"{pages_dir}/pages", seeds_path=seeds_path, out_dir=out_dir,
        feeds_fn=feeds_fn, cycles=50, budget_per_host=4,
        n_buckets=8, n_seen_shards=2,
    )

    oracle = reference_oracle_schedule_continuous(
        _canon_frame(seeds.to_pandas()),
        {
            1: _discovery_frame(c1_urls, "rss", 500),
            2: _discovery_frame(c2_urls, "sitemap", 600),
        },
        budget_per_host=4,
    )
    sched = _all_schedules(out_dir)
    assert totals["waves"] >= 3  # discoveries really landed mid-crawl
    assert sched["url"].tolist() == oracle["url"].tolist()
    assert sched["wave"].tolist() == oracle["wave"].tolist()
    assert set(sched["url_hash"]) == set(oracle["url_hash"])
    assert totals["seen_total"] == oracle["url_hash"].nunique()
    assert totals["discovered"] == len(c1_urls) + len(c2_urls)
    assert sched.groupby(["wave", "host"]).size().max() <= 4
    # cycle 1's discoveries cannot appear before wave 1
    c1_hashes = set(_discovery_frame(c1_urls, "rss", 500)["url_hash"])
    seed_hashes = set(_canon_frame(seeds.to_pandas())["url_hash"])
    first_seen = sched[sched["url_hash"].isin(c1_hashes - seed_hashes)]["wave"].min()
    assert first_seen >= 1


@pytest.mark.usefixtures("ray_session")
def test_continuous_idle_cycles_and_driver_mode_parity(pages_dir, tmp_path):
    """No seeds; discoveries at cycles 0 and 2 only, unbounded budget: cycle 1
    is idle (no epoch dir), cycle 2 schedules the second feed. Driver-pandas
    and distributed modes produce the same schedule."""
    from omni_ray.pipelines.crawl import run_continuous

    urls = sorted(pq.read_table(f"{pages_dir}/pages").column("url").to_pylist())
    a_urls, b_urls = urls[:40], urls[40:80]
    seeds_path = str(tmp_path / "empty_seeds.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "priority": pa.array([], pa.int32()),
                "depth": pa.array([], pa.int32()),
                "discovery_ts": pa.array([], pa.timestamp("us")),
            }
        ),
        seeds_path,
    )

    def feeds_fn(cycle: int):
        if cycle == 0:
            return _feed_table("rss", _rss_xml(a_urls), seq=100)
        if cycle == 2:
            return _feed_table("rss", _rss_xml(b_urls), seq=300)
        if cycle < 3:
            return _feed_table("rss", "", seq=0).slice(0, 0)  # quiet cycle
        return None

    results = {}
    for mode, dist in (("dist", True), ("drv", False)):
        out_dir = str(tmp_path / f"idle_{mode}")
        totals = run_continuous(
            pages_dir=f"{pages_dir}/pages", seeds_path=seeds_path,
            out_dir=out_dir, feeds_fn=feeds_fn, cycles=10,
            budget_per_host=None, n_buckets=8, n_seen_shards=2,
            distributed_frontier=dist,
        )
        epochs = sorted(d for d in os.listdir(out_dir) if d.startswith("epoch="))
        assert "epoch=0001" not in epochs  # idle cycle wrote no epoch
        assert "epoch=0000" in epochs and "epoch=0002" in epochs
        sched = _all_schedules(out_dir)
        assert set(sched.loc[sched["wave"] == 0, "url"]) == set(a_urls)
        assert set(sched.loc[sched["wave"] == 2, "url"]) == set(b_urls)
        results[mode] = (sched["url"].tolist(), sched["wave"].tolist(),
                         totals["seen_total"])

    assert results["dist"] == results["drv"]

    oracle = reference_oracle_schedule_continuous(
        _canon_frame(pq.read_table(seeds_path).to_pandas()),
        {0: _discovery_frame(a_urls, "rss", 100),
         2: _discovery_frame(b_urls, "rss", 300)},
        budget_per_host=None,
    )
    assert results["dist"][0] == oracle["url"].tolist()
    assert results["dist"][1] == oracle["wave"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_continuous_resume_mid_cycle(pages_dir, tmp_path):
    """Kill a continuous run after cycle 0 completes (max_waves=1), then
    resume with the SAME feed schedule: the resumed run polls discover_fn
    from the resumed wave and the combined outputs equal an uninterrupted
    run's — discovery state needs no checkpoint beyond the seen shards."""
    from omni_ray.pipelines.crawl import run_continuous

    urls = sorted(pq.read_table(f"{pages_dir}/pages").column("url").to_pylist())
    seeds_urls, c1, c2 = urls[:60], urls[60:110], urls[110:150]
    seeds = pa.table(
        {
            "url": pa.array(seeds_urls, pa.string()),
            "source": pa.array(["rss"] * len(seeds_urls), pa.string()),
            "priority": pa.array([10] * len(seeds_urls), pa.int32()),
            "depth": pa.array([0] * len(seeds_urls), pa.int32()),
            "discovery_ts": pa.array(
                [BASE_TS_US + i * 1_000_000 for i in range(len(seeds_urls))],
                pa.timestamp("us"),
            ),
        }
    )
    seeds_path = str(tmp_path / "res_seeds.parquet")
    pq.write_table(seeds, seeds_path)

    def feeds_fn(cycle: int):
        if cycle == 1:
            return _feed_table("rss", _rss_xml(c1), seq=800)
        if cycle == 2:
            return _feed_table("sitemap", _sitemap_xml(c2), seq=900)
        return None if cycle > 2 else _feed_table("rss", "", 0).slice(0, 0)

    kw = dict(pages_dir=f"{pages_dir}/pages", seeds_path=seeds_path,
              feeds_fn=feeds_fn, budget_per_host=5,
              n_buckets=8, n_seen_shards=2)

    full_dir = str(tmp_path / "res_full")
    run_continuous(out_dir=full_dir, cycles=50, **kw)
    full_sched = _all_schedules(full_dir)

    part_dir = str(tmp_path / "res_part")
    run_continuous(out_dir=part_dir, cycles=1, **kw)   # killed after cycle 0
    assert os.path.exists(os.path.join(part_dir, "epoch=0000", "_COMPLETE"))
    run_continuous(out_dir=part_dir, cycles=50, **kw)  # resume
    part_sched = _all_schedules(part_dir)

    assert part_sched["url"].tolist() == full_sched["url"].tolist()
    assert part_sched["wave"].tolist() == full_sched["wave"].tolist()
