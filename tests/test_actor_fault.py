"""Actor fault injection (VERDICT r4 item 6): kill a SeenShard / RobotsShard
actor BETWEEN waves of a live crawl and assert the run fails LOUDLY (no
silent wrong schedule, no _COMPLETE marker past the fault) and that a
resume from the last complete epoch checkpoint reproduces the
uninterrupted run's schedule bit-identically. The existing resume tests
cover driver death; these cover actor death."""

import os

import pandas as pd  # noqa: F401 (fixture frames)
import pyarrow.parquet as pq
import pytest
import ray

from tests.test_crawl import _all_schedules


def _run(pages_dir, out_dir, **kw):
    from omni_ray.pipelines.crawl import run_crawl

    return run_crawl(
        pages_dir=f"{pages_dir}/pages", seeds_path=f"{pages_dir}/seeds.parquet",
        out_dir=out_dir, n_buckets=8, n_seen_shards=2, **kw,
    )


def _kill_at_wave(grab, wave_to_kill: int, which: str):
    """discover_fn that assassinates a shard actor at the top of a wave —
    between epochs, exactly when a node loss would surface at 100 TB."""
    import pyarrow as pa

    empty = pa.table({
        "url": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "priority": pa.array([], pa.int32()),
        "depth": pa.array([], pa.int32()),
        "discovery_ts": pa.array([], pa.timestamp("us")),
    })

    def fn(wave: int):
        if wave == wave_to_kill and grab:
            pool = grab[0]
            ray.kill(pool.shards[0], no_restart=True)
        return empty

    return fn


@pytest.mark.usefixtures("ray_session")
def test_seen_shard_death_fails_loudly_then_resumes_identical(
        pages_dir, tmp_path, monkeypatch):
    import omni_ray.pipelines.crawl as crawl_mod
    from omni_ray.state.filters import SeenSet

    full_dir = str(tmp_path / "fault_full")
    _run(pages_dir, full_dir, budget_per_host=5)
    full_sched = _all_schedules(full_dir)
    assert full_sched["wave"].max() >= 2  # the fault lands mid-run

    grab: list = []

    class GrabbingSeenSet(SeenSet):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            grab.append(self)

    monkeypatch.setattr(crawl_mod, "SeenSet", GrabbingSeenSet)
    out_dir = str(tmp_path / "fault_seen")
    # the ActorDiedError surfaces wrapped in a RayTaskError when the dead
    # shard is contacted from inside a Dataset map task — both are RayError
    with pytest.raises(ray.exceptions.RayError):
        _run(pages_dir, out_dir, budget_per_host=5,
             discover_fn=_kill_at_wave(grab, 2, "seen"))

    # loud failure left a contiguous complete prefix, nothing past the fault
    epochs = sorted(d for d in os.listdir(out_dir) if d.startswith("epoch="))
    complete = [d for d in epochs
                if os.path.exists(os.path.join(out_dir, d, "_COMPLETE"))]
    assert complete == [f"epoch={w:04d}" for w in range(len(complete))]
    assert len(complete) <= 2

    # resume restores shard state from the checkpoint: identical schedule
    monkeypatch.setattr(crawl_mod, "SeenSet", SeenSet)
    totals = _run(pages_dir, out_dir, budget_per_host=5, resume=True)
    got = _all_schedules(out_dir)
    assert got["url"].tolist() == full_sched["url"].tolist()
    assert got["wave"].tolist() == full_sched["wave"].tolist()
    assert totals["seen_total"] == full_sched["url_hash"].nunique()


@pytest.mark.usefixtures("ray_session")
def test_robots_shard_death_fails_loudly_then_resumes_identical(
        pages_dir, tmp_path, monkeypatch):
    import omni_ray.pipelines.crawl as crawl_mod
    from omni_ray.state.robots import RobotsCache

    seeds = pq.read_table(f"{pages_dir}/seeds.parquet").to_pandas()
    from omni_ray.functions.canonical import canonicalize_url, host_of

    hosts = seeds["url"].map(canonicalize_url).map(host_of)
    robots_map = {hosts.value_counts().index[0]: "User-agent: *\nDisallow: /sport/\n"}

    full_dir = str(tmp_path / "rfault_full")
    _run(pages_dir, full_dir, budget_per_host=5,
         robots_map=robots_map, respect_robots=True)
    full_sched = _all_schedules(full_dir)

    grab: list = []

    class GrabbingRobots(RobotsCache):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            grab.append(self)

    monkeypatch.setattr(crawl_mod, "RobotsCache", GrabbingRobots)
    out_dir = str(tmp_path / "rfault_out")
    with pytest.raises(ray.exceptions.RayError):
        _run(pages_dir, out_dir, budget_per_host=5,
             robots_map=robots_map, respect_robots=True,
             discover_fn=_kill_at_wave(grab, 1, "robots"))
    epochs_complete = [d for d in sorted(os.listdir(out_dir))
                       if d.startswith("epoch=")
                       and os.path.exists(os.path.join(out_dir, d, "_COMPLETE"))]
    assert epochs_complete == [f"epoch={w:04d}" for w in range(len(epochs_complete))]

    monkeypatch.setattr(crawl_mod, "RobotsCache", RobotsCache)
    _run(pages_dir, out_dir, budget_per_host=5,
         robots_map=robots_map, respect_robots=True, resume=True)
    got = _all_schedules(out_dir)
    assert got["url"].tolist() == full_sched["url"].tolist()
    assert got["wave"].tolist() == full_sched["wave"].tolist()
