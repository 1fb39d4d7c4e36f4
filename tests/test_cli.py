"""CLI surface (python -m omni_ray ...): crawl, continuous, query, export
driven as real subprocesses — the switch-over entry points a reference user
runs (omni_orchestrator.py run_once/run_continuous, exporter scripts)."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    return subprocess.run(
        [sys.executable, "-m", "omni_ray", "--num-cpus", "4", *args],
        capture_output=True, text=True, cwd=REPO, timeout=timeout,
    )


@pytest.mark.usefixtures("ray_session")
def test_cli_crawl_and_export(pages_dir, tmp_path):
    out_dir = str(tmp_path / "cli_crawl")
    r = _run(["crawl", "--pages", f"{pages_dir}/pages",
              "--seeds", f"{pages_dir}/seeds.parquet",
              "--out", out_dir, "--budget", "50"])
    assert r.returncode == 0, r.stderr[-2000:]
    totals = json.loads(r.stdout.strip().splitlines()[-1])
    assert totals["articles_stored"] > 0
    arts = os.path.join(out_dir, "epoch=0000", "articles")
    assert os.path.isdir(arts)

    csv_out = str(tmp_path / "cli_csv")
    r = _run(["export", "--articles", arts, "--format", "csv",
              "--out", csv_out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] > 0
    assert any(f.endswith(".csv") for f in os.listdir(csv_out))


@pytest.mark.usefixtures("ray_session")
def test_cli_continuous_with_feed_files(pages_dir, tmp_path):
    urls = sorted(pq.read_table(f"{pages_dir}/pages").column("url").to_pylist())
    feeds_dir = str(tmp_path / "feeds")
    os.makedirs(feeds_dir)
    body = "<rss><channel>" + "".join(
        f"<item><title>t</title><link>{u}</link></item>" for u in urls[:30]
    ) + "</channel></rss>"
    pq.write_table(pa.table({
        "feed_url": pa.array(["https://f.test/feed"], pa.string()),
        "kind": pa.array(["rss"], pa.string()),
        "body": pa.array([body], pa.string()),
        "feed_seq": pa.array([700], pa.int64()),
    }), os.path.join(feeds_dir, "cycle-1.parquet"))

    seeds_path = str(tmp_path / "seeds.parquet")
    pq.write_table(pa.table({
        "url": pa.array(urls[30:40], pa.string()),
        "source": pa.array(["rss"] * 10, pa.string()),
        "priority": pa.array([10] * 10, pa.int32()),
        "depth": pa.array([0] * 10, pa.int32()),
        "discovery_ts": pa.array(
            [1_700_000_000_000_000 + i for i in range(10)], pa.timestamp("us")),
    }), seeds_path)

    out_dir = str(tmp_path / "cli_cont")
    r = _run(["continuous", "--pages", f"{pages_dir}/pages",
              "--seeds", seeds_path, "--out", out_dir,
              "--feeds-dir", feeds_dir, "--cycles", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    totals = json.loads(r.stdout.strip().splitlines()[-1])
    assert totals["discovered"] == 30
    assert totals["seen_total"] == 40  # 10 seeds + 30 discovered, all unique
    assert os.path.isdir(os.path.join(out_dir, "epoch=0001"))


def test_cli_query():
    r = _run(["query", "global_stats", "--sf-dir", "/root/testdata/sf0.001",
              "--json"])
    assert r.returncode == 0, r.stderr[-2000:]
    rows = json.loads(r.stdout.strip().splitlines()[-1])
    assert len(rows) == 1 and rows[0]["n_orders"] > 0

    r = _run(["query", "not_a_query"])
    assert r.returncode == 2
    assert "unknown query" in r.stderr
