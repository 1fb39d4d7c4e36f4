"""Compaction discipline: content-preserving (row multiset identical),
order-preserving in filename order, atomic naming, and — the integration
contract — a crawl RESUMED from a compacted epoch produces a bit-identical
schedule."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from omni_ray.sinks.compact import compact_epoch_snapshots, compact_parquet_dir
from tests.test_crawl import _all_schedules


def test_compact_preserves_rows_and_order(tmp_path):
    d = str(tmp_path / "parts")
    os.makedirs(d)
    rows = []
    for i in range(7):
        t = pa.table({"k": pa.array(range(i * 10, i * 10 + 10), pa.int64())})
        pq.write_table(t, os.path.join(d, f"part-{i:04d}.parquet"))
        rows.extend(range(i * 10, i * 10 + 10))
    m = compact_parquet_dir(d, target_rows_per_file=25)
    assert (m["files_before"], m["rows"]) == (7, 70)
    assert m["files_after"] == 3  # ceil(70/25)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert len(files) == 3 and all(f.startswith("compact-") for f in files)
    got = []
    for f in files:
        got.extend(pq.read_table(os.path.join(d, f)).column("k").to_pylist())
    assert got == rows  # filename-order concatenation preserved
    # idempotent: already at target -> untouched
    m2 = compact_parquet_dir(d, target_rows_per_file=25)
    assert m2["files_after"] == m2["files_before"] == 3


@pytest.mark.usefixtures("ray_session")
def test_resume_from_compacted_epoch_identical(pages_dir, tmp_path):
    from omni_ray.pipelines.crawl import run_crawl

    def _run(out_dir, **kw):
        return run_crawl(
            pages_dir=f"{pages_dir}/pages",
            seeds_path=f"{pages_dir}/seeds.parquet",
            out_dir=out_dir, n_buckets=8, n_seen_shards=2,
            budget_per_host=5, **kw)

    full_dir = str(tmp_path / "cmp_full")
    _run(full_dir)
    full_sched = _all_schedules(full_dir)

    part_dir = str(tmp_path / "cmp_part")
    _run(part_dir, max_waves=1)

    # at test scale Ray wrote one part; split the snapshot into many small
    # parts first (what hundreds of writer tasks produce at 100 TB)
    fdir = os.path.join(part_dir, "epoch=0000", "frontier_next")
    parts = [f for f in os.listdir(fdir) if f.endswith(".parquet")]
    t = pq.read_table(fdir)
    for f in parts:
        os.remove(os.path.join(fdir, f))
    step = max(1, -(-t.num_rows // 6))
    for i, start in enumerate(range(0, t.num_rows, step)):
        pq.write_table(t.slice(start, step),
                       os.path.join(fdir, f"part-{i:06d}.parquet"))

    manifests = compact_epoch_snapshots(part_dir, target_rows_per_file=10**9)
    got_m = [m for m in manifests if m["artifact"] == "frontier_next"
             and m["epoch"] == "epoch=0000"][0]
    assert got_m["files_before"] == 6 and got_m["files_after"] == 1
    assert got_m["rows"] == t.num_rows
    _run(part_dir, resume=True)
    got = _all_schedules(part_dir)
    assert got["url"].tolist() == full_sched["url"].tolist()
    assert got["wave"].tolist() == full_sched["wave"].tolist()
