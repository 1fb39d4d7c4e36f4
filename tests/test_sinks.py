"""Resumable partitioned sink: per-partition _COMPLETE atomicity, resume
skips finished partitions untouched, reader sees only complete ones."""

import os
import shutil
import tempfile

import pyarrow as pa
import pytest
import ray.data

from omni_ray.sinks import (
    list_complete_partitions,
    read_partitioned,
    write_partitioned,
)


def _dataset():
    t = pa.table({
        "day": pa.array([d for d in range(5) for _ in range(20)], pa.int64()),
        "v": pa.array(list(range(100)), pa.int64()),
    })
    return ray.data.from_arrow(t)


@pytest.mark.usefixtures("ray_session")
def test_write_read_and_resume():
    out = tempfile.mkdtemp(prefix="omni_ray_sink_")
    try:
        m1 = write_partitioned(_dataset(), out, "day").to_pandas()
        assert len(m1) == 5 and not m1["skipped"].any()
        assert m1["n_rows"].sum() == 100
        assert list_complete_partitions(out, "day") == {"0", "1", "2", "3", "4"}

        # read-back equals the input
        back = read_partitioned(out, "day").to_pandas()
        assert len(back) == 100
        assert sorted(back["v"]) == list(range(100))

        # simulate a partition that died mid-write: files exist, no marker
        dead = os.path.join(out, "day=2")
        os.remove(os.path.join(dead, "_COMPLETE"))
        assert list_complete_partitions(out, "day") == {"0", "1", "3", "4"}

        # the reader must NOT see the incomplete partition
        partial = read_partitioned(out, "day").to_pandas()
        assert set(partial["day"]) == {0, 1, 3, 4}

        # resume: only day=2 is rewritten; finished partitions are untouched
        mtimes = {
            d: os.path.getmtime(os.path.join(out, f"day={d}", "part.parquet"))
            for d in (0, 1, 3, 4)
        }
        m2 = write_partitioned(_dataset(), out, "day").to_pandas()
        rewritten = m2[~m2["skipped"]]
        assert list(rewritten["partition"]) == ["2"]
        assert m2["skipped"].sum() == 4
        for d, mt in mtimes.items():
            assert os.path.getmtime(
                os.path.join(out, f"day={d}", "part.parquet")) == mt

        # after resume, the full dataset is visible again
        full = read_partitioned(out, "day").to_pandas()
        assert len(full) == 100 and m2["n_rows"].sum() == 100

        # resume=False force-rewrites everything
        m3 = write_partitioned(_dataset(), out, "day", resume=False).to_pandas()
        assert not m3["skipped"].any() and len(m3) == 5
    finally:
        shutil.rmtree(out, ignore_errors=True)
