"""Batch-16 semantic invariants beyond oracle frame-equality: the planted
incremental duplicates are all flagged, and the hive pruned read truly never
opens non-selected partition directories."""

import os
import tempfile

import pytest

from omni_ray.pipelines.increment import (
    incremental_dedup_delta,
    partition_pruned_read,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_flags_planted_duplicates():
    out = incremental_dedup_delta(SF).to_pandas().set_index("doc_id")
    planted_base = [i for i in out.index if i % 11 == 0]
    # ×13 plants copy the ORIGINAL hash of the odd doc two back; if that
    # source is itself ×11-planted its resolved hash changed, so no delta
    # doc still carries the copied value — exclude those sources
    planted_delta = [i for i in out.index if i % 13 == 0 and i % 11 != 0
                     and i - 2 >= 0 and (i - 2) % 11 != 0]
    assert planted_base and planted_delta
    assert (out.loc[planted_base, "dup_of_base"] == 1).all()
    # the ×13 plant copies an odd (delta) doc two back → flagged in-delta
    assert (out.loc[planted_delta, "dup_in_delta"] == 1).all()
    # unplanted odd docs with unique texts carry no flags
    clean = [i for i in out.index if i % 11 != 0 and i % 13 != 0]
    assert (out.loc[clean, ["dup_of_base", "dup_in_delta"]].sum(axis=1) == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_partition_pruned_read_touches_only_selected_dirs():
    import ray.data
    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
    )

    partition_pruned_read(SF)  # writes the hive layout as a side effect
    hive = os.path.join(
        tempfile.gettempdir(),
        f"omni_ray_hive_{os.path.basename(os.path.normpath(SF))}")
    langs = sorted(e.split("=")[1] for e in os.listdir(hive) if "=" in e)
    assert len(langs) >= 3  # pruning must have something to skip
    want = set(langs[:2])
    filt = PathPartitionFilter.of(lambda p: p["lang"] in want, style="hive")
    ds = ray.data.read_parquet(
        hive, partitioning=Partitioning("hive"), partition_filter=filt)
    files = ds.input_files()
    assert files
    for f in files:
        assert any(f"lang={w}" in f for w in want), f
