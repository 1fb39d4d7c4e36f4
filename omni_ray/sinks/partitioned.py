"""Generic resumable partitioned-Parquet sink.

The crawl loop's epoch directories pioneered the discipline (one directory
per unit of work, a ``_COMPLETE`` marker written only after every byte is
durable, restart skips marked directories — ``pipelines/crawl.py``); this
module generalizes it to ANY dataset and partition column, the "resumable
output" contract a 100-TB job needs: a failed run reruns only the
partitions that never finished, and a finished partition is immutable.

Scale shape: the write happens INSIDE ``groupby(partition_col).map_groups``
tasks — each partition writes its own directory and marks itself complete,
so completion is atomic per partition (tmp file + ``os.replace``), the
driver never holds data, and resume filtering drops finished partitions
BEFORE the shuffle via a broadcast frozenset of done keys. Partition values
should be a bounded domain (days, shards, categories — the same assumption
as any Hive-style layout); the returned manifest is one row per partition.

Reference parity: omni-crawler's exporters (src/exporters/*.py) write whole
single files per run with no resume; this is the Ray-native upgrade path.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

_COMPLETE = "_COMPLETE"


def _part_dir(out_dir: str, col: str, value) -> str:
    return os.path.join(out_dir, f"{col}={value}")


def list_complete_partitions(out_dir: str, partition_col: str) -> set[str]:
    """Partition VALUES (as strings) whose directories carry _COMPLETE."""
    if not os.path.isdir(out_dir):
        return set()
    prefix = f"{partition_col}="
    return {
        d[len(prefix):]
        for d in os.listdir(out_dir)
        if d.startswith(prefix)
        and os.path.exists(os.path.join(out_dir, d, _COMPLETE))
    }


def write_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    partition_col: str,
    resume: bool = True,
) -> pa.Table:
    """Write ``ds`` as ``out_dir/<col>=<value>/part.parquet`` with a
    _COMPLETE marker per partition; on ``resume=True`` (default) partitions
    already marked complete are skipped WITHOUT reading or shuffling their
    rows. Returns a manifest table (partition value, n_rows, skipped)."""
    os.makedirs(out_dir, exist_ok=True)
    done = list_complete_partitions(out_dir, partition_col) if resume else set()
    done_ref = ray.put(frozenset(done))

    def drop_done(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(done_ref)
        if not d:
            return df
        return df[~df[partition_col].astype(str).isin(d)]

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        val = g[partition_col].iloc[0]
        pdir = _part_dir(out_dir, partition_col, val)
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part.parquet.tmp")
        pq.write_table(
            # strip the b'pandas' schema metadata so read-back blocks stay
            # hashable (pyarrow 16 hash(schema) raises on schema metadata)
            pa.Table.from_pandas(
                g, preserve_index=False
            ).replace_schema_metadata(None),
            tmp,
        )
        os.replace(tmp, os.path.join(pdir, "part.parquet"))
        with open(os.path.join(pdir, _COMPLETE), "w") as f:
            f.write(str(len(g)))
        return pd.DataFrame({
            "partition": [str(val)],
            "n_rows": [len(g)],
            "skipped": [False],
        })

    from ..pipelines.queries import _pd_arrow

    manifest = (
        ds.map_batches(_pd_arrow(drop_done), batch_format="pandas")
        .groupby(partition_col)
        .map_groups(_pd_arrow(write_group), batch_format="pandas")
        .to_pandas()
    )
    skipped = pd.DataFrame({
        "partition": sorted(done),
        "n_rows": [
            int(open(os.path.join(
                _part_dir(out_dir, partition_col, v), _COMPLETE)).read())
            for v in sorted(done)
        ],
        "skipped": True,
    })
    full = pd.concat([manifest, skipped], ignore_index=True)
    full = full.sort_values("partition").reset_index(drop=True)
    return pa.Table.from_pandas(full, preserve_index=False).replace_schema_metadata(None)


def read_partitioned(out_dir: str, partition_col: str) -> ray.data.Dataset:
    """Read back ONLY the complete partitions (in-flight/dead partitions
    are invisible, the reader-side half of the resume contract)."""
    paths = [
        os.path.join(_part_dir(out_dir, partition_col, v), "part.parquet")
        for v in sorted(list_complete_partitions(out_dir, partition_col))
    ]
    if not paths:
        raise FileNotFoundError(f"no complete partitions under {out_dir}")
    return ray.data.read_parquet(paths)
