"""ORC source + sharded ORC sink for the documents table.

Ray 2.49 ships no ``read_orc``; this module adds one through Ray Data's own
extension point (``FileBasedDatasource._read_stream``), so ORC files stream
through the executor exactly like parquet: one read task per file split, no
driver materialization, blocks land schema-metadata-free (the repo's block
hygiene invariant — see CLAUDE.md).

The sink writes deterministic, resumable shards: ``shard = doc_id %
n_shards`` → ``groupby(shard).map_groups`` where each group writes its own
``shard-XXXX.orc`` via tmp-file + ``os.replace`` (atomic per shard, same
discipline as ``sinks/partitioned.py``). Re-runs overwrite byte-identically;
a killed run leaves only whole shards.

Reference parity: the reference has a single-file CSV/JSON export surface
(src/exporters/*.py) and no columnar interchange; ORC is the "another
engine reads our output" path a 100-TB corpus needs alongside parquet.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data
from ray.data.datasource import FileBasedDatasource


class ORCDatasource(FileBasedDatasource):
    """Streaming ORC reader: one Ray read task per file, stripe-batched."""

    _FILE_EXTENSIONS = ["orc"]

    def _open_input_source(self, filesystem, path, **open_args):
        # ORC needs random access (footer-first layout) — the default
        # sequential input stream raises "only valid on seekable files"
        return filesystem.open_input_file(path)

    def _read_stream(self, f: "pa.NativeFile", path: str):
        import pyarrow.orc as orc

        reader = orc.ORCFile(f)
        for i in range(reader.nstripes):
            # stripe-at-a-time: bounded memory per task regardless of file
            # size (an ORC stripe is the row-group analogue); read_stripe
            # returns a RecordBatch — Ray blocks are Tables
            rb = reader.read_stripe(i)
            yield pa.Table.from_batches([rb]).replace_schema_metadata(None)


def read_orc(paths, **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet``-shaped entry point for ORC files/dirs.

    Filters to ``*.orc`` by default (FileBasedDatasource does NOT filter
    unless told to): a killed writer's ``.orc.tmp`` leftovers must stay
    invisible — the reader-side half of the sink's atomicity contract."""
    kwargs.setdefault("file_extensions", ORCDatasource._FILE_EXTENSIONS)
    return ray.data.read_datasource(ORCDatasource(paths, **kwargs))


def write_orc_shards(ds: ray.data.Dataset, out_dir: str, key_col: str,
                     n_shards: int = 16) -> int:
    """Write ``ds`` as ``out_dir/shard-XXXX.orc``, sharded by
    ``key_col % n_shards``. Deterministic (same input ⇒ same bytes per
    shard), atomic per shard, returns the number of shards written."""
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)

    def add_shard(t: pa.Table) -> pa.Table:
        if (n_shards & (n_shards - 1)) == 0:
            sh = pc.cast(
                pc.bit_wise_and(pc.cast(t[key_col], pa.int64()), n_shards - 1),
                pa.int32(),
            )
        else:  # pyarrow.compute has no modulo kernel — numpy for odd counts
            import numpy as np

            keys = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
            sh = pa.array((keys % n_shards).astype(np.int32))
        return t.append_column("_shard", sh)

    def write_group(g):
        import pyarrow.orc as orc

        t = (
            pa.Table.from_pandas(g, preserve_index=False)
            .replace_schema_metadata(None)
        )
        shard = int(t.column("_shard")[0].as_py())
        t = t.drop_columns(["_shard"]).sort_by(key_col)
        tmp = os.path.join(out_dir, f".shard-{shard:04d}.orc.tmp")
        orc.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, f"shard-{shard:04d}.orc"))
        import pandas as pd

        return pd.DataFrame({"shard": [shard], "n_rows": [len(g)]})

    from ..pipelines.queries import _pd_arrow

    manifest = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(_pd_arrow(write_group), batch_format="pandas")
        .to_pandas()
    )
    return len(manifest)


def orc_roundtrip_stats(sf_dir: str):
    """Oracle-backed ORC round trip: documents → sharded ORC → read_orc →
    per-source aggregate. The aggregate equals the same SQL over the parquet
    table iff the write+read path preserved every row and value."""
    from ..pipelines.queries import _read

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out_dir = f"/tmp/omni_ray_orc_{tag}"
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    write_orc_shards(ds, out_dir, "doc_id", n_shards=16)

    from ray.data.aggregate import Count, Sum

    back = read_orc(out_dir)
    out = (
        back.groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Sum("doc_id", alias_name="sum_ids"),
        )
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out, preserve_index=False
    ).replace_schema_metadata(None)


SQL_ORC_ROUNDTRIP = """
SELECT source,
       COUNT(*)     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id)  AS BIGINT) AS sum_ids
FROM documents
GROUP BY source
"""
