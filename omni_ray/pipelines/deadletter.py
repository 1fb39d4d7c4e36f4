"""Poison-row capture (SURVEY.md §4 stragglers/retries row): the reference
drops a failing article and counts the error (omni_orchestrator.py:141-147);
the distributed equivalent must ensure one bad page never kills a block.

``DeadLetterWrapper`` wraps any batch UDF: on batch failure it bisects the
batch to isolate the poison rows, writes them (key columns + error string)
to a dead-letter parquet directory, and returns the output of the good rows.
The happy path costs nothing (one try per batch); the failure path is
O(log n) extra calls per poison row.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


class DeadLetterWrapper:
    def __init__(self, fn, dead_letter_dir: str, key_cols: tuple[str, ...] = ("url",)):
        self.fn = fn
        self.dir = dead_letter_dir
        self.key_cols = key_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        try:
            return self.fn(batch)
        except Exception:
            pass
        good_parts: list[pa.Table] = []
        bad_keys: list[dict] = []
        stack = [batch]
        while stack:
            b = stack.pop()
            try:
                out = self.fn(b)
                if out.num_rows:
                    good_parts.append(out)
            except Exception as e:
                if b.num_rows <= 1:
                    row = {c: None for c in self.key_cols}
                    for c in self.key_cols:
                        if c in b.column_names and b.num_rows:
                            row[c] = b.column(c)[0].as_py()
                    row["error"] = f"{type(e).__name__}: {e}"[:500]
                    bad_keys.append(row)
                else:
                    mid = b.num_rows // 2
                    stack.append(b.slice(0, mid))
                    stack.append(b.slice(mid))
        if bad_keys:
            os.makedirs(self.dir, exist_ok=True)
            tbl = pa.table(
                {
                    **{c: pa.array([r[c] for r in bad_keys], pa.string())
                       for c in self.key_cols},
                    "error": pa.array([r["error"] for r in bad_keys], pa.string()),
                }
            )
            pq.write_table(tbl, os.path.join(self.dir, f"dl-{uuid.uuid4().hex}.parquet"))
        if good_parts:
            return pa.concat_tables(good_parts, promote_options="default")
        # all rows poisoned: derive the output schema from the UDF on an
        # empty batch so downstream blocks stay schema-consistent
        try:
            return self.fn(batch.slice(0, 0))
        except Exception:
            return batch.slice(0, 0)
