"""Delimited / JSON-lines source readers for the documents table.

The reference ingests from whatever its discovery feeds hand it; the
parquet tables are this repo's canonical storage, but a migrating user's
first run starts from CSV exports or JSONL dumps. These readers normalize
either format to the exact documents schema (doc_id int64, text string,
lang string, source string, n_chars int64) so every downstream operator is
format-agnostic from row one.

Scale shape: ray.data.read_csv / read_json stream file splits exactly like
read_parquet (no driver materialization); the schema coercion is one
zero-copy-ish cast pass. Column pruning happens post-parse (text formats
cannot skip columns at the byte level — the documented cost of staying on
CSV/JSONL; the fix is one `write_parquet` away).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])


def _coerce(ds: ray.data.Dataset, columns: list[str] | None) -> ray.data.Dataset:
    keep = columns or [f.name for f in DOCUMENTS_SCHEMA]
    types = {f.name: f.type for f in DOCUMENTS_SCHEMA}

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({
            name: pc.cast(t[name], types[name]) for name in keep
        })

    return ds.map_batches(fix, batch_format="pyarrow")


def read_documents_csv(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """CSV (header row) → documents-schema Dataset."""
    return _coerce(ray.data.read_csv(path), columns)


def read_documents_jsonl(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """JSON-lines → documents-schema Dataset."""
    return _coerce(ray.data.read_json(path), columns)
