"""CSV / JSONL document sources must be byte-equivalent to the parquet
read after schema normalization — format-agnostic ingestion."""

import os
import shutil
import tempfile

import pandas as pd
import pyarrow.parquet as pq
import pytest

from omni_ray.sources.textfiles import (
    DOCUMENTS_SCHEMA,
    read_documents_csv,
    read_documents_jsonl,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_csv_and_jsonl_match_parquet():
    import ray.data

    want = (
        ray.data.read_parquet(f"{SF}/documents.parquet")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tmp = tempfile.mkdtemp(prefix="omni_ray_textsrc_")
    try:
        csv_path = os.path.join(tmp, "documents.csv")
        jsonl_path = os.path.join(tmp, "documents.jsonl")
        want.to_csv(csv_path, index=False)
        want.to_json(jsonl_path, orient="records", lines=True)

        got_csv = (
            read_documents_csv(csv_path).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        got_jsonl = (
            read_documents_jsonl(jsonl_path).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        cols = [f.name for f in DOCUMENTS_SCHEMA]
        pd.testing.assert_frame_equal(got_csv[cols], want[cols],
                                      check_dtype=False)
        pd.testing.assert_frame_equal(got_jsonl[cols], want[cols],
                                      check_dtype=False)

        # column pruning keeps the normalized schema subset
        sub = read_documents_csv(csv_path, columns=["doc_id", "n_chars"])
        assert sub.schema().names == ["doc_id", "n_chars"]
        assert sub.count() == len(want)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_gzipped_jsonl_roundtrip(tmp_path):
    """Common-Crawl-style .jsonl.gz ingests transparently (arrow codec
    detection in the datasource's open path) and matches parquet values."""
    import gzip
    import json

    src = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(40)
    p = str(tmp_path / "docs.jsonl.gz")
    with gzip.open(p, "wt") as f:
        for _, r in src.iterrows():
            f.write(json.dumps({
                "doc_id": int(r["doc_id"]), "text": str(r["text"]),
                "lang": str(r["lang"]), "source": str(r["source"]),
                "n_chars": int(r["n_chars"]),
            }) + "\n")
    back = read_documents_jsonl(p).to_pandas().sort_values("doc_id")
    want = src.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True)[sorted(back.columns)],
        want[sorted(back.columns)], check_dtype=False,
    )
