"""Export layer tests (S9-S12): projections, envelope, join-back dump."""

import csv
import glob
import json
import os

import pytest


@pytest.fixture(scope="module")
def articles_ds(ray_session, pages_dir):
    import ray.data

    from omni_ray.pipelines.articles import article_pipeline

    pages = ray.data.read_parquet(f"{pages_dir}/pages")
    return article_pipeline(pages).materialize()


def test_basic_csv_export(articles_ds, tmp_path):
    from omni_ray.pipelines.export import BASIC_CSV_COLS, export_articles_csv

    out = export_articles_csv(articles_ds, str(tmp_path / "csv"))
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    rows = []
    for fp in files:
        with open(fp) as f:
            r = csv.DictReader(f)
            assert r.fieldnames == BASIC_CSV_COLS
            rows.extend(r)
    assert len(rows) == articles_ds.count()
    # authors ';'-joined, sentiment is the overall float
    assert all(";" in row["authors"] or row["authors"] == "" or " " not in row["authors"].split(";")[0][:0] for row in rows)
    float(rows[0]["sentiment"])


def test_enhanced_csv_export(articles_ds, tmp_path):
    from omni_ray.pipelines.export import ENHANCED_CSV_COLS, export_articles_csv

    out = export_articles_csv(articles_ds, str(tmp_path / "csv2"), enhanced=True)
    files = glob.glob(os.path.join(out, "*.csv"))
    with open(files[0]) as f:
        r = csv.DictReader(f)
        assert r.fieldnames == ENHANCED_CSV_COLS
        row = next(r)
    assert json.loads(row["entities"])  # JSON-encoded entities struct
    assert "read_time" in row


def test_json_export_envelope(articles_ds, tmp_path):
    from omni_ray.pipelines.export import export_articles_json

    out = export_articles_json(articles_ds, str(tmp_path / "json"), run_tag="test-run")
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["metadata"]["total_articles"] == articles_ds.count()
    assert meta["metadata"]["exported_at"] == "test-run"
    parts = glob.glob(os.path.join(out, "articles", "*.json"))
    n = sum(1 for fp in parts for _ in open(fp))
    assert n == articles_ds.count()


def test_full_dump_join_back(articles_ds, tmp_path):
    from omni_ray.pipelines.articles import entities_pipeline
    from omni_ray.pipelines.export import export_full_dump

    ents = entities_pipeline(articles_ds)
    out = export_full_dump(articles_ds, ents, str(tmp_path / "dump"), run_tag="t")
    schema_meta = json.load(open(os.path.join(out, "schema_metadata.json")))
    assert "articles" in schema_meta["tables"]
    ent_rows = [
        json.loads(line)
        for fp in glob.glob(os.path.join(out, "entities", "*.json"))
        for line in open(fp)
    ]
    assert ent_rows
    # join-back attached real titles
    assert all(r["title"] for r in ent_rows[:50])
    assert set(ent_rows[0]) == {"article_id", "entity_type", "entity_name", "title", "domain"}


def test_storage_projections(articles_ds, tmp_path):
    import ray.data

    from omni_ray.pipelines.articles import entities_pipeline
    from omni_ray.pipelines.export import (
        RELATIONAL_COLS,
        export_relational,
        export_search_projection,
    )

    sdir = export_search_projection(articles_ds, str(tmp_path / "search"))
    sp = ray.data.read_parquet(sdir)
    assert sp.count() == articles_ds.count()
    assert "word_count" in sp.schema().names and "url" not in sp.schema().names

    rdir = export_relational(articles_ds, entities_pipeline(articles_ds), str(tmp_path / "pg"))
    arts = ray.data.read_parquet(f"{rdir}/articles")
    assert arts.schema().names == RELATIONAL_COLS
    row = arts.take(1)[0]
    assert len(row["content"]) <= 10000  # PG truncation guard
    ents = ray.data.read_parquet(f"{rdir}/article_entities")
    assert set(ents.schema().names) >= {"article_id", "entity_type", "entity_name"}
