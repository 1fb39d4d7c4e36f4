"""Export layer (SURVEY.md S9-S12): CSV / JSON / full-dump projections of the
41-column article table, as Ray Data write pipelines.

Projections mirror /root/reference/src/api/data_exporter.py:
  * S9  basic CSV  — 12 flat columns, authors joined with ';' (:41-76)
  * S10 JSON       — metadata envelope + records, Decimal→float (:78-106)
  * S11 enhanced CSV — 20 columns, lists joined '; ', sentiment.overall
                     (:196-251)
  * S12 full dump  — articles.json + entities.json (J1 join-back with titles,
                     :385-412) + schema metadata, one directory (the zip
                     equivalent for a distributed engine)

All are projection map_batches → ds.write_csv / write_json; the timestamp in
filenames is replaced by a caller-provided run tag (determinism rule,
FIXTURES.md §6).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

BASIC_CSV_COLS = [
    "article_id", "title", "url", "domain", "authors", "category",
    "quality_score", "sentiment", "content_length", "processing_timestamp",
    "publish_date", "crawler_engine",
]

ENHANCED_CSV_COLS = BASIC_CSV_COLS + [
    "summary", "excerpt", "keywords", "entities", "language", "read_time",
    "topics", "confidence_score",
]


def _flatten_for_csv(t: pa.Table, enhanced: bool) -> pa.Table:
    cols = ENHANCED_CSV_COLS if enhanced else BASIC_CSV_COLS
    authors = ["; ".join(a or []) if enhanced else ";".join(a or [])
               for a in t.column("authors").to_pylist()]
    sentiment = [str((s or {}).get("overall", 0)) for s in t.column("sentiment").to_pylist()]
    out: dict[str, pa.Array] = {}
    for c in cols:
        if c == "authors":
            out[c] = pa.array(authors, pa.string())
        elif c == "sentiment":
            out[c] = pa.array(sentiment, pa.string())
        elif c == "keywords":
            out[c] = pa.array(
                ["; ".join(k or []) for k in t.column("keywords").to_pylist()], pa.string()
            )
        elif c == "topics":
            out[c] = pa.array(
                ["; ".join(k or []) for k in t.column("topics").to_pylist()], pa.string()
            )
        elif c == "entities":
            out[c] = pa.array(
                [json.dumps(e, sort_keys=True) for e in t.column("entities").to_pylist()],
                pa.string(),
            )
        elif c in ("processing_timestamp", "publish_date"):
            vals = t.column(c).to_pylist()
            out[c] = pa.array(
                [v.isoformat() + "Z" if v is not None else "" for v in vals], pa.string()
            )
        else:
            out[c] = t.column(c)
    return pa.table(out)


def export_articles_csv(articles: ray.data.Dataset, out_dir: str, enhanced: bool = False) -> str:
    """S9 / S11: flat CSV projection, one part file per block."""
    proj = articles.map_batches(
        lambda t: _flatten_for_csv(t, enhanced), batch_format="pyarrow"
    )
    proj.write_csv(out_dir)
    return out_dir


def export_articles_json(articles: ray.data.Dataset, out_dir: str, run_tag: str = "run",
                         filters: dict | None = None) -> str:
    """S10: records as JSON parts + a metadata envelope file (the envelope is
    a driver-side summary; records stream distributed)."""
    n = articles.count()
    articles.write_json(os.path.join(out_dir, "articles"))
    meta = {
        "metadata": {
            "exported_at": run_tag,  # deterministic tag, not utcnow (FIXTURES.md §6)
            "total_articles": n,
            "filters_applied": filters or {},
        }
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def export_full_dump(articles: ray.data.Dataset, entities: ray.data.Dataset,
                     out_dir: str, run_tag: str = "run") -> str:
    """S12: articles.json + entities.json (entities joined back to article
    title/domain — J1) + schema metadata. The parent side is the FULL article
    corpus, not a dimension table, so the join-back is a distributed
    ``Dataset.join`` hash join — no driver-side lookup dict."""
    os.makedirs(out_dir, exist_ok=True)
    articles.write_json(os.path.join(out_dir, "articles"))

    def _titles(t: pa.Table) -> pa.Table:
        return pa.table({
            "article_id": t.column("article_id"),
            "title": t.column("title"),
            "domain": t.column("domain"),
        })

    titles_side = articles.map_batches(_titles, batch_format="pyarrow")
    joined = entities.join(
        titles_side, join_type="left_outer", num_partitions=8,
        on=("article_id",), right_suffix="_r",
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def finalize(t: pa.Table) -> pa.Table:
        # missing parents → "" (the reference's lookup.get default)
        import pyarrow.compute as pc

        for c in ("title", "domain"):
            t = t.set_column(
                t.column_names.index(c), c,
                pc.coalesce(t.column(c).cast(pa.string()), pa.scalar("", pa.string())),
            )
        return t.select(["article_id", "entity_type", "entity_name", "title", "domain"])

    joined.map_batches(finalize, batch_format="pyarrow").write_json(
        os.path.join(out_dir, "entities")
    )
    from ..schema import ARTICLE41_SCHEMA

    with open(os.path.join(out_dir, "schema_metadata.json"), "w") as f:
        json.dump(
            {
                "exported_at": run_tag,
                "tables": {
                    "articles": [fl.name for fl in ARTICLE41_SCHEMA],
                    "entities": ["article_id", "entity_type", "entity_name", "title", "domain"],
                },
            },
            f,
            indent=2,
        )
    return out_dir


# ---------------------------------------------------------------------------
# storage projections S5/S6/S8 (omni_storage.py) — sink-specific tables
# ---------------------------------------------------------------------------

SEARCH_PROJECTION_COLS = [
    "title", "content", "authors", "publish_date", "domain", "entities",
    "sentiment", "quality_score", "category", "processing_timestamp",
    "crawler_engine", "content_length",
]

RELATIONAL_COLS = [
    "article_id", "url", "title", "content", "authors", "domain",
    "publish_date", "quality_score", "category", "crawler_engine",
    "processing_timestamp",
]


def export_search_projection(articles: ray.data.Dataset, out_dir: str) -> str:
    """S5: the Elasticsearch doc projection (omni_storage.py:275-296) as its
    own parquet table — search fields + derived word_count. Upsert semantics
    (index-by-id last-write-wins) are dedup-before-write: callers dedup on
    article_id upstream (D3, see queries.last_event_per_user pattern)."""

    def proj(t: pa.Table) -> pa.Table:
        out = t.select([c for c in SEARCH_PROJECTION_COLS if c in t.column_names])
        wc = pa.array(
            [len((x or "").split()) for x in t.column("content").to_pylist()], pa.int64()
        )
        return out.append_column("word_count", wc)

    articles.map_batches(proj, batch_format="pyarrow").write_parquet(out_dir)
    return out_dir


def export_relational(articles: ray.data.Dataset, entities: ray.data.Dataset,
                      base_dir: str) -> str:
    """S6: the PostgreSQL relational projection (omni_storage.py:210-237):
    a 13-col ``articles`` table (content truncated at 10,000 chars — the
    reference's storage guard, omni_storage.py:173) plus the normalized
    ``article_entities`` child table with per-article uniqueness."""

    def proj(t: pa.Table) -> pa.Table:
        out = t.select(RELATIONAL_COLS)
        content = pa.array(
            [(x or "")[:10000] for x in t.column("content").to_pylist()], pa.string()
        )
        return out.set_column(out.column_names.index("content"), "content", content)

    articles.map_batches(proj, batch_format="pyarrow").write_parquet(
        os.path.join(base_dir, "articles")
    )
    entities.write_parquet(os.path.join(base_dir, "article_entities"))
    return base_dir
