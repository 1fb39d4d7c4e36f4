"""Assembler M22: merge extraction + enrichment + validation columns into the
41-column EnhancedArticle table (enhanced_article.py:110-178 semantics), plus
the exploded entities child table (omni_storage.py:228-237).

Defaults follow ``EnhancedArticle.from_basic_article``: source_type='news',
content_type='article', http_status=200, spam_score=0, security_score=0.9,
crawler_engine from the pipeline, processing_timestamp = warc_ts (deterministic
replacement for the reference's utcnow() default).

The reference min-merges the 0-100 enhancement score with the 0-1 validator
score when validation fails (omni_storage.py:377-381 — a scale-mixing bug).
``merge_scores_reference_bug=True`` reproduces that behavior; the default
keeps the two scores in their own columns (SURVEY.md §7.5(7)).
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import ARTICLE41_SCHEMA

CRAWLER_ENGINE = "omni-ray"


def assemble_batch(batch: pa.Table, merge_scores_reference_bug: bool = False) -> pa.Table:
    """Project the accumulated pipeline columns onto ARTICLE41_SCHEMA."""
    n = batch.num_rows
    names = set(batch.column_names)

    def col(name, default=None, typ=None):
        if name in names:
            return batch.column(name)
        return pa.nulls(n, typ) if default is None else pa.array([default] * n, typ)

    quality = col("quality_score", 0, pa.float64()).cast(pa.float64())
    if merge_scores_reference_bug and "val_quality_score" in names and "is_valid" in names:
        # omni_storage.py:377-381: on invalid rows, quality := min(quality, val)
        import pyarrow.compute as pc

        val = batch.column("val_quality_score").cast(pa.float64())
        invalid = pc.invert(batch.column("is_valid"))
        quality = pc.if_else(invalid, pc.min_element_wise(quality, val), quality)

    entities = pa.StructArray.from_arrays(
        [
            _combine_chunks(col("entities_people", typ=ARTICLE41_SCHEMA.field("entities").type.field("people").type)),
            _combine_chunks(col("entities_organizations", typ=ARTICLE41_SCHEMA.field("entities").type.field("organizations").type)),
            _combine_chunks(col("entities_locations", typ=ARTICLE41_SCHEMA.field("entities").type.field("locations").type)),
        ],
        names=["people", "organizations", "locations"],
    )

    empty_str_list = pa.array([[] for _ in range(n)], pa.list_(pa.string()))
    arrays = {
        "article_id": col("article_id", "", pa.string()),
        "title": col("title", "", pa.string()),
        "url": col("url", "", pa.string()),
        "canonical_url": col("canonical_url", typ=pa.string()),
        "domain": col("domain", "", pa.string()),
        "source_type": col("source_type", "news", pa.string()),
        "crawler_engine": col("crawler_engine", CRAWLER_ENGINE, pa.string()),
        "crawl_depth": col("depth", 0, pa.int32()),
        "content": col("extracted_text", "", pa.string()),
        "excerpt": col("excerpt", typ=pa.string()),
        "summary": col("summary", typ=pa.string()),
        "content_length": col("content_length", 0, pa.int64()),
        "content_hash": col("content_hash", "", pa.string()),
        "language": col("language", "en", pa.string()),
        "authors": col("authors", typ=pa.list_(pa.string())),
        "publish_date": col("publish_date", typ=pa.timestamp("us")),
        "last_modified": col("last_modified", typ=pa.timestamp("us")),
        "category": col("category", typ=pa.string()),
        "tags": col("tags", typ=pa.list_(pa.string())) if "tags" in names else empty_str_list,
        "topics": col("topics", typ=pa.list_(pa.string())) if "topics" in names else empty_str_list,
        "content_type": col("content_type", "article", pa.string()),
        "schema_type": col("schema_type", typ=pa.string()),
        "structured_data": col("structured_data", typ=pa.string()),
        "quality_score": quality,
        "confidence_score": col("confidence_score", 0.8, pa.float64()),
        "sentiment": col("sentiment", typ=ARTICLE41_SCHEMA.field("sentiment").type),
        "spam_score": col("spam_score", 0.0, pa.float64()),
        "duplicate_of": col("duplicate_of", typ=pa.string()),
        "entities": entities,
        "keywords": col("keywords", typ=pa.list_(pa.string())) if "keywords" in names else empty_str_list,
        "http_status": col("http_status", 200, pa.int32()),
        "processing_timestamp": col("warc_ts", typ=pa.timestamp("us")),
        "etag": col("etag", typ=pa.string()),
        "read_time": col("read_time", 0, pa.int64()),
        "social_shares": col("social_shares", typ=pa.map_(pa.string(), pa.int64())),
        "comments_count": col("comments_count", 0, pa.int64()),
        "outbound_links": col("outbound_links", typ=pa.list_(pa.string())) if "outbound_links" in names else empty_str_list,
        "inbound_links": empty_str_list,
        "media_attachments": col("media_attachments", typ=pa.list_(pa.map_(pa.string(), pa.string()))),
        "amp_url": col("amp_url", typ=pa.string()),
        "security_score": col("security_score", 0.9, pa.float64()),
    }
    cols = []
    for field in ARTICLE41_SCHEMA:
        arr = _combine_chunks(arrays[field.name])
        if arr.type != field.type:
            arr = arr.cast(field.type)
        cols.append(arr)
    return pa.table(cols, schema=ARTICLE41_SCHEMA)


def _combine_chunks(arr):
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def explode_entities_batch(batch: pa.Table) -> pa.Table:
    """One-to-many child table (article_id, entity_type, entity_name) with
    per-article uniqueness — omni_storage.py:228-237's normalized
    article_entities projection (the explode side of J1)."""
    ids = batch.column("article_id").to_pylist()
    ents = batch.column("entities").to_pylist()
    out_id, out_type, out_name = [], [], []
    for aid, ent in zip(ids, ents):
        ent = ent or {}
        seen = set()
        for etype_ref, etype_out in (
            ("people", "person"),
            ("organizations", "organization"),
            ("locations", "location"),
        ):
            for e in ent.get(etype_ref) or []:
                name = e.get("name")
                if name and (etype_out, name) not in seen:
                    seen.add((etype_out, name))
                    out_id.append(aid)
                    out_type.append(etype_out)
                    out_name.append(name)
    return pa.table(
        {
            "article_id": pa.array(out_id, pa.string()),
            "entity_type": pa.array(out_type, pa.string()),
            "entity_name": pa.array(out_name, pa.string()),
        }
    )
