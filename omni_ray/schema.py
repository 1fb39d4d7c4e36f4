"""Arrow schemas for the engine's tables (SURVEY.md §1.4).

The 41-column article schema mirrors the reference's EnhancedArticle dataclass
(/root/reference/src/models/enhanced_article.py:9-74) and its SQLite DDL
(database_schema_updater.py:34-103), as native Arrow types:
Decimal → float64 (matching the reference's serialization,
enhanced_article.py:104-107), datetime → timestamp[us] UTC-naive, lists →
list<string>, sentiment → struct, entities → struct of list<struct>.

Per SURVEY.md §7.5(7), the 0-100 enhancement quality score and the 0-1
validator score stay SEPARATE columns (quality_score / val_quality_score) —
the reference min-merges the two scales (omni_storage.py:377-381), which we
expose behind a flag in the assembler rather than bake into the schema.
"""

import pyarrow as pa

ENTITY_LIST = pa.list_(pa.struct([("name", pa.string()), ("confidence", pa.float64())]))

SENTIMENT = pa.struct(
    [("overall", pa.float64()), ("positive", pa.int64()),
     ("negative", pa.int64()), ("neutral", pa.int64())]
)

ENTITIES = pa.struct(
    [("people", ENTITY_LIST), ("organizations", ENTITY_LIST), ("locations", ENTITY_LIST)]
)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("source", pa.string()),
        ("priority", pa.int32()),
        ("depth", pa.int32()),
        ("discovery_ts", pa.timestamp("us")),
        ("canonical_url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.string()),
    ]
)

# the 41 EnhancedArticle fields, grouped as in enhanced_article.py:14-74
ARTICLE41_SCHEMA = pa.schema(
    [
        # identity
        ("article_id", pa.string()),
        ("title", pa.string()),
        ("url", pa.string()),
        ("canonical_url", pa.string()),
        # source
        ("domain", pa.string()),
        ("source_type", pa.string()),
        ("crawler_engine", pa.string()),
        ("crawl_depth", pa.int32()),
        # content
        ("content", pa.string()),
        ("excerpt", pa.string()),
        ("summary", pa.string()),
        ("content_length", pa.int64()),
        ("content_hash", pa.string()),
        ("language", pa.string()),
        # metadata
        ("authors", pa.list_(pa.string())),
        ("publish_date", pa.timestamp("us")),
        ("last_modified", pa.timestamp("us")),
        ("category", pa.string()),
        ("tags", pa.list_(pa.string())),
        ("topics", pa.list_(pa.string())),
        # content-type
        ("content_type", pa.string()),
        ("schema_type", pa.string()),
        ("structured_data", pa.string()),  # free-form map → JSON string
        # quality
        ("quality_score", pa.float64()),
        ("confidence_score", pa.float64()),
        ("sentiment", SENTIMENT),
        ("spam_score", pa.float64()),
        ("duplicate_of", pa.string()),
        # analysis
        ("entities", ENTITIES),
        ("keywords", pa.list_(pa.string())),
        # technical
        ("http_status", pa.int32()),
        ("processing_timestamp", pa.timestamp("us")),
        ("etag", pa.string()),
        # engagement
        ("read_time", pa.int64()),
        ("social_shares", pa.map_(pa.string(), pa.int64())),
        ("comments_count", pa.int64()),
        ("outbound_links", pa.list_(pa.string())),
        ("inbound_links", pa.list_(pa.string())),
        # media
        ("media_attachments", pa.list_(pa.map_(pa.string(), pa.string()))),
        ("amp_url", pa.string()),
        # security
        ("security_score", pa.float64()),
    ]
)

ENTITIES_EXPLODED_SCHEMA = pa.schema(
    [
        ("article_id", pa.string()),
        ("entity_type", pa.string()),
        ("entity_name", pa.string()),
    ]
)

COUNTERS_SCHEMA = pa.schema(
    [
        ("wave", pa.int32()),
        ("partition", pa.string()),
        ("counter", pa.string()),
        ("value", pa.int64()),
    ]
)
