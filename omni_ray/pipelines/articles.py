"""The fetch→clean→extract→enrich→validate→assemble article pipeline
(SURVEY.md §3.1 phases 2-4), composed as a lazy Ray Data pipeline.

Stage layout (all zero-copy Arrow):
  read_parquet(pages)                       — column-pruned at the read
  → map_batches(clean_batch)                — M1/M2, stateless tasks
  → map_batches(extract_batch)              — M3-M9 fused, stateless tasks
  → drop html                               — shrink blocks before wide stages
  → map_batches(canonicalize_batch)         — M4/M5/D1 keys
  → map_batches(Enricher, concurrency=N)    — M10-M20 actor pool (ST2)
  → map_batches(validate_batch)             — M21
  → map_batches(assemble_batch)             — M22 → 41-col table

``html`` is dropped immediately after extraction so every downstream
block/shuffle moves narrow rows (SURVEY.md §7.5(5): wide binary rows).
"""

from __future__ import annotations

import ray.data

from ..functions.assemble import assemble_batch, explode_entities_batch
from ..functions.canonical import canonicalize_batch
from ..functions.clean import clean_batch
from ..functions.enrich import Enricher
from ..functions.extract import extract_batch
from ..functions.validate import validate_batch

# html rows can be MBs each: keep raw-page batches small, post-clean batches bigger
RAW_BATCH_SIZE = 256
ENRICH_BATCH_SIZE = 1024


def article_pipeline(
    pages: ray.data.Dataset,
    enrich_concurrency: int | None = None,
    gate_articles: bool = True,
    merge_scores_reference_bug: bool = False,
    dead_letter_dir: str | None = None,
    use_engine_chain: bool = False,
) -> ray.data.Dataset:
    """pages(url, warc_ts, html, ...) → 41-column EnhancedArticle Dataset.

    ``dead_letter_dir`` wraps the parse-heavy clean/extract stages in
    poison-row capture (one bad page never kills a block; failures are
    written as (url, error) parquet — the reference's drop-and-count
    semantics, omni_orchestrator.py:141-147).

    ``use_engine_chain`` swaps the single cleaner for the two-engine
    priority-fallback registry (S4, multi_engine_crawler.py:33-50):
    semantic-main first, reference cleaner as fallback; ``crawler_engine``
    records which one produced each row. Default off — the single cleaner is
    the byte-identical-parity configuration.
    """
    import pyarrow.compute as pc

    if use_engine_chain:
        from ..functions.engines import default_engine_chain

        clean_fn = default_engine_chain()
    else:
        clean_fn = clean_batch
    extract_fn = extract_batch
    if dead_letter_dir:
        from .deadletter import DeadLetterWrapper

        clean_fn = DeadLetterWrapper(clean_fn, dead_letter_dir)
        extract_fn = DeadLetterWrapper(extract_batch, dead_letter_dir)

    ds = pages.map_batches(clean_fn, batch_format="pyarrow", batch_size=RAW_BATCH_SIZE)
    ds = ds.map_batches(extract_fn, batch_format="pyarrow", batch_size=RAW_BATCH_SIZE)
    ds = ds.drop_columns(["html"])
    if gate_articles:
        # M9 gate: the crawler drops non-articles (simple_crawler.py:95-98)
        ds = ds.map_batches(
            lambda t: t.filter(pc.field("is_article")), batch_format="pyarrow"
        )
    ds = ds.map_batches(canonicalize_batch, batch_format="pyarrow")
    if enrich_concurrency:
        ds = ds.map_batches(
            Enricher,
            batch_format="pyarrow",
            batch_size=ENRICH_BATCH_SIZE,
            concurrency=enrich_concurrency,
            num_cpus=1,
        )
    else:  # stateless-task form — fine single-node; actor pool for real runs
        ds = ds.map_batches(
            Enricher(), batch_format="pyarrow", batch_size=ENRICH_BATCH_SIZE
        )
    ds = ds.map_batches(validate_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: assemble_batch(t, merge_scores_reference_bug=merge_scores_reference_bug),
        batch_format="pyarrow",
    )
    return ds


def entities_pipeline(articles: ray.data.Dataset) -> ray.data.Dataset:
    """articles41 → exploded (article_id, entity_type, entity_name) child table."""
    return articles.map_batches(explode_entities_batch, batch_format="pyarrow")
