"""Cross-validation against the reference's OWN stored outputs: the shipped
``omniparser.db`` holds 75 real crawled EnhancedArticle rows produced by the
reference pipeline. Every deterministic operator we ported must reproduce the
stored values bit-for-bit on those rows:

  * content_hash  = sha256(title+content+url)  (enhanced_article.py:84-87)
  * read_time     = max(1, round(words/200))   (content_enricher.py:195-203)
  * language      = common-word overlap rule   (content_enricher.py:180-193)
  * excerpt       = 200-char word truncation   (content_enricher.py:300-303, :84)
  * content_length, keyword/topic shapes, sentiment struct ranges

The corpus is read-only at /root/reference/omniparser.db (sqlite3 stdlib).
"""

import json
import sqlite3

import pytest

DB = "file:/root/reference/omniparser.db?mode=ro"


@pytest.fixture(scope="module")
def corpus():
    con = sqlite3.connect(DB, uri=True)
    con.row_factory = sqlite3.Row
    rows = con.execute(
        "SELECT * FROM enhanced_articles WHERE content IS NOT NULL AND length(content) > 0"
    ).fetchall()
    con.close()
    assert len(rows) >= 50
    return rows


def test_content_hash_parity(corpus):
    from omni_ray.functions.canonical import content_hash

    checked = 0
    for r in corpus:
        if r["content_hash"]:
            assert content_hash(r["title"], r["content"], r["url"]) == r["content_hash"], r["article_id"]
            checked += 1
    assert checked >= 50


def test_read_time_parity(corpus):
    from omni_ray.functions.enrich import calculate_read_time

    mismatches = [
        r["article_id"]
        for r in corpus
        if r["read_time"] is not None
        and calculate_read_time(r["content"]) != r["read_time"]
    ]
    assert mismatches == []


def test_language_parity(corpus):
    from omni_ray.functions.enrich import detect_language

    mismatches = [
        (r["article_id"], r["language"], detect_language(r["content"]))
        for r in corpus
        if r["language"] in ("en", "unknown")
        and detect_language(r["content"]) != r["language"]
    ]
    assert mismatches == []


def test_excerpt_parity(corpus):
    from omni_ray.functions.enrich import truncate_text

    checked = 0
    for r in corpus:
        if r["excerpt"]:
            assert truncate_text(r["content"], 200) == r["excerpt"], r["article_id"]
            checked += 1
    assert checked >= 40


def test_content_length_and_shapes(corpus):
    from omni_ray.functions.enrich import analyze_sentiment, extract_keywords

    for r in corpus[:20]:
        # only the crawled rows: the reference's hand-inserted 'direct-test-*'
        # rows store content_length values inconsistent with their own content
        if r["content_length"] and r["article_id"].startswith("article_"):
            assert len(r["content"]) == r["content_length"], r["article_id"]
        # stored keywords (JSON list) ⊇-compatible shape with our extractor
        if r["keywords"]:
            stored = json.loads(r["keywords"])
            assert isinstance(stored, list)
            ours = extract_keywords(f"{r['title']} {r['content']}")
            assert len(ours) <= 15
        s = analyze_sentiment(r["content"])
        assert -1.0 <= s["overall"] <= 1.0


def test_keywords_parity(corpus):
    """Full keyword parity on rows where the reference stored them: same
    tokenizer, stopword set and top-15 selection ⇒ identical lists (the
    reference's Counter.most_common tie order is insertion order, which our
    identical scan order reproduces)."""
    from omni_ray.functions.enrich import extract_keywords

    checked = 0
    for r in corpus:
        if not r["keywords"]:
            continue
        stored = json.loads(r["keywords"])
        if not stored:
            continue
        ours = extract_keywords(f"{r['title']} {r['content']}")
        assert ours == stored, (r["article_id"], ours[:5], stored[:5])
        checked += 1
    assert checked >= 40


def test_sentiment_topics_entities_confidence_parity(corpus):
    """Bit-for-bit parity on the deterministic enrichers, including the
    entities trio (which validates the linear-time org scan against the
    reference's regex output on real pages)."""
    from omni_ray.functions.enrich import (
        analyze_sentiment,
        confidence_score,
        extract_keywords,
        extract_locations,
        extract_organizations,
        extract_people,
        extract_topics,
    )

    checked = 0
    for r in corpus:
        if not r["article_id"].startswith("article_"):
            continue
        tc = f"{r['title']} {r['content']}"
        if r["sentiment"]:
            stored_sent = json.loads(r["sentiment"])
            if set(stored_sent) == {"overall", "positive", "negative", "neutral"}:
                # rows with {} hit the reference's exception fallback
                # (content_enricher.py:62-74) — nothing to compare
                assert analyze_sentiment(r["content"]) == stored_sent, r["article_id"]
        if r["topics"]:
            assert extract_topics(r["title"], r["content"]) == json.loads(r["topics"])
        if r["entities"]:
            ours = {
                "people": extract_people(tc),
                "organizations": extract_organizations(tc),
                "locations": extract_locations(tc),
            }
            assert ours == json.loads(r["entities"]), r["article_id"]
        if r["confidence_score"] is not None:
            te = (len(extract_people(tc)) + len(extract_organizations(tc))
                  + len(extract_locations(tc)))
            ours_c = confidence_score(len(r["content"]), te, len(extract_keywords(tc)))
            assert abs(ours_c - r["confidence_score"]) < 1e-9, r["article_id"]
        checked += 1
    assert checked >= 50


def test_summary_divergence_is_punkt_only(corpus):
    """Summary uses nltk punkt in the reference; our regex splitter is the
    documented divergence (enrich.py M10 note). It still matches on the
    majority of real pages — pin the floor so regressions surface."""
    from omni_ray.functions.enrich import generate_summary

    n = ok = 0
    for r in corpus:
        if r["summary"] and r["article_id"].startswith("article_"):
            n += 1
            if generate_summary(r["content"])[1] == r["summary"]:
                ok += 1
    assert n >= 40 and ok / n >= 0.5
