"""Batch-81 kernel invariants: sentiment set-dedup (repeated words count
once), topic truncation order, and the validator's short-title quirk
(error WITHOUT invalidation — reference parity)."""

import datetime

import pytest

from omni_ray.functions.enrich import analyze_sentiment, extract_topics
from omni_ray.functions.validate import validate_article


def test_sentiment_set_dedup():
    # 'good' three times counts ONCE (set semantics): 1 pos vs 2 neg -> neg
    s = analyze_sentiment("good good good bad terrible")
    assert (s["positive"], s["negative"]) == (1, 2)
    assert s["overall"] < 0
    # tie reads exactly 0.0
    assert analyze_sentiment("good bad")["overall"] == 0.0


def test_topic_truncation_order():
    # four domains matched; detected[:3] keeps dict insertion order
    t = extract_topics("", "ai market medicine game roundup")
    assert t == ["technology", "business", "sports"] or len(t) == 3
    # dict order is technology, politics, business, sports, health
    assert t[0] == "technology"


def test_validator_short_title_quirk():
    content = ("This body is one reasonable sentence. "
               "And another follows it properly. " * 4)
    r = validate_article("tiny", "https://ok.test/x", "ok.test", content,
                         ["Ann"], None, datetime.datetime(2024, 6, 1))
    # the reference records the short title as an ERROR yet leaves
    # is_valid True (validate.py:115-118) - parity, not a bug here
    assert r["is_valid"] is True
    assert any("Title too short" in e for e in r["errors"])
    blocked = validate_article("A perfectly sized title",
                               "https://spam.example.com/x",
                               "spam.example.com", content, ["Ann"], None,
                               datetime.datetime(2024, 6, 1),
                               blocked_domains=["spam.example.com"])
    assert blocked["is_valid"] is False
