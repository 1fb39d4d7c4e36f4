"""Tests for discovery sources (S1/S2), alert engine (A10), composition
surface (§2.10), and the M15 sentiment label."""

import pyarrow as pa
import pytest

RSS_BODY = """<?xml version="1.0"?>
<rss version="2.0"><channel><title>Feed</title>
<item><title>Story One</title><link>https://ex.com/a/1</link><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
<item><title><![CDATA[Story & Two]]></title><link>https://ex.com/a/2</link></item>
</channel></rss>"""

MALFORMED_RSS = """<rss><channel>
<item><title>Broken & feed</title><link>https://ex.com/b/1</link></item>
<item><link>https://ex.com/b/2</link>
</channel>"""

SITEMAP_BODY = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://ex.com/s/1</loc></url>
<url><loc>https://ex.com/s/2</loc></url>
</urlset>"""


def test_parse_rss_and_fallback():
    from omni_ray.sources.discovery import parse_rss

    recs = parse_rss(RSS_BODY)
    assert [r["url"] for r in recs] == ["https://ex.com/a/1", "https://ex.com/a/2"]
    assert recs[0]["title"] == "Story One"
    assert recs[0]["published"].startswith("Mon, 01 Jan")
    # malformed → regex fallback still extracts linked items
    recs2 = parse_rss(MALFORMED_RSS)
    assert "https://ex.com/b/1" in [r["url"] for r in recs2]


def test_parse_sitemap():
    from omni_ray.sources.discovery import parse_sitemap

    assert parse_sitemap(SITEMAP_BODY) == ["https://ex.com/s/1", "https://ex.com/s/2"]
    assert parse_sitemap("<urlset><url><loc>https://x.com/1</loc>") == ["https://x.com/1"]


def test_discover_batch_shapes_and_priorities():
    from omni_ray.sources.discovery import discover_batch

    batch = pa.table(
        {
            "feed_url": ["https://ex.com/rss", "https://ex.com/map"],
            "kind": ["rss", "sitemap"],
            "body": [RSS_BODY.encode(), SITEMAP_BODY.encode()],
            "feed_seq": [0, 1],
        }
    )
    out = discover_batch(batch)
    recs = out.to_pylist()
    rss = [r for r in recs if r["source"] == "rss"]
    maps = [r for r in recs if r["source"] == "sitemap"]
    assert {r["priority"] for r in rss} == {10}
    assert {r["priority"] for r in maps} == {5}
    # deterministic, strictly increasing discovery_ts within a feed
    ts = [r["discovery_ts"] for r in rss]
    assert ts == sorted(ts)


def test_alert_engine_cooldown_and_dotpath():
    from omni_ray.pipelines.alerts import AlertEngine, AlertRule, get_metric_value

    metrics = {"crawl": {"error_rate": 0.4, "fetched": 90, "scheduled": 100}}
    assert get_metric_value(metrics, "crawl.error_rate") == 0.4
    assert get_metric_value(metrics, "crawl.missing") is None

    eng = AlertEngine([
        AlertRule(id="r1", name="high error rate", metric="crawl.error_rate",
                  condition=">", threshold=0.3, cooldown_minutes=30),
        AlertRule(id="r2", name="low fetch", metric="crawl.fetched",
                  condition="<", threshold=50),
    ])
    fired = eng.evaluate(metrics, now_minutes=0)
    assert [a["rule_id"] for a in fired] == ["r1"]
    # cooldown: same rule not re-fired within 30 minutes
    assert eng.evaluate(metrics, now_minutes=10) == []
    assert [a["rule_id"] for a in eng.evaluate(metrics, now_minutes=31)] == ["r1"]


def test_crawl_metrics_fold():
    from omni_ray.pipelines.alerts import crawl_metrics_from_counters

    rows = [
        {"counter": "scheduled", "value": 100},
        {"counter": "fetched", "value": 90},
        {"counter": "scheduled", "value": 50},
        {"counter": "fetched", "value": 45},
    ]
    m = crawl_metrics_from_counters(rows)
    assert m["crawl"]["scheduled"] == 150
    assert m["crawl"]["success_rate"] == pytest.approx(135 / 150)


@pytest.mark.usefixtures("ray_session")
def test_pipeline_compose_and_extractor_chain():
    import ray.data

    from omni_ray.functions.clean import clean_content
    from omni_ray.pipelines.compose import ExtractorChain, Pipeline

    chain = ExtractorChain(
        [
            ("cleaner", lambda html, url: clean_content(html, url) or None),
            ("basic", lambda html, url: "fallback text from basic engine"),
        ]
    )
    para = ("Real content paragraph with plenty of words to pass every gate in the "
            "cleaner ladder today. Another sentence follows with more words to be safe.")
    tbl = pa.table(
        {
            "url": ["https://a.com/1", "https://a.com/2"],
            "html": [f"<article>\n<p>{para}</p>\n<p>{para}</p>\n</article>".encode(), b"<p>x</p>"],
        }
    )
    ds = ray.data.from_arrow(tbl)
    pipe = Pipeline().then("extract", lambda d: d.map_batches(chain, batch_format="pyarrow"))
    out, counters = pipe.run(ds, count_stages=True)
    rows = sorted(out.take_all(), key=lambda r: r["url"])
    assert rows[0]["crawler_engine"] == "cleaner" and para in rows[0]["extracted_text"]
    assert rows[1]["crawler_engine"] == "basic"  # fallback engine won
    assert counters == {"extract": 2}


@pytest.mark.usefixtures("ray_session")
def test_two_real_engines_fallback_order():
    """S4: the two-engine registry (semantic-main primary, reference cleaner
    fallback) — engine 2 must fill rows engine 1 rejects, and the full
    article pipeline must record which engine produced each row."""
    import ray.data

    from omni_ray.functions.engines import extract_fallback, extract_semantic_main
    from omni_ray.pipelines.articles import article_pipeline

    para = ("Real content paragraph with plenty of words to pass every gate in the "
            "cleaner ladder today. Another sentence follows with more words to be safe. "
            "A third sentence keeps the average sentence length inside the band.")
    # page A: title + <article> container → semantic engine succeeds
    html_a = (f"<html><head><title>A proper headline</title></head><body>"
              f"<article><p>{para}</p><p>{para}</p></article></body></html>")
    # page B: same content but in plain divs, no semantic container → engine 1
    # returns None ("insufficient content"), reference cleaner extracts it
    html_b = (f"<html><head><title>Another headline</title></head><body>"
              f"<div class='content'><p>{para}</p><p>{para}</p></div></body></html>")
    # page C: semantic container but thin content → engine 1 rejects (<200 chars)
    html_c = ("<html><head><title>Thin</title></head><body>"
              "<article><p>too short</p></article></body></html>")

    assert extract_semantic_main(html_a) and para in extract_semantic_main(html_a)
    assert extract_semantic_main(html_b) is None
    assert extract_semantic_main(html_c) is None
    assert extract_fallback(html_b) and para in extract_fallback(html_b)

    import pandas as pd

    base_ts = pd.Timestamp("2024-01-05")
    tbl = pa.table({
        "url": ["https://e.com/a", "https://e.com/b", "https://e.com/c"],
        "warc_ts": pa.array([base_ts] * 3, pa.timestamp("us")),
        "html": [html_a.encode(), html_b.encode(), html_c.encode()],
    })
    arts = article_pipeline(
        ray.data.from_arrow(tbl), gate_articles=False, use_engine_chain=True
    ).take_all()
    engines = {r["url"][-1]: r["crawler_engine"] for r in arts}
    assert engines["a"] == "semantic_main"
    assert engines["b"] == "fallback"  # engine-2 fills what engine-1 rejected
    texts = {r["url"][-1]: r["content"] for r in arts}
    assert para in texts["a"] and para in texts["b"]


def test_sentiment_label_fallback():
    from omni_ray.functions.enrich import sentiment_label

    pos = sentiment_label("what a good great excellent wonderful day")
    neg = sentiment_label("a terrible awful horrible worst experience")
    neu = sentiment_label("the report described the meeting schedule")
    assert pos["sentiment_label"] == "positive" and pos["sentiment_polarity"] > 0.1
    assert neg["sentiment_label"] == "negative"
    assert neu["sentiment_label"] == "neutral"
    assert 0.0 <= pos["sentiment_subjectivity"] <= 1.0


def test_key_phrases_deterministic():
    from omni_ray.functions.enrich import extract_key_phrases

    text = ("Buckingham Palace released an official statement praising Dame Jilly "
            "Cooper for her charitable work and her romantic novels today.")
    p1, p2 = extract_key_phrases(text), extract_key_phrases(text)
    assert p1 == p2
    assert any("Buckingham Palace" in p for p in p1)
    assert all(10 < len(p) < 50 for p in p1)
    assert extract_key_phrases("") == []


def test_selector_based_extractors():
    from omni_ray.functions.extract import (
        extract_authors_selectors,
        extract_publish_date_selectors,
    )

    html = ('<div><span class="byline">Jane Miller</span>'
            '<a rel="author">Tom Okafor</a>'
            '<time datetime="2024-01-05T10:00:00Z">Jan 5</time></div>')
    assert extract_authors_selectors(html) == ["Jane Miller", "Tom Okafor"]
    assert extract_publish_date_selectors(html) == "2024-01-05T10:00:00Z"
    assert extract_publish_date_selectors('<p class="publish-date"> May 1 </p>') == "May 1"
    assert extract_publish_date_selectors("<p>no date</p>") is None


@pytest.mark.usefixtures("ray_session")
def test_dead_letter_capture(tmp_path):
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from omni_ray.pipelines.deadletter import DeadLetterWrapper

    def poison_fn(t: pa.Table) -> pa.Table:
        if any((u or "").endswith("/3") for u in t.column("url").to_pylist()):
            raise ValueError("poison page")
        return t.append_column("n", pa.array([1] * t.num_rows, pa.int64()))

    tbl = pa.table({"url": [f"https://x.com/{i}" for i in range(10)]})
    dl_dir = str(tmp_path / "dl")
    wrapped = DeadLetterWrapper(poison_fn, dl_dir)
    out = ray.data.from_arrow(tbl).map_batches(wrapped, batch_format="pyarrow").take_all()
    assert len(out) == 9  # poison row dropped, block survived
    dl = pa.concat_tables([pq.read_table(f) for f in glob.glob(f"{dl_dir}/*.parquet")])
    assert dl.num_rows == 1
    assert dl.column("url")[0].as_py() == "https://x.com/3"
    assert "poison page" in dl.column("error")[0].as_py()


def test_crawl_config_from_dict():
    from omni_ray.pipelines.config import CrawlConfig

    cfg = CrawlConfig.from_dict(
        {
            "crawler": {"max_concurrent_crawls": 3, "respect_robots_txt": False,
                        "crawl_interval_seconds": 60},
            "sources": [
                {"url": "https://a.com/rss", "kind": "rss", "enabled": True},
                {"url": "https://b.com/map", "type": "sitemap", "enabled": False},
            ],
            "validation": {"blocked_domains": ["bad.example"]},
            "engine": {"n_seen_shards": 2, "distributed_frontier": True},
        }
    )
    assert cfg.budget_per_host == 3 and not cfg.respect_robots_txt
    assert [s.url for s in cfg.enabled_sources()] == ["https://a.com/rss"]
    assert cfg.blocked_domains == ["bad.example"]
    assert cfg.distributed_frontier and cfg.n_seen_shards == 2
    # defaults mirror the reference config
    d = CrawlConfig()
    assert d.budget_per_host == 5 and d.crawl_interval_seconds == 300


def test_alert_channel_registry_dispatch(tmp_path):
    """A triggered rule dispatches to every registered channel it names,
    cooldown suppresses re-dispatch, unregistered names are skipped, and a
    failing sink never blocks evaluation."""
    import os

    from omni_ray.pipelines.alerts import (
        AlertEngine,
        AlertRule,
        make_log_channel,
        make_parquet_channel,
    )

    eng = AlertEngine([
        AlertRule(id="r1", name="high errors", metric="crawl.error_rate",
                  condition=">", threshold=0.5, cooldown_minutes=30,
                  channels=["log", "parquet", "missing", "broken"]),
    ])
    log_sink = make_log_channel()
    eng.register_channel("log", log_sink)
    pq_dir = str(tmp_path / "alerts")
    eng.register_channel("parquet", make_parquet_channel(pq_dir))

    def broken(alert):
        raise RuntimeError("sink down")

    eng.register_channel("broken", broken)

    metrics = {"crawl": {"error_rate": 0.9}}
    t1 = eng.evaluate(metrics, now_minutes=0.0)
    assert len(t1) == 1
    assert len(log_sink.records) == 1
    assert len(os.listdir(pq_dir)) == 1
    assert eng.dispatch_stats == {"sent": 2, "skipped": 1, "failed": 1}

    # within cooldown: no trigger, no new dispatch
    assert eng.evaluate(metrics, now_minutes=10.0) == []
    assert len(log_sink.records) == 1

    # after cooldown: dispatched again to both working channels
    t3 = eng.evaluate(metrics, now_minutes=31.0)
    assert len(t3) == 1
    assert len(log_sink.records) == 2
    assert len(os.listdir(pq_dir)) == 2
