"""Monitoring gauges (system_monitor.py analogue): system metrics shape,
corpus metrics as one Dataset aggregate, gauge updates, history trim,
health status, and alert integration."""

import os

import pyarrow as pa
import pytest


def _articles_tbl(n=40):
    base = 1_700_000_000_000_000
    return pa.table({
        "quality_score": pa.array([90 if i % 4 == 0 else (40 if i % 4 == 1 else 65)
                                   for i in range(n)], pa.int64()),
        "processing_timestamp": pa.array(
            [base + i * 60_000_000 for i in range(n)], pa.timestamp("us")
        ),
        "domain": pa.array([f"d{i % 5}.com" for i in range(n)], pa.string()),
    })


def test_system_metrics_shape():
    from omni_ray.pipelines.monitor import collect_system_metrics

    m = collect_system_metrics()
    for key in ("cpu_percent", "memory_percent", "disk_percent"):
        assert key in m and 0.0 <= m[key] <= 100.0 * 64  # loadavg proxy can exceed 100


@pytest.mark.usefixtures("ray_session")
def test_corpus_metrics_single_pass():
    import ray.data

    from omni_ray.pipelines.monitor import collect_corpus_metrics

    n = 40
    base = 1_700_000_000_000_000
    now_us = base + (n - 1) * 60_000_000  # last row's ts
    ds = ray.data.from_arrow(_articles_tbl(n))
    m = collect_corpus_metrics(ds, now_us=now_us)
    assert m["total_articles"] == n
    assert m["high_quality_count"] == sum(1 for i in range(n) if i % 4 == 0)
    assert m["low_quality_count"] == sum(1 for i in range(n) if i % 4 == 1)
    assert m["unique_domains"] == 5
    # rows within [now-1h, now]: 60 per hour spacing -> exactly 61 or n
    assert m["recent_articles_1h"] == min(n, 61)
    got_avg = m["avg_quality"]
    want_avg = sum(90 if i % 4 == 0 else (40 if i % 4 == 1 else 65) for i in range(n)) / n
    assert abs(got_avg - want_avg) < 0.01


@pytest.mark.usefixtures("ray_session")
def test_monitor_tick_gauges_history_alerts(tmp_path):
    import ray.data

    from omni_ray.pipelines.alerts import AlertEngine, AlertRule
    from omni_ray.pipelines.monitor import SystemMonitor

    engine = AlertEngine([
        AlertRule(id="low_success", name="low crawl success",
                  metric="crawl.success_rate", condition="<", threshold=0.9),
    ])
    hist = str(tmp_path / "monhist")
    mon = SystemMonitor(history_dir=hist, max_history=3, alert_engine=engine)
    ds = ray.data.from_arrow(_articles_tbl(40))
    crawl_metrics = {"crawl": {"scheduled": 100, "fetched": 80, "success_rate": 0.8}}

    alerts = mon.tick(articles=ds, crawl_metrics=crawl_metrics,
                      now_us=1_700_000_000_000_000, now_minutes=0.0)
    assert [a["rule_id"] for a in alerts] == ["low_success"]
    # gauges reflect the data (stub registry when prometheus_client absent)
    if mon.registry:
        assert mon.registry["system_article_count"] == 40
        assert mon.registry["crawl_success_rate"] == 0.8
    # history trim: 5 ticks, keep max 3
    for k in range(1, 5):
        mon.tick(crawl_metrics=crawl_metrics,
                 now_us=1_700_000_000_000_000 + k, now_minutes=1000.0 * k)
    snaps = [f for f in os.listdir(hist) if f.startswith("snap-")]
    assert len(snaps) == 3

    health = mon.get_health_status()
    assert health["status"] == "healthy"
    assert health["services"]["ray"] == "healthy"
    assert health["services"]["history_store"] == "healthy"


@pytest.mark.usefixtures("ray_session")
def test_corpus_metrics_empty_dataset():
    """A zero-article wave is a normal monitor tick: Dataset.aggregate
    returns None on empty input and the metrics must degrade to zeros, not
    TypeError."""
    import ray.data

    from omni_ray.pipelines.monitor import collect_corpus_metrics

    ds = ray.data.from_arrow(_articles_tbl(0))
    m = collect_corpus_metrics(ds, now_us=1_700_000_000_000_000)
    assert m["total_articles"] == 0
    assert m["avg_quality"] == 0.0
    assert m["unique_domains"] == 0


def test_prometheus_exposition_matches_registry():
    """The /metrics text body must carry exactly the gauge registry: one
    HELP/TYPE/sample triple per gauge in sorted order, values round-tripping
    through float() (reference system_monitor.py:267-291)."""
    from omni_ray.pipelines.monitor import SystemMonitor, prometheus_text

    mon = SystemMonitor()
    if not mon.registry:  # real prometheus_client installed: stub unused
        import pytest
        pytest.skip("prometheus_client present; exposition owned by client")
    mon.gauges["system_cpu_percent"].set(12.5)
    mon.gauges["system_article_count"].set(40)
    mon.gauges["crawl_success_rate"].set(0.8)
    body = mon.exposition()
    assert body == prometheus_text(mon.registry)
    lines = body.strip().split("\n")
    names = sorted(mon.registry)
    assert len(lines) == 3 * len(names)
    parsed = {}
    for i, name in enumerate(names):
        help_l, type_l, sample = lines[3 * i: 3 * i + 3]
        assert help_l == f"# HELP {name} {name.replace('_', ' ')}"
        assert type_l == f"# TYPE {name} gauge"
        k, v = sample.split(" ")
        assert k == name
        parsed[k] = float(v)
    assert parsed["system_cpu_percent"] == 12.5
    assert parsed["system_article_count"] == 40.0
    assert parsed["crawl_success_rate"] == 0.8
    assert body.endswith("\n")
