"""Serving-layer tests: every route end-to-end over real loopback HTTP,
the /metrics body parsing as Prometheus text, the query allow-list
enforced, and a REAL urllib webhook channel delivering an alert from the
AlertEngine into the server's /hook sink."""

import json
import urllib.error
import urllib.request

import pytest

from omni_ray.serve import DashboardServer, make_http_webhook_channel

SF = "/root/testdata/sf0.001"


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        ctype = r.headers.get("Content-Type", "")
        body = r.read()
    return ctype, body


@pytest.fixture()
def server(ray_session):
    from omni_ray.pipelines.monitor import SystemMonitor
    from omni_ray.pipelines.queries import REGISTRY

    mon = SystemMonitor()
    mon.gauges["system_cpu_percent"].set(7.5)
    queries = {name: fn for name, (fn, _sql) in REGISTRY.items()}
    srv = DashboardServer(SF, monitor=mon, queries=queries,
                          allowed=["global_stats", "daily_timeseries"]).start()
    yield srv
    srv.stop()


def test_routes(server):
    ctype, body = _get(server.url + "/health")
    assert json.loads(body)["services"]["ray"] == "healthy"

    ctype, body = _get(server.url + "/metrics")
    assert ctype.startswith("text/plain")
    text = body.decode()
    if server.monitor.registry:
        assert "system_cpu_percent 7.5" in text
        assert "# TYPE system_cpu_percent gauge" in text

    _, body = _get(server.url + "/api/stats")
    stats = json.loads(body)
    assert isinstance(stats, list) and len(stats) >= 1

    _, body = _get(server.url + "/api/timeseries")
    ts = json.loads(body)
    assert len(ts) > 5

    # allow-listed query reachable by name; others 404
    _, body = _get(server.url + "/api/query/global_stats")
    assert json.loads(body) == stats
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server.url + "/api/query/exact_dedup")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server.url + "/definitely/not/a/route")
    assert ei.value.code == 404


def test_real_webhook_channel_delivers(server):
    from omni_ray.pipelines.alerts import AlertEngine, AlertRule

    eng = AlertEngine([AlertRule(
        id="r1", name="high error rate", metric="crawl.error_rate",
        condition=">", threshold=0.5, channels=["webhook"])])
    eng.register_channel("webhook",
                         make_http_webhook_channel(server.url + "/hook"))
    fired = eng.evaluate({"crawl": {"error_rate": 0.9}}, now_minutes=0.0)
    assert len(fired) == 1
    assert len(server.received_hooks) == 1
    hook = server.received_hooks[0]
    assert hook["text"] == "[warning] high error rate"
    assert hook["alert"]["rule_id"] == "r1"
    assert hook["alert"]["value"] == 0.9
