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
                          allowed=["global_stats", "daily_timeseries",
                                   "per_category_rollup", "daily_type_matrix",
                                   "per_domain_topk"]).start()
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


def test_analytics_figure_routes(server):
    """dashboard.py:327-353 figure routes: each returns {'chart': plotly
    figure JSON, 'data': {...}} with the reference's trace/layout fields."""
    _, body = _get(server.url + "/api/analytics/categories")
    cat = json.loads(body)
    traces = cat["chart"]["data"]
    assert [t["type"] for t in traces] == ["bar", "scatter"]
    assert traces[1]["yaxis"] == "y2"  # dual axis: quality on the right
    assert cat["chart"]["layout"]["yaxis2"]["overlaying"] == "y"
    assert len(cat["data"]["categories"]) == len(cat["data"]["counts"]) > 0

    _, body = _get(server.url + "/api/analytics/sentiment")
    sent = json.loads(body)
    assert all(t["stackgroup"] == "one" for t in sent["chart"]["data"])
    assert len(sent["chart"]["data"]) == 5  # one stacked trace per event type
    assert sent["chart"]["layout"]["hovermode"] == "x unified"

    _, body = _get(server.url + "/api/analytics/domains")
    dom = json.loads(body)
    m = dom["chart"]["data"][0]["marker"]
    assert m["sizemode"] == "area" and m["colorscale"] == "Viridis"
    assert len(m["size"]) == len(dom["data"]["domains"]) > 0

    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server.url + "/api/analytics/nope")
    assert ei.value.code == 404


def test_analytics_html_page(server):
    ctype, body = _get(server.url + "/analytics")
    assert ctype.startswith("text/html")
    html = body.decode()
    for div in ("fig-categories", "fig-sentiment", "fig-domains"):
        assert div in html
    assert "Plotly.newPlot" in html and "plotly-2" in html
    # figure JSON is inlined and valid
    assert '"type": "bar"' in html


def test_empty_figure_fallback():
    """The reference's no-data path (dashboard.py:781-792): annotation-only
    layout, no traces."""
    from omni_ray.figures import category_figure

    fig = category_figure([], [], [])
    assert fig["chart"]["data"] == []
    ann = fig["chart"]["layout"]["annotations"][0]
    assert ann["xref"] == "paper" and not ann["showarrow"]


def test_email_channel_real_smtp_exchange(server):
    """alert_engine.py:236-287: the email sender completes a REAL smtplib
    exchange against a loopback SMTP server; the MIME body carries the
    severity-colored HTML."""
    from omni_ray.pipelines.alerts import AlertEngine, AlertRule
    from omni_ray.serve import LoopbackSMTPServer, make_email_channel

    smtp = LoopbackSMTPServer().start()
    try:
        eng = AlertEngine([AlertRule(
            id="mail1", name="fetch stall", metric="crawl.error_rate",
            condition=">", threshold=0.5, severity="critical",
            channels=["email"])])
        eng.register_channel("email", make_email_channel({
            "smtp_server": "127.0.0.1", "smtp_port": smtp.port,
            "from_email": "alerts@omni-ray.local",
            "to_email": "oncall@omni-ray.local",
        }))
        fired = eng.evaluate({"crawl": {"error_rate": 0.8}}, now_minutes=0.0)
        assert len(fired) == 1
        assert len(smtp.messages) == 1
        mail_from, rcpts, data = smtp.messages[0]
        assert mail_from == "alerts@omni-ray.local"
        assert rcpts == ["oncall@omni-ray.local"]
        body = data.decode("utf-8", "replace")
        assert "Subject: [CRITICAL] fetch stall" in body
        assert "#dc3545" in body  # the reference's critical color
        assert "crawl.error_rate" in body
    finally:
        smtp.stop()


def test_slack_channel_payload_shape(server):
    """alert_engine.py:290-335: the Slack sender POSTs the attachments
    payload (color/title/short fields) over real loopback HTTP."""
    from omni_ray.pipelines.alerts import AlertEngine, AlertRule
    from omni_ray.serve import make_slack_channel

    eng = AlertEngine([AlertRule(
        id="s1", name="quality drop", metric="articles.avg_quality",
        condition="<", threshold=40, severity="warning",
        channels=["slack"])])
    eng.register_channel("slack", make_slack_channel(server.url + "/hook"))
    fired = eng.evaluate({"articles": {"avg_quality": 12}}, now_minutes=0.0)
    assert len(fired) == 1
    payload = server.received_hooks[-1]
    att = payload["attachments"][0]
    assert att["color"] == "#ffc107"  # warning
    assert att["title"].endswith("quality drop")
    fields = {f["title"]: f["value"] for f in att["fields"]}
    assert float(fields["Current Value"]) == 12
    assert float(fields["Threshold"]) == 40
    assert fields["Severity"] == "WARNING"
    assert all(f["short"] for f in att["fields"])


def test_analytics_routes_honor_allow_list(ray_session):
    """A narrowed server must not serve figures whose underlying query is
    off the allow-list (same contract as /api/query)."""
    import urllib.error

    from omni_ray.pipelines.queries import REGISTRY
    from omni_ray.serve import DashboardServer

    srv = DashboardServer(
        SF, queries={n: f for n, (f, _s) in REGISTRY.items()},
        allowed=["global_stats"],  # figures' queries deliberately excluded
    ).start()
    try:
        for kind in ("categories", "sentiment", "domains"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _get(srv.url + f"/api/analytics/{kind}")
            assert ei.value.code == 404
        # the HTML page renders, but with no figures
        _, body = _get(srv.url + "/analytics")
        assert b"fig-categories" not in body
    finally:
        srv.stop()
