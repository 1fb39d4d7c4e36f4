"""HTTP serving layer (round 4): the dashboard/metrics route surface the
reference exposes via Flask (src/web/dashboard.py:101-539 routes,
src/monitoring/system_monitor.py:267-291 gauge exposition), rebuilt on the
stdlib ThreadingHTTPServer so it carries zero dependencies and can run
beside a Ray driver.

Routes (all GET, JSON unless noted):
  /health              — SystemMonitor.get_health_status()
  /metrics             — Prometheus 0.0.4 text (monitor.prometheus_text)
  /api/stats           — global_stats over the configured sf_dir
  /api/timeseries      — daily_timeseries rows
  /analytics           — HTML page embedding the three figures (plotly.js)
  /api/analytics/<k>   — k ∈ {categories, sentiment, domains}: plotly
                         figure JSON + data (figures.py; dashboard.py
                         :327-353 → :755-1004)
  /api/query/<name>    — any registered queries() entry (allow-listed at
                         construction; arbitrary names 404 — the server
                         must not become a remote code path)
  POST /hook           — test-support webhook sink: appends the JSON body
                         to ``received_hooks`` (the loopback target that
                         lets make_http_webhook_channel and
                         make_slack_channel POST over a REAL socket
                         in-sandbox)

Also here: PagesHTTPServer (loopback page store for HttpBackend),
LoopbackSMTPServer (minimal ESMTP sink for make_email_channel), and the
alert sender bodies make_email_channel / make_slack_channel /
make_http_webhook_channel (alert_engine.py:202-335).

Design: queries run in the CALLING Ray session (the server thread shares
the driver's session; routes are driver-side reads of already-small
results — the 100-TB data never flows through HTTP). Responses are
computed per request; a production deployment would memoize behind the
monitor tick, which is one decorator away.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _df_records(obj) -> list[dict]:
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        obj = obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return json.loads(obj.to_json(orient="records"))
    if hasattr(obj, "to_pandas"):  # ray Dataset
        return json.loads(obj.to_pandas().to_json(orient="records"))
    return obj


class DashboardServer:
    """Threaded stdlib HTTP server over the query registry + monitor."""

    def __init__(self, sf_dir: str, monitor=None,
                 queries: dict | None = None,
                 allowed: list[str] | None = None, port: int = 0):
        self.sf_dir = sf_dir
        self.monitor = monitor
        self.queries = queries or {}
        self.allowed = set(allowed if allowed is not None
                           else ["global_stats", "daily_timeseries",
                                 "per_category_rollup", "daily_type_matrix",
                                 "per_domain_topk"])
        self.received_hooks: list[dict] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, code: int, obj):
                self._send(code, json.dumps(obj).encode(),
                           "application/json")

            def do_GET(self):
                try:
                    path = self.path.split("?")[0]
                    if path == "/health":
                        mon = outer.monitor
                        self._json(200, mon.get_health_status() if mon
                                   else {"status": "unknown"})
                    elif path == "/metrics":
                        from .pipelines.monitor import prometheus_text

                        reg = outer.monitor.registry if outer.monitor else {}
                        self._send(200, prometheus_text(reg).encode(),
                                   "text/plain; version=0.0.4")
                    elif path == "/api/stats":
                        self._json(200, outer._run("global_stats"))
                    elif path == "/api/timeseries":
                        self._json(200, outer._run("daily_timeseries"))
                    elif path == "/analytics":
                        self._send(200, outer._analytics_html().encode(),
                                   "text/html; charset=utf-8")
                    elif path.startswith("/api/analytics/"):
                        kind = path[len("/api/analytics/"):]
                        fig = outer._analytics(kind)
                        if fig is None:
                            self._json(404, {"error": f"unknown analytics "
                                                      f"{kind!r}"})
                        else:
                            self._json(200, fig)
                    elif path.startswith("/api/query/"):
                        name = path[len("/api/query/"):]
                        if name not in outer.allowed \
                                or name not in outer.queries:
                            self._json(404, {"error": f"unknown query "
                                                      f"{name!r}"})
                        else:
                            self._json(200, outer._run(name))
                    else:
                        self._json(404, {"error": "no such route"})
                except Exception as e:  # route errors are 500s, not crashes
                    self._json(500, {"error": str(e)[:500]})

            def do_POST(self):
                if self.path != "/hook":
                    self._json(404, {"error": "no such route"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._json(400, {"error": "bad json"})
                    return
                outer.received_hooks.append(payload)
                self._json(200, {"ok": True,
                                 "n_received": len(outer.received_hooks)})

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def _run(self, name: str):
        fn = self.queries[name]
        return _df_records(fn(self.sf_dir))

    # ---- figure routes (dashboard.py:327-353 → 755-1004) -----------------

    # each figure's underlying query — the analytics routes honor the SAME
    # allow-list /api/query enforces (an operator who narrowed the surface
    # must not still pay for pipeline queries via /analytics)
    _ANALYTICS_QUERY = {
        "categories": "per_category_rollup",
        "sentiment": "daily_type_matrix",
        "domains": "per_domain_topk",
    }

    def _analytics(self, kind: str):
        """``/api/analytics/<kind>`` → ``{'chart': figure, 'data': {...}}``
        over the registered aggregate queries (bounded results only);
        404 when the underlying query is not allow-listed."""
        from . import figures

        dep = self._ANALYTICS_QUERY.get(kind)
        if dep is None or dep not in self.allowed:
            return None
        try:
            if kind == "categories" and "per_category_rollup" in self.queries:
                rows = self._run("per_category_rollup")
                rows.sort(key=lambda r: -r["n"])
                return figures.category_figure(
                    [r["event_type"] for r in rows],
                    [r["n"] for r in rows],
                    [round(r["avg_value"] / 1e6, 1) for r in rows],
                )
            if kind == "sentiment" and "daily_type_matrix" in self.queries:
                rows = sorted(self._run("daily_type_matrix"),
                              key=lambda r: r["day"])
                dates = [r["day"] for r in rows]
                series = {
                    c[len("n_"):]: [r[c] for r in rows]
                    for c in (rows[0] if rows else {}) if c.startswith("n_")
                }
                return figures.timeseries_figure(
                    dates, series, title="Events Over Time",
                    ytitle="Number of Events")
            if kind == "domains" and "per_domain_topk" in self.queries:
                rows = self._run("per_domain_topk")
                total_en = [
                    round(100.0 * r["n_en"] / r["n_docs"], 1)
                    if r["n_docs"] else 0.0 for r in rows
                ]
                return figures.domain_figure(
                    [r["source"] for r in rows],
                    [r["n_docs"] for r in rows],
                    [round(r["avg_chars"] / 1e6, 1) for r in rows],
                    total_en,
                )
        except Exception as e:
            return {"chart": figures.empty_figure(
                f"Error Loading {kind.capitalize()} Data", str(e)[:200]),
                "error": str(e)[:500]}
        return None

    def _analytics_html(self) -> str:
        from .figures import dashboard_html

        figs = {}
        for kind in ("categories", "sentiment", "domains"):
            f = self._analytics(kind)
            if f is not None:
                figs[kind] = f
        return dashboard_html(figs)

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def start(self) -> "DashboardServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


class PagesHTTPServer:
    """Loopback page server over the bucketed parquet pages store — the
    in-sandbox stand-in for the open web, so HttpBackend (the real urllib
    engine behind the fetch seam) exercises genuine socket, status and
    timeout semantics (reference network surface: simple_crawler.py:43-58).

    GET /page?url=<quoted-logical-url> → stored html bytes (200) or 404.
    ``delays`` maps logical urls to a server-side sleep in seconds (the
    scripted slow route for timeout-path testing). ``rewrite`` is the
    url_rewrite callable to hand HttpBackend."""

    def __init__(self, pages_dir: str, n_files: int,
                 delays: dict[str, float] | None = None, port: int = 0):
        import time as _time
        from urllib.parse import parse_qs, urlparse

        from .stages.fetchbackend import ParquetStoreBackend

        store = ParquetStoreBackend(pages_dir, n_files)
        delays = dict(delays or {})
        self.n_not_modified = 0  # 304 revalidations served
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                try:
                    p = urlparse(self.path)
                    if p.path != "/page":
                        self.send_error(404)
                        return
                    q = parse_qs(p.query).get("url", [""])[0]
                    d = delays.get(q)
                    if d:
                        _time.sleep(d)
                    r = store.fetch_one(q, timeout_s=0.0)
                    if r.status != 200 or r.html is None:
                        self.send_error(404)
                        return
                    # conditional GET: strong ETag = md5 of the entity;
                    # a matching If-None-Match revalidates with 304 and no
                    # body (RFC 9110 §13.1.2 — the recrawl bandwidth saver)
                    import hashlib as _hl

                    etag = f'"{_hl.md5(r.html).hexdigest()}"'
                    if self.headers.get("If-None-Match") == etag:
                        outer.n_not_modified += 1
                        self.send_response(304)
                        self.send_header("ETag", etag)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("ETag", etag)
                    # page metadata for the crawl's article chain
                    meta = r.meta or {}
                    if meta.get("warc_ts") is not None:
                        self.send_header("X-Warc-Ts", str(meta["warc_ts"]))
                    if meta.get("lang"):
                        self.send_header("X-Lang", str(meta["lang"]))
                    self.send_header("Content-Length", str(len(r.html)))
                    self.end_headers()
                    self.wfile.write(r.html)
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client gave up (timeout test) — not a server error

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def rewrite(self, url: str) -> str:
        from urllib.parse import quote

        return f"http://127.0.0.1:{self.port}/page?url={quote(url, safe='')}"

    def start(self) -> "PagesHTTPServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


_SEVERITY_COLORS = {  # alert_engine.py:244-249 / :296-301
    "critical": "#dc3545", "error": "#dc3545",
    "warning": "#ffc107", "info": "#17a2b8",
}

_EMAIL_HTML = """\
<html>
<body>
    <h2>&#128680; OmniRay Alert</h2>
    <div style="border-left: 4px solid {color}; padding-left: 15px;">
        <h3>{name}</h3>
        <p><strong>Severity:</strong> <span style="color: {color}">{severity}</span></p>
        <p><strong>Metric:</strong> {metric}</p>
        <p><strong>Current Value:</strong> {value}</p>
        <p><strong>Threshold:</strong> {threshold}</p>
    </div>
    <hr>
    <p><small>This alert was triggered by rule: {rule_id}</small></p>
</body>
</html>
"""


def make_email_channel(smtp_config: dict):
    """REAL smtplib email sender (alert_engine.py:236-287 `_send_email_alert`):
    builds the reference's severity-colored HTML MIME message and ships it
    over a live SMTP exchange. ``smtp_config`` keys: smtp_server, smtp_port,
    from_email, to_email, plus optional use_tls / username / password (the
    reference always STARTTLSes against a real provider; the loopback test
    server speaks plain ESMTP). In-sandbox this is exercised against
    LoopbackSMTPServer below."""
    import smtplib
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    def sink(alert: dict) -> None:
        msg = MIMEMultipart()
        msg["Subject"] = f"[{alert['severity'].upper()}] {alert['name']}"
        msg["From"] = smtp_config["from_email"]
        msg["To"] = smtp_config["to_email"]
        html = _EMAIL_HTML.format(
            color=_SEVERITY_COLORS.get(alert["severity"], "#6c757d"),
            name=alert["name"], severity=alert["severity"],
            metric=alert.get("metric", ""), value=alert.get("value", ""),
            threshold=alert.get("threshold", ""),
            rule_id=alert.get("rule_id", ""),
        )
        msg.attach(MIMEText(html, "html"))
        with smtplib.SMTP(smtp_config["smtp_server"],
                          smtp_config["smtp_port"], timeout=10) as server:
            if smtp_config.get("use_tls"):
                server.starttls()
            if smtp_config.get("username"):
                server.login(smtp_config["username"],
                             smtp_config.get("password", ""))
            server.send_message(msg)

    return sink


def make_slack_channel(webhook_url: str, timeout_s: float = 5.0):
    """Slack webhook sender (alert_engine.py:290-335 `_send_slack_alert`):
    the reference's attachment payload — severity color, 🚨 title, and
    short fields for value/threshold/severity — POSTed with urllib.
    In-sandbox it is exercised against DashboardServer's /hook route (the
    payload shape is what Slack's incoming-webhook API accepts)."""
    import urllib.request

    def sink(alert: dict) -> None:
        payload = {
            "attachments": [{
                "color": _SEVERITY_COLORS.get(alert["severity"], "#6c757d"),
                "title": f"\U0001f6a8 {alert['name']}",
                "text": f"{alert.get('metric', '')} = {alert.get('value', '')}"
                        f" (threshold: {alert.get('threshold', '')})",
                "fields": [
                    {"title": "Current Value",
                     "value": str(alert.get("value", "")), "short": True},
                    {"title": "Threshold",
                     "value": str(alert.get("threshold", "")), "short": True},
                    {"title": "Severity",
                     "value": alert["severity"].upper(), "short": True},
                ],
            }],
        }
        req = urllib.request.Request(
            webhook_url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            resp.read()

    return sink


class LoopbackSMTPServer:
    """Minimal threaded ESMTP sink on loopback (test-support twin of the
    /hook route): speaks just enough of RFC 5321 for smtplib to complete a
    real MAIL FROM / RCPT TO / DATA exchange. Received messages land in
    ``messages`` as (mail_from, rcpt_tos, data_bytes)."""

    def __init__(self, port: int = 0):
        import socketserver

        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def _send(self, line: str) -> None:
                self.wfile.write((line + "\r\n").encode())

            def handle(self):
                self._send("220 loopback SMTP")
                mail_from, rcpts = "", []
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    cmd = line.decode("utf-8", "replace").strip()
                    up = cmd.upper()
                    if up.startswith("EHLO"):
                        self.wfile.write(b"250-loopback\r\n250 OK\r\n")
                    elif up.startswith("HELO"):
                        self._send("250 loopback")
                    elif up.startswith("MAIL FROM:"):
                        mail_from = cmd[10:].strip().strip("<>")
                        self._send("250 OK")
                    elif up.startswith("RCPT TO:"):
                        rcpts.append(cmd[8:].strip().strip("<>"))
                        self._send("250 OK")
                    elif up == "DATA":
                        self._send("354 End data with <CR><LF>.<CR><LF>")
                        buf = bytearray()
                        while True:
                            dl = self.rfile.readline()
                            if not dl or dl == b".\r\n":
                                break
                            buf += dl
                        outer.messages.append(
                            (mail_from, list(rcpts), bytes(buf)))
                        self._send("250 OK queued")
                    elif up == "QUIT":
                        self._send("221 bye")
                        return
                    elif up == "RSET":
                        mail_from, rcpts = "", []
                        self._send("250 OK")
                    else:
                        self._send("502 not implemented")

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.messages: list[tuple[str, list[str], bytes]] = []
        self._srv = Server(("127.0.0.1", port), Handler)
        self.port = self._srv.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "LoopbackSMTPServer":
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def make_http_webhook_channel(url: str, timeout_s: float = 5.0):
    """A REAL network webhook sink (urllib POST) for the alert engine —
    the production body behind alerts.make_webhook_channel's seam
    (reference alert_engine.py:202-215). In-sandbox it is exercised
    against DashboardServer's loopback /hook route."""
    import urllib.request

    def post(payload: dict) -> None:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            resp.read()

    from .pipelines.alerts import make_webhook_channel

    return make_webhook_channel(post)
