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
  /api/query/<name>    — any registered queries() entry (allow-listed at
                         construction; arbitrary names 404 — the server
                         must not become a remote code path)
  POST /hook           — test-support webhook sink: appends the JSON body
                         to ``received_hooks`` (the loopback target that
                         lets make_http_webhook_channel be exercised with
                         a REAL network POST in-sandbox)

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
                           else ["global_stats", "daily_timeseries"])
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
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
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
