"""Monitoring gauges (reference src/monitoring/system_monitor.py:16-343),
re-expressed for a Ray cluster:

  * system metrics  — psutil when present (the reference's source, :74-103);
    otherwise stdlib fallbacks (os.getloadavg, /proc/meminfo,
    shutil.disk_usage) so the surface works in this container. Extended with
    the Ray-native cluster gauges (total/available CPUs, object-store bytes)
    that replace single-host CPU% as the capacity signal on a cluster.
  * corpus metrics  — the reference's PG queries (:161-206: total articles,
    articles in the last hour, avg quality, high/low-quality counts, unique
    domains) folded into ONE Dataset aggregate pass + one small groupby
    (map-side indicator columns; no driver loop).
  * prometheus      — Gauge objects when prometheus_client is installed
    (:30-37), else a dict-backed stub with the same .set/.inc API.
  * health status   — the healthy/degraded service-check shape (:304-343)
    over the services THIS engine depends on: the Ray runtime and the
    checkpoint directory.
  * history         — snapshots appended to a parquet directory with a
    max-keep trim (the redis setex/history-trim analogue, :267-291).

Alert evaluation plugs into pipelines/alerts.AlertEngine (the reference's
_evaluate_alerts, :111-122) with its deterministic injected clock.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq


class _StubGauge:
    """prometheus_client.Gauge-shaped stub (set/inc/get) backing a dict."""

    def __init__(self, registry: dict, name: str):
        self.registry = registry
        self.name = name
        registry[name] = 0.0

    def set(self, v: float) -> None:
        self.registry[self.name] = float(v)

    def inc(self, v: float = 1.0) -> None:
        self.registry[self.name] += v


def make_gauges(names: list[str]) -> tuple[dict, dict]:
    """→ (gauge objects by name, backing registry dict). Real prometheus
    Gauges when the client is installed; stubs otherwise."""
    registry: dict = {}
    try:
        from prometheus_client import Gauge  # type: ignore

        gauges = {n: Gauge(n, n.replace("_", " ")) for n in names}
    except Exception:
        gauges = {n: _StubGauge(registry, n) for n in names}
    return gauges, registry


def prometheus_text(registry: dict) -> str:
    """Prometheus text exposition (format 0.0.4): HELP/TYPE header pairs +
    one sample line per gauge, names in sorted order for a stable body.
    Values use the shortest round-trip float form ('%.10g'), matching what
    the official client writes for these magnitudes."""
    lines = []
    for name in sorted(registry):
        v = float(registry[name])
        lines.append(f"# HELP {name} {name.replace('_', ' ')}")
        lines.append(f"# TYPE {name} gauge")
        lines.append(f"{name} {format(v, '.10g')}")
    return "\n".join(lines) + "\n"


def collect_system_metrics() -> dict:
    """system_monitor.py:74-103 shape; psutil → stdlib fallback; plus Ray
    cluster capacity gauges."""
    out: dict = {"timestamp_s": time.time()}
    try:
        import psutil  # type: ignore

        out["cpu_percent"] = psutil.cpu_percent(interval=0.1)
        mem = psutil.virtual_memory()
        out["memory_percent"] = mem.percent
        out["memory_total_gb"] = round(mem.total / (1 << 30), 2)
    except Exception:
        # stdlib fallbacks: load-average as CPU proxy, /proc/meminfo
        try:
            ncpu = os.cpu_count() or 1
            out["cpu_percent"] = round(100.0 * os.getloadavg()[0] / ncpu, 2)
        except OSError:
            out["cpu_percent"] = 0.0
        try:
            info = {}
            with open("/proc/meminfo") as f:
                for line in f:
                    k, v = line.split(":", 1)
                    info[k] = int(v.strip().split()[0])  # kB
            total, avail = info["MemTotal"], info.get("MemAvailable", 0)
            out["memory_percent"] = round(100.0 * (total - avail) / total, 2)
            out["memory_total_gb"] = round(total / (1 << 20), 2)
        except Exception:
            out["memory_percent"] = 0.0
            out["memory_total_gb"] = 0.0
    du = shutil.disk_usage("/")
    out["disk_percent"] = round(100.0 * du.used / du.total, 2)
    out["disk_total_gb"] = round(du.total / (1 << 30), 2)
    try:
        import ray

        if ray.is_initialized():
            total = ray.cluster_resources()
            avail = ray.available_resources()
            out["ray_total_cpus"] = float(total.get("CPU", 0.0))
            out["ray_available_cpus"] = float(avail.get("CPU", 0.0))
            out["ray_object_store_bytes"] = float(total.get("object_store_memory", 0.0))
    except Exception:
        pass
    return out


def collect_corpus_metrics(articles, now_us: int) -> dict:
    """The reference's database metrics (:161-206) as one aggregate pass:
    total articles, last-hour count, avg quality, high(≥80)/low(<50) quality
    counts, distinct domains. ``articles`` is the 41-col Dataset;
    ``now_us`` is the injected clock (determinism rule)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    hour_ago = now_us - 3_600_000_000

    def ind(t: pa.Table) -> pa.Table:
        q = t.column("quality_score")
        ts = pc.cast(t.column("processing_timestamp"), pa.int64())
        return pa.table({
            "quality_score": q,
            "high_q": pc.cast(pc.greater_equal(q, 80), pa.int64()),
            "low_q": pc.cast(pc.less(q, 50), pa.int64()),
            "recent": pc.cast(pc.greater_equal(ts, hour_ago), pa.int64()),
            "domain": t.column("domain"),
        })

    pruned = articles.select_columns(
        ["quality_score", "processing_timestamp", "domain"]
    ).map_batches(ind, batch_format="pyarrow").materialize()
    # Dataset.aggregate returns None on an empty dataset — a zero-article
    # wave is a normal monitor tick, not a crash
    agg = pruned.aggregate(
        Count(alias_name="total_articles"),
        Mean("quality_score", alias_name="avg_quality"),
        Sum("high_q", alias_name="high_quality_count"),
        Sum("low_q", alias_name="low_quality_count"),
        Sum("recent", alias_name="recent_articles_1h"),
    ) or {}
    n_domains = pruned.groupby("domain").aggregate(Count(alias_name="c")).count()
    return {
        "total_articles": int(agg.get("total_articles") or 0),
        "recent_articles_1h": int(agg.get("recent_articles_1h") or 0),
        "avg_quality": round(float(agg.get("avg_quality") or 0.0), 2),
        "high_quality_count": int(agg.get("high_quality_count") or 0),
        "low_quality_count": int(agg.get("low_quality_count") or 0),
        "unique_domains": int(n_domains),
    }


class SystemMonitor:
    """The monitoring loop's collect → gauge-update → snapshot → alert cycle
    (system_monitor.py:57-72), driven explicitly per tick (the caller owns
    the cadence; no daemon thread — a crawl loop ticks it per wave)."""

    GAUGE_NAMES = [
        "system_cpu_percent", "system_memory_percent", "system_disk_percent",
        "system_article_count", "crawl_success_rate",
    ]

    def __init__(self, history_dir: str | None = None, max_history: int = 1440,
                 alert_engine=None):
        self.gauges, self.registry = make_gauges(self.GAUGE_NAMES)
        self.history_dir = history_dir
        self.max_history = max_history
        self.alert_engine = alert_engine
        self.monitoring_data: dict = {}

    def tick(self, articles=None, crawl_metrics: dict | None = None,
             now_us: int = 0, now_minutes: float = 0.0) -> list[dict]:
        """One monitoring cycle; returns triggered alerts (possibly [])."""
        self.monitoring_data["system"] = collect_system_metrics()
        if articles is not None:
            self.monitoring_data["database"] = collect_corpus_metrics(articles, now_us)
        if crawl_metrics:
            self.monitoring_data.update(crawl_metrics)
        self._update_gauges()
        if self.history_dir:
            self._store_snapshot(now_us)
        if self.alert_engine is not None:
            return self.alert_engine.evaluate(self.monitoring_data, now_minutes)
        return []

    def _update_gauges(self) -> None:
        sysm = self.monitoring_data.get("system", {})
        self.gauges["system_cpu_percent"].set(sysm.get("cpu_percent", 0.0))
        self.gauges["system_memory_percent"].set(sysm.get("memory_percent", 0.0))
        self.gauges["system_disk_percent"].set(sysm.get("disk_percent", 0.0))
        db = self.monitoring_data.get("database", {})
        if db:
            self.gauges["system_article_count"].set(db.get("total_articles", 0))
        crawl = self.monitoring_data.get("crawl", {})
        if crawl:
            self.gauges["crawl_success_rate"].set(crawl.get("success_rate", 0.0))

    def _store_snapshot(self, now_us: int) -> None:
        """Parquet-history analogue of the redis setex/trim (:267-291)."""
        os.makedirs(self.history_dir, exist_ok=True)
        tbl = pa.table({
            "now_us": pa.array([now_us], pa.int64()),
            "snapshot": pa.array([json.dumps(self.monitoring_data, sort_keys=True)],
                                 pa.string()),
        })
        pq.write_table(tbl, os.path.join(self.history_dir, f"snap-{now_us:020d}.parquet"))
        snaps = sorted(f for f in os.listdir(self.history_dir) if f.startswith("snap-"))
        for f in snaps[: max(0, len(snaps) - self.max_history)]:
            os.remove(os.path.join(self.history_dir, f))

    def get_current_metrics(self) -> dict:
        return self.monitoring_data

    def exposition(self) -> str:
        """Prometheus text exposition (format 0.0.4) of the gauge registry —
        the /metrics body the reference serves from its Gauge objects
        (system_monitor.py:267-291). Works off the dict-backed stub registry
        so it needs no prometheus_client; when the real client is installed
        the Gauges self-register with its own exposition path instead."""
        return prometheus_text(self.registry)

    def get_health_status(self, now_s: float | None = None) -> dict:
        """healthy/degraded service checks (:304-343) for the services this
        engine actually has: the Ray runtime and the history/checkpoint dir."""
        health = {"status": "healthy", "services": {}}
        try:
            import ray

            health["services"]["ray"] = "healthy" if ray.is_initialized() else "unhealthy"
        except Exception as e:  # pragma: no cover
            health["services"]["ray"] = f"unhealthy: {e}"
        if health["services"]["ray"] != "healthy":
            health["status"] = "degraded"
        if self.history_dir:
            try:
                os.makedirs(self.history_dir, exist_ok=True)
                probe = os.path.join(self.history_dir, ".health_probe")
                with open(probe, "w") as f:
                    f.write("ok")
                os.remove(probe)
                health["services"]["history_store"] = "healthy"
            except OSError as e:
                health["services"]["history_store"] = f"unhealthy: {e}"
                health["status"] = "degraded"
        return health
