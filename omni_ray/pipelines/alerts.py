"""Alert-rule evaluation A10 (SURVEY.md §2.5) — driver-side predicates over
the collected metrics/counters aggregate, mirroring
/root/reference/src/alerts/alert_engine.py:16-27 (AlertRule), :112-167
(evaluate + dot-path metric access + cooldown).

DIVERGENCE (documented): the reference's cooldown clock is ``utcnow()``; ours
is an injected monotonically-advancing ``now`` (e.g. the wave number or the
max warc_ts processed) so evaluation is deterministic and replayable.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class AlertRule:
    id: str
    name: str
    metric: str  # dot-path into the metrics dict, e.g. "crawl.error_rate"
    condition: str  # one of > >= < <= == !=
    threshold: float
    severity: str = "warning"
    cooldown_minutes: int = 30
    enabled: bool = True
    channels: list[str] = field(default_factory=lambda: ["dashboard"])
    last_triggered: float | None = None  # minutes on the injected clock


def get_metric_value(metrics: dict, metric_path: str):
    """Dot-path access (alert_engine.py:142-151)."""
    try:
        value = metrics
        for key in metric_path.split("."):
            value = value.get(key, {})
        return float(value) if value != {} else None
    except (KeyError, TypeError, ValueError, AttributeError):
        return None


def evaluate_condition(value: float, condition: str, threshold: float) -> bool:
    """alert_engine.py:153-167."""
    return {
        ">": value > threshold,
        ">=": value >= threshold,
        "<": value < threshold,
        "<=": value <= threshold,
        "==": value == threshold,
        "!=": value != threshold,
    }.get(condition, False)


class AlertEngine:
    """Rule registry + evaluation with deterministic cooldown clock, plus a
    pluggable notification-channel registry (the reference's
    dashboard/email/slack/webhook dispatch, alert_engine.py:202-215): a
    channel is any callable(alert_dict); a triggered rule is dispatched to
    every REGISTERED channel named in its ``channels`` list. Unregistered
    channel names are skipped and counted (the reference logs-and-continues;
    a sink failure likewise never blocks evaluation)."""

    def __init__(self, rules: list[AlertRule] | None = None):
        self.rules: dict[str, AlertRule] = {r.id: r for r in (rules or [])}
        self.history: list[dict] = []
        self.channels: dict[str, object] = {}
        self.dispatch_stats: dict[str, int] = {"sent": 0, "skipped": 0, "failed": 0}

    def add_rule(self, rule: AlertRule) -> None:
        self.rules[rule.id] = rule

    def register_channel(self, name: str, sink) -> None:
        """Register a notification sink: callable(alert: dict) -> None.
        Ships with none — log/parquet/webhook-shaped sinks are supplied by
        the caller (see make_log_channel / make_parquet_channel)."""
        self.channels[name] = sink

    def _dispatch(self, alert: dict) -> None:
        for ch in alert["channels"]:
            sink = self.channels.get(ch)
            if sink is None:
                self.dispatch_stats["skipped"] += 1
                continue
            try:
                sink(alert)
                self.dispatch_stats["sent"] += 1
            except Exception:
                self.dispatch_stats["failed"] += 1

    def evaluate(self, metrics: dict, now_minutes: float = 0.0) -> list[dict]:
        triggered = []
        for rule in self.rules.values():
            if not rule.enabled:
                continue
            if (
                rule.last_triggered is not None
                and now_minutes < rule.last_triggered + rule.cooldown_minutes
            ):
                continue
            value = get_metric_value(metrics, rule.metric)
            if value is None:
                continue
            if evaluate_condition(value, rule.condition, rule.threshold):
                alert = {
                    "rule_id": rule.id,
                    "name": rule.name,
                    "metric": rule.metric,
                    "value": value,
                    "threshold": rule.threshold,
                    "severity": rule.severity,
                    "channels": list(rule.channels),
                    "at_minutes": now_minutes,
                }
                triggered.append(alert)
                self.history.append(alert)
                rule.last_triggered = now_minutes
                self._dispatch(alert)
        return triggered


def make_log_channel(records: list | None = None):
    """Log-shaped sink: appends alerts to a list (and the module logger)."""
    import logging

    log = logging.getLogger("omni_ray.alerts")
    sink_records = records if records is not None else []

    def sink(alert: dict) -> None:
        sink_records.append(alert)
        log.warning("ALERT %s: %s=%s (threshold %s)", alert["severity"],
                    alert["metric"], alert["value"], alert["threshold"])

    sink.records = sink_records
    return sink


def make_parquet_channel(out_dir: str):
    """Parquet-shaped sink: one file per dispatched alert (append-only dir,
    names keyed by rule + clock so retries are idempotent)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def sink(alert: dict) -> None:
        name = f"{alert['rule_id']}-{alert['at_minutes']:.0f}.parquet"
        pq.write_table(
            pa.table({k: [v] for k, v in alert.items() if k != "channels"}),
            os.path.join(out_dir, name),
        )

    return sink


def make_webhook_channel(post):
    """Webhook-shaped sink: ``post(url_payload: dict)`` is caller-supplied
    (no network in-sandbox; in production, e.g. requests.post partial)."""

    def sink(alert: dict) -> None:
        post({"text": f"[{alert['severity']}] {alert['name']}", "alert": alert})

    return sink


def crawl_metrics_from_counters(counters_rows: list[dict]) -> dict:
    """Fold the per-epoch lineage counters into the nested metrics dict the
    alert rules address by dot-path (A8 crawl success rate included)."""
    agg: dict[str, int] = {}
    for row in counters_rows:
        agg[row["counter"]] = agg.get(row["counter"], 0) + int(row["value"])
    scheduled = agg.get("scheduled", 0)
    fetched = agg.get("fetched", 0)
    return {
        "crawl": {
            **agg,
            "success_rate": (fetched / scheduled) if scheduled else 0.0,
            "error_rate": ((scheduled - fetched) / scheduled) if scheduled else 0.0,
        }
    }
