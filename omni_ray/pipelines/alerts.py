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
    """Rule registry + evaluation with deterministic cooldown clock."""

    def __init__(self, rules: list[AlertRule] | None = None):
        self.rules: dict[str, AlertRule] = {r.id: r for r in (rules or [])}
        self.history: list[dict] = []

    def add_rule(self, rule: AlertRule) -> None:
        self.rules[rule.id] = rule

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
        return triggered


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
