"""Pluggable metric/alert sinks (SURVEY §2.13): the reference publishes
to CloudWatch and SNS from inside every job
(/root/reference ``spark/jobs/dq/dq_utils.py:489-698``,
``bronze_streaming_job.py:277-304``); the engine replaces those
driver-side HTTP effects with a sink protocol — stdout and JSON-lines
file implementations here, a CloudWatch/SNS adapter being one class on
a cluster. Sinks are deliberately fire-and-forget: a metrics outage
must never fail a data job (the reference wraps every publish in
try/except for the same reason).
"""

from __future__ import annotations

import json
import os
import time
from typing import Protocol


class MetricsSink(Protocol):
    def emit(self, name: str, value: float, tags: dict[str, str] | None = None) -> None: ...


class AlertSink(Protocol):
    def alert(self, subject: str, body: str) -> None: ...


class StdoutMetricsSink:
    def emit(self, name: str, value: float, tags: dict[str, str] | None = None) -> None:
        print(f"[metric] {name}={value} {tags or {}}")


class JsonFileMetricsSink:
    """Append-only JSON-lines metrics file (one object per emit)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def emit(self, name: str, value: float, tags: dict[str, str] | None = None) -> None:
        rec = {"ts": time.time(), "name": name, "value": value, "tags": tags or {}}
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec) + "\n")


class StdoutAlertSink:
    def alert(self, subject: str, body: str) -> None:
        print(f"[alert] {subject}: {body}")


class CollectingSink:
    """In-memory sink for tests and reports."""

    def __init__(self) -> None:
        self.metrics: list[tuple[str, float, dict[str, str]]] = []
        self.alerts: list[tuple[str, str]] = []

    def emit(self, name: str, value: float, tags: dict[str, str] | None = None) -> None:
        self.metrics.append((name, value, tags or {}))

    def alert(self, subject: str, body: str) -> None:
        self.alerts.append((subject, body))


def observed_write(
    df,
    sink: MetricsSink,
    metric_prefix: str,
    metrics: dict[str, "object"],
    action=None,
):
    """Single-pass pipeline metrics via Spark's Observation API
    (``df.observe``): attach named aggregate expressions to the plan,
    run ONE action, and emit every observed value to the metrics sink —
    the zero-extra-scan replacement for the reference's pattern of
    re-aggregating a frame just to publish its row count / null count
    to CloudWatch (``dq_utils.py:489-698``). At 100 TB the difference
    is a whole second pass over the table.

    ``metrics`` maps metric name -> aggregate Column; ``action`` runs
    the plan (default: ``count()``). Returns (action_result, observed
    dict). Observation metrics are computed on the rows the action
    actually processed, so they are exact for full-pass actions."""
    from pyspark.sql import Observation

    obs = Observation(metric_prefix)
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    result = observed.count() if action is None else action(observed)
    got = obs.get
    for name, value in got.items():
        # fire-and-forget (module contract): the data action above has
        # already succeeded — neither a non-numeric value NOR a failing
        # sink (full disk, unwritable path) may fail the job
        try:
            sink.emit(f"{metric_prefix}.{name}", float(value))
        except (TypeError, ValueError):  # non-numeric observed value
            try:
                sink.emit(f"{metric_prefix}.{name}", float("nan"), {"raw": str(value)})
            except Exception:
                pass
        except Exception:
            pass
    return result, got
