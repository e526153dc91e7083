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
