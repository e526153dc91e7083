"""Column profiling + drift detection (SURVEY Q13/Q14).

Reference: ``ColumnProfile`` dataclass + per-column stats at
/root/reference ``spark/jobs/dq/dq_utils.py:241-257,305-394`` (null
rate, distinct, moments, percentiles) and drift vs a stored 7-day
baseline (``dq_utils.py:439-482``, ``silver_dq_gate.py:195-223``).

Scale design: ALL numeric + null metrics for ALL profiled columns are
computed in a single ``agg()`` pass (the reference runs several jobs
per column); distincts use ``approx_count_distinct`` (HLL — mergeable,
no exact-distinct shuffle) and percentiles use ``percentile_approx``
(KLL-style sketch) — both single-pass and 100 TB-safe.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ColumnProfile:
    column: str
    total_count: int
    null_count: int
    null_rate: float
    approx_distinct: int
    mean: float | None = None
    stddev: float | None = None
    min: float | None = None
    max: float | None = None
    p25: float | None = None
    p50: float | None = None
    p75: float | None = None
    p95: float | None = None


_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> list[ColumnProfile]:
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    exprs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        exprs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        exprs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        if _is_numeric(dtypes.get(c, "")):
            exprs.extend(
                [
                    F.avg(c).alias(f"{c}__mean"),
                    F.stddev(c).alias(f"{c}__stddev"),
                    F.min(c).cast("double").alias(f"{c}__min"),
                    F.max(c).cast("double").alias(f"{c}__max"),
                    F.percentile_approx(c, [0.25, 0.5, 0.75, 0.95], 10_000).alias(
                        f"{c}__pcts"
                    ),
                ]
            )
    row = df.agg(*exprs).collect()[0]
    total = row["__total"]
    out = []
    for c in cols:
        nulls = row[f"{c}__nulls"] or 0
        prof = ColumnProfile(
            column=c,
            total_count=total,
            null_count=nulls,
            null_rate=(nulls / total) if total else 0.0,
            approx_distinct=row[f"{c}__distinct"],
        )
        if _is_numeric(dtypes.get(c, "")):
            pcts = row[f"{c}__pcts"] or [None] * 4
            prof.mean = row[f"{c}__mean"]
            prof.stddev = row[f"{c}__stddev"]
            prof.min = row[f"{c}__min"]
            prof.max = row[f"{c}__max"]
            prof.p25, prof.p50, prof.p75, prof.p95 = [
                float(p) if p is not None else None for p in pcts
            ]
        out.append(prof)
    return out


@dataclass
class DriftResult:
    column: str
    metric: str
    baseline: float | None
    current: float | None
    abs_change: float | None
    status: str  # OK / WARNING / ALERT


def detect_drift(
    baseline: list[ColumnProfile],
    current: list[ColumnProfile],
    warn_threshold: float = 0.10,
    alert_threshold: float = 0.20,
) -> list[DriftResult]:
    """Null-rate drift vs baseline (reference thresholds 0.10/0.20 abs
    change, ``silver_dq_gate.py:195-223``)."""
    base = {p.column: p for p in baseline}
    out = []
    for cur in current:
        b = base.get(cur.column)
        if b is None:
            continue
        change = abs(cur.null_rate - b.null_rate)
        status = "OK"
        if change > alert_threshold:
            status = "ALERT"
        elif change > warn_threshold:
            status = "WARNING"
        out.append(
            DriftResult(cur.column, "null_rate", b.null_rate, cur.null_rate, change, status)
        )
    return out
