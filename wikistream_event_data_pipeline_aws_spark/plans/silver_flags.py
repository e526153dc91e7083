"""Silver-layer flag derivation and audit-rollup queries.

Reference parity (citations into /root/reference):
- P11 anonymous detection  ``spark/jobs/silver_batch_job.py:109-112``
  (user string matching an IPv4 regex -> is_anonymous)
- P12 validity conjunction ``silver_batch_job.py:119-124``
- P13 threshold flags      ``silver_batch_job.py:126-132``
  (is_large_deletion delta < -5000, is_large_addition delta > 50000)
- W1 partitioned analytic count + per-day max (peak-hour volume)
  ``gold_batch_job.py:297,311``
- A8/O2 gate-status rollup + latest-run pick ``dq/dq_utils.py:214-231``

The events table has no user string, so the flags query synthesizes one
deterministically from user_id (every 5th user becomes a dotted-quad
"IP") with pure integer arithmetic both engines reproduce exactly; the
regex/flag logic on top is the reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

DELETION_THRESHOLD = -200.0
ADDITION_THRESHOLD = 400.0

_IP_REGEX = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def _user_str() -> F.Column:
    u = F.col("user_id")
    ip = F.concat_ws(
        ".",
        (u % 256).cast("string"),
        ((u / F.lit(7)).cast("long") % 256).cast("string"),
        ((u / F.lit(11)).cast("long") % 256).cast("string"),
        ((u / F.lit(13)).cast("long") % 256).cast("string"),
    )
    return F.when(u % 5 == 0, ip).otherwise(F.concat(F.lit("User_"), u.cast("string")))


def quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11+P12+P13 over events: anonymous-IP regex, threshold flags on a
    signed delta, and the is_valid null-conjunction."""
    e = load_table(spark, sf_dir, "events")
    # signed delta: value recentered so both flag branches fire
    delta = F.col("value") - F.lit(300.0)
    user_str = _user_str()
    return e.select(
        "event_id",
        user_str.alias("user_str"),
        user_str.rlike(_IP_REGEX).alias("is_anonymous"),
        (delta < F.lit(DELETION_THRESHOLD)).alias("is_large_deletion"),
        (delta > F.lit(ADDITION_THRESHOLD)).alias("is_large_addition"),
        (
            F.col("event_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        ).alias("is_valid"),
    )


QUALITY_FLAGS_SQL = rf"""
WITH named AS (
  SELECT event_id, event_type, ts, user_id, value,
         CASE WHEN user_id % 5 = 0
              THEN concat_ws('.', CAST(user_id % 256 AS VARCHAR),
                                  CAST((user_id // 7) % 256 AS VARCHAR),
                                  CAST((user_id // 11) % 256 AS VARCHAR),
                                  CAST((user_id // 13) % 256 AS VARCHAR))
              ELSE 'User_' || CAST(user_id AS VARCHAR) END AS user_str
  FROM events
)
SELECT event_id,
       user_str,
       regexp_matches(user_str, '^\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}$') AS is_anonymous,
       (value - 300.0) < {DELETION_THRESHOLD} AS is_large_deletion,
       (value - 300.0) > {ADDITION_THRESHOLD} AS is_large_addition,
       (event_id IS NOT NULL AND event_type IS NOT NULL
        AND ts IS NOT NULL AND user_id IS NOT NULL) AS is_valid
FROM named
"""


def peak_hour_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: COUNT(*) OVER (PARTITION BY date, hour) analytic, then the
    per-day max = peak-hour volume."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.hour("ts").alias("event_hour"),
    )
    w = Window.partitionBy("event_date", "event_hour")
    return (
        e.withColumn("hour_events", F.count(F.lit(1)).over(w))
        .groupBy("event_date")
        .agg(F.max("hour_events").alias("peak_hour_events"))
    )


PEAK_HOUR_ANALYTIC_SQL = """
WITH hourly AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
         COUNT(*) OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), hour(ts)) AS hour_events
  FROM events
)
SELECT event_date, MAX(hour_events) AS peak_hour_events
FROM hourly GROUP BY event_date
"""


def gate_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+O2: per-run (here per-day) failure rollup via MAX(CASE WHEN),
    then ORDER BY run DESC LIMIT 1 picks the latest run's status."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("run_date"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "error", F.lit(1)).otherwise(F.lit(0))
            ).alias("has_failure"),
            F.count(F.lit(1)).alias("n_checks"),
        )
        .orderBy(F.col("run_date").desc())
        .limit(1)
    )


GATE_STATUS_ROLLUP_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS run_date,
       MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_failure,
       COUNT(*) AS n_checks
FROM events
GROUP BY 1
ORDER BY run_date DESC
LIMIT 1
"""


QUERIES = {
    "quality_flags": quality_flags,
    "peak_hour_analytic": peak_hour_analytic,
    "gate_status_rollup": gate_status_rollup,
}

ORACLES = {
    "quality_flags": QUALITY_FLAGS_SQL,
    "peak_hour_analytic": PEAK_HOUR_ANALYTIC_SQL,
    "gate_status_rollup": GATE_STATUS_ROLLUP_SQL,
}
