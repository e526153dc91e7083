"""Batch-mode runs of the streaming window operators (oracle-checkable;
the same functions power the streaming path in streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..streaming.ingest import session_window_counts, sliding_counts, tumbling_counts


def tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"), width="1 hour")


TUMBLING_HOURLY_COUNTS_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS total_events,
       COUNT(DISTINCT user_id) AS unique_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
"""


def tumbling_15min_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(
        load_table(spark, sf_dir, "events"), width="15 minutes", extra_keys=("event_type",)
    )


TUMBLING_15MIN_BY_TYPE_SQL = """
SELECT strftime(to_timestamp(epoch_us(ts) // 1000000 // 900 * 900), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS total_events,
       COUNT(DISTINCT user_id) AS unique_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def sliding_1h_15m_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h window hopping every 15min: each event lands in
    exactly 4 overlapping windows. The oracle reproduces the window
    assignment by cross-joining each event with hop offsets 0..3."""
    return sliding_counts(
        load_table(spark, sf_dir, "events"), width="1 hour", slide="15 minutes"
    )


SLIDING_1H_15M_COUNTS_SQL = """
SELECT strftime(to_timestamp(epoch_us(e.ts) // 1000000 // 900 * 900 - k.k * 900),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS total_events,
       COUNT(DISTINCT e.user_id) AS unique_users,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
GROUP BY 1
"""


def session_window_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window sessionization; oracle is the equivalent lag-gap
    formulation (new session when gap >= 30 min, matching Spark's
    half-open session extension)."""
    return session_window_counts(load_table(spark, sf_dir, "events"))


SESSION_WINDOW_USER_STATS_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN LAG(epoch_us(ts), 1) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged GROUP BY user_id
"""


def hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine resampling: the tumbling hourly rollup left-joined
    onto the COMPLETE hour spine between the data's min and max hour,
    zero-filling silent hours — dashboards and downstream window
    functions need the gaps materialized, not skipped. The spine is
    one `sequence()` explode off a 1-row bounds aggregate (rows =
    hours in range, independent of event volume); the join key is the
    hour timestamp, hash-shuffled. Gap hours are the interesting
    output: `had_events` marks them."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    return spine.join(hourly, "h", "left").select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.coalesce("total_events", F.lit(0)).alias("total_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        F.col("total_events").isNotNull().alias("had_events"),
    )


HOURLY_GAPFILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS total_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
)
SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
       COALESCE(hourly.total_events, 0) AS total_events,
       COALESCE(hourly.sum_value, CAST(0.0 AS DOUBLE)) AS sum_value,
       hourly.total_events IS NOT NULL AS had_events
FROM spine s LEFT JOIN hourly ON s.h = hourly.h
"""


QUERIES = {
    "tumbling_hourly_counts": tumbling_hourly_counts,
    "tumbling_15min_by_type": tumbling_15min_by_type,
    "sliding_1h_15m_counts": sliding_1h_15m_counts,
    "session_window_user_stats": session_window_user_stats,
    "hourly_gapfill": hourly_gapfill,
}

ORACLES = {
    "tumbling_hourly_counts": TUMBLING_HOURLY_COUNTS_SQL,
    "tumbling_15min_by_type": TUMBLING_15MIN_BY_TYPE_SQL,
    "sliding_1h_15m_counts": SLIDING_1H_15M_COUNTS_SQL,
    "session_window_user_stats": SESSION_WINDOW_USER_STATS_SQL,
    "hourly_gapfill": HOURLY_GAPFILL_SQL,
}
