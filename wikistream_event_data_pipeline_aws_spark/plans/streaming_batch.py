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


QUERIES = {
    "tumbling_hourly_counts": tumbling_hourly_counts,
    "tumbling_15min_by_type": tumbling_15min_by_type,
    "sliding_1h_15m_counts": sliding_1h_15m_counts,
    "session_window_user_stats": session_window_user_stats,
}

ORACLES = {
    "tumbling_hourly_counts": TUMBLING_HOURLY_COUNTS_SQL,
    "tumbling_15min_by_type": TUMBLING_15MIN_BY_TYPE_SQL,
    "sliding_1h_15m_counts": SLIDING_1H_15M_COUNTS_SQL,
    "session_window_user_stats": SESSION_WINDOW_USER_STATS_SQL,
}
