"""Marketing-touch attribution: first-touch / last-touch credit for
purchase events.

The composite analytic the funnel (``plans/extensions.py``) and as-of
(``operators/asof.py``) operators build toward: every purchase is
credited to the user's first and last preceding marketing touch
(view/click). Both attributions resolve in ONE user-partitioned window
pass — the running MIN/MAX of a ``(ts, event_id, type)`` struct over
``UNBOUNDED PRECEDING .. 1 PRECEDING`` — so the plan is a single key
shuffle + sort, no self-join, no per-purchase lookback join. Struct
min/max skips NULLs (non-touch rows) in both engines, and the
``event_id`` tiebreak makes same-timestamp touches deterministic.
At 100 TB this is the same shape as ``user_sessionization``: state per
user is one struct, the window never sees another user's rows, and the
final rollup is a 9-cell hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

TOUCH_TYPES = ("view", "click")


def attribution_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin(*TOUCH_TYPES),
        F.struct(
            F.col("ts").alias("ts"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("etype"),
        ),
    )
    return (
        e.withColumn("last_touch", F.max(touch).over(w))
        .withColumn("first_touch", F.min(touch).over(w))
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("first_touch.etype"), F.lit("none")).alias(
                "first_touch_type"
            ),
            F.coalesce(F.col("last_touch.etype"), F.lit("none")).alias(
                "last_touch_type"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


ATTRIBUTION_FIRST_LAST_TOUCH_SQL = """
WITH touched AS (
  SELECT user_id, event_type, value,
         max(CASE WHEN event_type IN ('view','click')
                  THEN {'ts': ts, 'event_id': event_id, 'etype': event_type} END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
         min(CASE WHEN event_type IN ('view','click')
                  THEN {'ts': ts, 'event_id': event_id, 'etype': event_type} END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
  FROM events
)
SELECT coalesce(first_touch.etype, 'none') AS first_touch_type,
       coalesce(last_touch.etype, 'none') AS last_touch_type,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM touched WHERE event_type = 'purchase'
GROUP BY 1, 2
"""


QUERIES = {"attribution_first_last_touch": attribution_first_last_touch}
ORACLES = {"attribution_first_last_touch": ATTRIBUTION_FIRST_LAST_TOUCH_SQL}
