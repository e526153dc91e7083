"""Remaining relational-surface operators: UNPIVOT (wide→long) and
null-safe equi-joins.

- ``metric_unpivot``: the inverse of ``pivot_type_counts_by_date``
  (plans/json_ops.py) — a wide per-day metric row unpivoted to tidy
  (date, metric, value) triples via ``stack``. Zero shuffle beyond the
  producing aggregation: stack is a generator projection, each input
  row expands to exactly |metrics| rows on the same partition.
- ``join_null_safe_buckets``: reconciling two aggregates whose group
  key is legitimately NULL (here: an out-of-range sentinel bucket) —
  a plain equi-join silently DROPS the NULL group on both sides;
  ``eqNullSafe`` / ``IS NOT DISTINCT FROM`` matches them. Spark still
  executes it as a hash join (null-safe equality is a valid equi-key),
  so the plan shuffles on the key like any other join — no nested-loop
  penalty for correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .wiki import events_with_time

SPLIT_TS = "2024-01-16 00:00:00"


def metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = events_with_time(spark, sf_dir)
    wide = e.groupBy("event_date").agg(
        F.sum((F.col("event_type") == "view").cast("int")).alias("n_views"),
        F.sum((F.col("event_type") == "click").cast("int")).alias("n_clicks"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("n_purchases"),
    )
    return wide.select(
        "event_date",
        F.expr(
            "stack(3, 'n_views', n_views, 'n_clicks', n_clicks,"
            " 'n_purchases', n_purchases) AS (metric, metric_count)"
        ),
    )


METRIC_UNPIVOT_SQL = """
WITH wide AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
  FROM events GROUP BY 1
)
SELECT event_date, metric, metric_count FROM wide
UNPIVOT (metric_count FOR metric IN (n_views, n_clicks, n_purchases))
"""


def _bucketed() -> F.Column:
    """Unbound bucket expression over the in-scope ``value`` column
    (NULL = out-of-range sentinel bucket)."""
    return F.when(F.col("value") >= 50, F.lit(None).cast("bigint")).otherwise(
        F.floor(F.col("value") / 10).cast("bigint")
    )


def join_null_safe_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    split = F.lit(SPLIT_TS).cast("timestamp")
    first = (
        e.filter(F.col("ts") < split)
        .groupBy(_bucketed().alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    second = (
        e.filter(F.col("ts") >= split)
        .groupBy(_bucketed().alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_second"))
    )
    return (
        first.join(second, first["bucket"].eqNullSafe(second["bucket"]))
        .select(first["bucket"].alias("bucket"), "n_first", "n_second")
    )


JOIN_NULL_SAFE_BUCKETS_SQL = f"""
WITH first_half AS (
  SELECT CASE WHEN value >= 50 THEN NULL
              ELSE CAST(floor(value / 10) AS BIGINT) END AS bucket,
         COUNT(*) AS n_first
  FROM events WHERE ts < TIMESTAMP '{SPLIT_TS}' GROUP BY 1
),
second_half AS (
  SELECT CASE WHEN value >= 50 THEN NULL
              ELSE CAST(floor(value / 10) AS BIGINT) END AS bucket,
         COUNT(*) AS n_second
  FROM events WHERE ts >= TIMESTAMP '{SPLIT_TS}' GROUP BY 1
)
SELECT f.bucket, f.n_first, s.n_second
FROM first_half f JOIN second_half s ON f.bucket IS NOT DISTINCT FROM s.bucket
"""


QUERIES = {
    "metric_unpivot": metric_unpivot,
    "join_null_safe_buckets": join_null_safe_buckets,
}

ORACLES = {
    "metric_unpivot": METRIC_UNPIVOT_SQL,
    "join_null_safe_buckets": JOIN_NULL_SAFE_BUCKETS_SQL,
}
