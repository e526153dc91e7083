"""Set-operation surface (SURVEY §2.7 — the reference uses none
directly, but union is the primitive its MERGE fallback and DLQ
consolidation decompose into; intersect/except complete the surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def _building_keys(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


def _ordering_keys(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )


_BUILDING_SQL = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_ORDERING_SQL = "SELECT DISTINCT o_custkey AS c_custkey FROM orders"


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building_keys(spark, sf_dir).union(_ordering_keys(spark, sf_dir)).distinct()


SET_UNION_DISTINCT_SQL = f"({_BUILDING_SQL}) UNION ({_ORDERING_SQL})"


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building_keys(spark, sf_dir).intersect(_ordering_keys(spark, sf_dir))


SET_INTERSECT_SQL = f"({_BUILDING_SQL}) INTERSECT ({_ORDERING_SQL})"


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract() IS SQL EXCEPT (set semantics): exceptAll().distinct()
    # removed only per-occurrence — a left side with duplicate rows kept
    # a row the oracle's EXCEPT eliminates (invisible while the source
    # key is unique, red the moment it is not)
    return _building_keys(spark, sf_dir).subtract(_ordering_keys(spark, sf_dir))


SET_EXCEPT_SQL = f"({_BUILDING_SQL}) EXCEPT ({_ORDERING_SQL})"


def union_all_event_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionAll (bag semantics) of two overlapping slices, then re-agg —
    the DLQ-consolidation shape (reference S4 side outputs)."""
    e = load_table(spark, sf_dir, "events")
    high = e.filter(F.col("value") > 100).select("event_type", "value")
    errors = e.filter(F.col("event_type") == "error").select("event_type", "value")
    return (
        high.unionAll(errors)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


UNION_ALL_EVENT_SLICES_SQL = """
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT event_type, value FROM events WHERE value > 100
  UNION ALL
  SELECT event_type, value FROM events WHERE event_type = 'error'
)
GROUP BY event_type
"""


QUERIES = {
    "set_union_distinct": set_union_distinct,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_union_all_slices": union_all_event_slices,
}

ORACLES = {
    "set_union_distinct": SET_UNION_DISTINCT_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "set_union_all_slices": UNION_ALL_EVENT_SLICES_SQL,
}
