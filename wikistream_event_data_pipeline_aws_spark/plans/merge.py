"""MERGE semantics as oracle-verifiable batch queries (SURVEY S7/S8).

``orders`` is split into an overlapping target window and source window
so matched/unmatched branches both fire; the source's "updated" rows
carry a recomputed o_totalprice so an UPDATE is observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.merge import merge_insert_only, merge_upsert

_T_END = "1998-01-01 00:00:00"
_S_START = "1997-01-01 00:00:00"

_PROJ = [
    "o_orderkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate_str",
]


def _target(spark, sf_dir) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") < F.lit(_T_END).cast("timestamp")).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
    )


def _source(spark, sf_dir) -> DataFrame:
    """Overlapping window with 'updated' prices (exact decimal bump)."""
    o = load_table(spark, sf_dir, "orders")
    bumped = (
        F.col("o_totalprice").cast("decimal(12,2)")
        * F.lit("1.10").cast("decimal(3,2)")
    ).cast("double")
    return o.filter(F.col("o_orderdate") >= F.lit(_S_START).cast("timestamp")).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        bumped.alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
    )


_TARGET_SQL = f"""
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str
  FROM orders WHERE o_orderdate < TIMESTAMP '{_T_END}'
"""

_SOURCE_SQL = f"""
  SELECT o_orderkey, 'U' AS o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST('1.10' AS DECIMAL(3,2)) AS DOUBLE) AS o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str
  FROM orders WHERE o_orderdate >= TIMESTAMP '{_S_START}'
"""


def merge_insert_only_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_insert_only(
        _target(spark, sf_dir), _source(spark, sf_dir), ["o_orderkey"]
    )


MERGE_INSERT_ONLY_SQL = f"""
SELECT * FROM ({_TARGET_SQL})
UNION ALL
SELECT * FROM ({_SOURCE_SQL}) s
WHERE NOT EXISTS (SELECT 1 FROM ({_TARGET_SQL}) t WHERE t.o_orderkey = s.o_orderkey)
"""


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_upsert(_target(spark, sf_dir), _source(spark, sf_dir), ["o_orderkey"])


MERGE_UPSERT_SQL = f"""
SELECT * FROM ({_SOURCE_SQL})
UNION ALL
SELECT * FROM ({_TARGET_SQL}) t
WHERE NOT EXISTS (SELECT 1 FROM ({_SOURCE_SQL}) s WHERE s.o_orderkey = t.o_orderkey)
"""


QUERIES = {
    "merge_insert_only_orders": merge_insert_only_orders,
    "merge_upsert_orders": merge_upsert_orders,
}

ORACLES = {
    "merge_insert_only_orders": MERGE_INSERT_ONLY_SQL,
    "merge_upsert_orders": MERGE_UPSERT_SQL,
}
