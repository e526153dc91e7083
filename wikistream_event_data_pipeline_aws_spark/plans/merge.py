"""MERGE semantics as oracle-verifiable batch queries (SURVEY S7/S8).

``orders`` is split into an overlapping target window and source window
so matched/unmatched branches both fire; the source's "updated" rows
carry a recomputed o_totalprice so an UPDATE is observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.merge import merge_insert_only, merge_upsert, scd2_apply

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


_SCD_START = "2024-01-01"
_SCD_EFF = "2024-06-01"
_SCD_HIGH = "9999-12-31"


def scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 versioned customer dimension (operators/merge.py
    ``scd2_apply``): a deterministic CDC batch (every 7th customer gets
    an exact +100.00 balance bump) closes the current version at the
    effective date and opens a new one; untouched customers stay
    current."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit(_SCD_START).alias("valid_from"),
        F.lit(_SCD_HIGH).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        "c_mktsegment",
    )
    return scd2_apply(
        dim, upd, ["c_custkey"], ["c_acctbal", "c_mktsegment"], _SCD_EFF, _SCD_HIGH
    )


SCD2_CUSTOMER_DIM_SQL = f"""
WITH dim AS (
  SELECT c_custkey, c_acctbal, c_mktsegment,
         '{_SCD_START}' AS valid_from, '{_SCD_HIGH}' AS valid_to, TRUE AS is_current
  FROM customer
),
upd AS (
  SELECT c_custkey, c_acctbal + CAST(100.0 AS DOUBLE) AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
),
changed AS (
  SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment
  FROM upd u JOIN dim d ON u.c_custkey = d.c_custkey AND d.is_current
  WHERE u.c_acctbal IS DISTINCT FROM d.c_acctbal
     OR u.c_mktsegment IS DISTINCT FROM d.c_mktsegment
)
SELECT d.c_custkey, d.c_acctbal, d.c_mktsegment, d.valid_from, d.valid_to, d.is_current
FROM dim d LEFT JOIN changed c ON d.c_custkey = c.c_custkey
WHERE NOT (d.is_current AND c.c_custkey IS NOT NULL)
UNION ALL
SELECT d.c_custkey, d.c_acctbal, d.c_mktsegment, d.valid_from,
       '{_SCD_EFF}' AS valid_to, FALSE AS is_current
FROM dim d JOIN changed c ON d.c_custkey = c.c_custkey
WHERE d.is_current
UNION ALL
SELECT c_custkey, c_acctbal, c_mktsegment,
       '{_SCD_EFF}' AS valid_from, '{_SCD_HIGH}' AS valid_to, TRUE AS is_current
FROM changed
"""


QUERIES = {
    "merge_insert_only_orders": merge_insert_only_orders,
    "merge_upsert_orders": merge_upsert_orders,
    "scd2_customer_dim": scd2_customer_dim,
}

ORACLES = {
    "merge_insert_only_orders": MERGE_INSERT_ONLY_SQL,
    "merge_upsert_orders": MERGE_UPSERT_SQL,
    "scd2_customer_dim": SCD2_CUSTOMER_DIM_SQL,
}
