"""Registered snapshot/time-travel query over a REAL versioned table.

Builds a 4-version snapshot table from the orders slice (append →
append → overwrite → rollback) with ``operators/snapshots.py``, then
reads EVERY version back by time travel and fingerprints each with a
row count, distinct-key count and keyspace checksum. The DuckDB oracle
never sees the versioned storage: it recomputes what each snapshot
*must* contain from the source orders table — so a broken manifest,
a non-isolated overwrite, or a rollback that rewrote rather than
re-pointed all surface as value-hash mismatches.

Version script (deterministic, rebuilt once per scale factor behind a
manifest marker):
  v1 append    orders with o_orderkey % 10 < 5
  v2 append    orders with o_orderkey % 10 IN (5, 6)   (disjoint)
  v3 overwrite orders with o_orderstatus = 'F'
  v4 rollback→v2  (metadata-only: must equal v2 exactly)
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import snapshots as snap

_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.pardir,
    "spark-warehouse",
)

N_VERSIONS = 4


def _snap_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.abspath(os.path.join(_WAREHOUSE, f"orders_snap_{tag}"))


def build_snapshot_table(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the 4-version history once per scale factor (the
    v4 manifest is the completion marker, same discipline as
    ``plans/partitioned.write_evolution_tables``)."""
    path = _snap_path(sf_dir)
    if snap.current_version(path) == N_VERSIONS:
        return path
    orders = load_table(spark, sf_dir, "orders")
    snap.snapshot_write(
        spark, path, orders.filter(F.col("o_orderkey") % 10 < 5), mode="append"
    )
    snap.snapshot_write(
        spark,
        path,
        orders.filter((F.col("o_orderkey") % 10).isin(5, 6)),
        mode="append",
    )
    snap.snapshot_write(
        spark, path, orders.filter(F.col("o_orderstatus") == "F"), mode="overwrite"
    )
    snap.rollback(path, 2)
    return path


def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fingerprint row per snapshot version, read by time travel."""
    path = build_snapshot_table(spark, sf_dir)
    key_sig = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    per_version = [
        snap.read_snapshot(spark, path, v).select(
            F.lit(v).alias("version"),
            F.col("o_orderkey"),
            key_sig.alias("ks"),
        )
        for v in range(1, N_VERSIONS + 1)
    ]
    return (
        reduce(DataFrame.unionByName, per_version)
        .groupBy("version")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_orderkey").alias("n_keys"),
            F.sum("ks").alias("keyspace_checksum"),
        )
    )


_KS_SQL = "CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)"

SNAPSHOT_TIME_TRAVEL_SQL = f"""
WITH v1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 5),
v2 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 7),
v3 AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
labeled AS (
  SELECT 1 AS version, o_orderkey FROM v1
  UNION ALL SELECT 2, o_orderkey FROM v2
  UNION ALL SELECT 3, o_orderkey FROM v3
  UNION ALL SELECT 4, o_orderkey FROM v2
)
SELECT version,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT o_orderkey) AS n_keys,
       SUM({_KS_SQL}) AS keyspace_checksum
FROM labeled GROUP BY version
"""


QUERIES = {"snapshot_time_travel": snapshot_time_travel}
ORACLES = {"snapshot_time_travel": SNAPSHOT_TIME_TRAVEL_SQL}
