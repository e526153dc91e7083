"""Testdata catalog: load the driver-generated parquet tables.

The reference addresses layered Iceberg tables by ``namespace.table``
and always scans with partition predicates (reference
``silver_batch_job.py:263-266``). Here the source tables are the
driver's synthetic parquet files; loading is lazy (a scan node in the
logical plan), so Catalyst still gets full predicate pushdown and
column pruning on top of them.

``events.parquet`` stores TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as a long
of epoch-nanos and is converted here with integer arithmetic
(``ts div 1000`` — no float rounding) to a microsecond timestamp,
matching what a DuckDB/pyarrow reader sees after ns->us truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_session_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # epoch-nanos long -> microsecond timestamp, integer math only
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] with isAdjustedToUTC=false arrives as
            # TIMESTAMP_NTZ under inferTimestampNTZ; functions like
            # unix_micros accept only LTZ. The session timezone is pinned
            # UTC, so the cast reinterprets the same wall-clock instant —
            # value-identical to what DuckDB reads from the same file.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, prefix: str = "") -> dict[str, DataFrame]:
    """Register every table as a temp view (reference S12 pattern,
    ``bronze_streaming_job.py:260``) so plans can be written in SQL."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(f"{prefix}{name}")
    return dfs
