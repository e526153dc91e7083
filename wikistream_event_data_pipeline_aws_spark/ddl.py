"""DDL surface (SURVEY S5/S11/S12): CREATE TABLE IF NOT EXISTS with
partitioning + table properties, defensive ALTER TABLE ADD COLUMN
schema evolution, temp-view registration.

Reference shape: per-layer Iceberg DDL templates
(/root/reference ``spark/schemas/bronze_schema.py:206-273``) executed
with ``spark.sql(CREATE TABLE IF NOT EXISTS ...)`` and the
swallow-failure ALTER at ``silver_batch_job.py:284-292``. Locally the
backing format is parquet; on a cluster the USING clause switches to
iceberg/delta and TBLPROPERTIES carry the zstd/256MB/MoR knobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def schema_to_ddl(schema: T.StructType) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


def create_table(
    spark: SparkSession,
    name: str,
    schema: T.StructType | str,
    partition_by: list[str] | None = None,
    location: str | None = None,
    fmt: str = "parquet",
    props: dict[str, str] | None = None,
) -> None:
    """CREATE TABLE IF NOT EXISTS (S5). ``name`` may be namespaced
    (``bronze.events``); namespaces are created on demand."""
    if "." in name:
        ns = name.rsplit(".", 1)[0]
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {ns}")
    cols = schema_to_ddl(schema) if isinstance(schema, T.StructType) else schema
    ddl = [f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING {fmt}"]
    if partition_by:
        ddl.append(f"PARTITIONED BY ({', '.join(partition_by)})")
    if location:
        ddl.append(f"LOCATION '{location}'")
    if props:
        kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
        ddl.append(f"TBLPROPERTIES ({kv})")
    spark.sql(" ".join(ddl))


def ensure_column(spark: SparkSession, table: str, column: str, dtype: str) -> bool:
    """S11: add a column if missing; swallow 'already exists' like the
    reference's try/except ALTER. Returns True when the ALTER ran.
    The pre-check is case-INsensitive to match Spark's default column
    resolution (a case-variant of an existing name would otherwise slip
    past the set check and crash the ALTER with COLUMNS_ALREADY_EXIST —
    the opposite of the documented swallow)."""
    existing = {f.name.lower() for f in spark.table(table).schema.fields}
    if column.lower() in existing:
        return False
    spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({column} {dtype})")
    return True


def register_view(df: DataFrame, name: str) -> None:
    """S12: temp-view registration feeding SQL plans."""
    df.createOrReplaceTempView(name)
