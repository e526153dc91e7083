"""SparkSession factory.

Mirrors the session discipline of the reference jobs (AQE + partition
coalescing + skew-join handling enabled on every session — reference
``spark/jobs/bronze_streaming_job.py:109-128``,
``silver_batch_job.py:60-76``) but tuned for local[N] testing while
staying cluster-correct: nothing here depends on single-JVM execution,
and shuffle partitioning is configurable so a 1000-executor deployment
can raise it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The driver-generated events.parquet stores TIMESTAMP(NANOS), which the
# vectorized parquet reader rejects unless read as raw nanos longs.
# catalog.load_tables() converts back to a proper timestamp column.
NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "wikistream-spark-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession with engine defaults.

    At cluster scale the same confs apply; only ``master`` and memory
    sizing are deployment concerns.
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(NANOS_CONF, "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # partition dirs like event_date=2024-01-19 stay strings on read
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # r13 optimization (guide §2.4): let joins reuse an existing
        # partitioning on a SUBSET of the join keys instead of forcing a
        # re-exchange on all keys. The engine's iterative plans (unigram
        # min-plus squaring, BPE rounds) deliberately cluster by a
        # high-cardinality key (word) and join on superset keys — the
        # skew hazard this conf guards against (few distinct subset
        # values) does not apply, and the determinism sweep verifies
        # results are partitioning-invariant.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Set runtime-settable confs the engine relies on.

    Called from every query entry point so that an externally provided
    session (e.g. the verification driver's) behaves identically to one
    built by :func:`get_spark`. All of these are runtime SQL confs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(NANOS_CONF, "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    # subset-key co-partition reuse (see get_spark) — runtime-settable
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    # Match get_spark's broadcast band: a driver-provided session with the
    # stock 10MB threshold would silently demote the dimension joins the
    # local plan tests validate as broadcast into sort-merge joins —
    # exactly the plan drift this function exists to prevent. Only the
    # stock default is overridden; an explicitly tuned session is
    # respected (same policy as shuffle.partitions below).
    if spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b").rstrip(
        "b"
    ) == "10485760":
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # Right-size task count for this host if the session still carries
    # Spark's stock default; an explicitly tuned session is left alone.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    return spark
