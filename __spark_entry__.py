"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hourly-stats aggregation (the
reference's gold hourly rollup, /root/reference
``spark/jobs/gold_batch_job.py:68-121``) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-data-pipeline extensions, backed by
``wikistream_event_data_pipeline_aws_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wikistream_event_data_pipeline_aws_spark import registry

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["hourly_stats"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.oracles()
