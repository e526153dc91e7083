"""DDL helpers (S5/S11), metric/alert sinks (§2.13) wired through the
pipeline, and the S10 dedup-repair job."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from wikistream_event_data_pipeline_aws_spark.catalog import load_table
from wikistream_event_data_pipeline_aws_spark.ddl import (
    create_table,
    ensure_column,
    register_view,
)
from wikistream_event_data_pipeline_aws_spark.observability import (
    CollectingSink,
    JsonFileMetricsSink,
)
from wikistream_event_data_pipeline_aws_spark.operators.merge import repair_dedup
from wikistream_event_data_pipeline_aws_spark.pipeline import Pipeline


def test_create_table_alter_and_view(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    create_table(
        spark,
        "eng_test.events_ddl",
        "event_id bigint, event_date string, n bigint",
        partition_by=["event_date"],
        location=loc,
        props={"write.format.default": "parquet"},
    )
    # partition columns are reordered last in the physical schema, so
    # name the columns explicitly
    spark.sql(
        "INSERT INTO eng_test.events_ddl (event_id, event_date, n) "
        "VALUES (1, '2024-01-01', 5), (2, '2024-01-02', 7)"
    )
    # idempotent re-create
    create_table(
        spark,
        "eng_test.events_ddl",
        "event_id bigint, event_date string, n bigint",
        partition_by=["event_date"],
        location=loc,
    )
    assert ensure_column(spark, "eng_test.events_ddl", "schema_version", "string") is True
    assert ensure_column(spark, "eng_test.events_ddl", "schema_version", "string") is False
    register_view(spark.table("eng_test.events_ddl"), "events_ddl_v")
    got = spark.sql("SELECT SUM(n) AS s FROM events_ddl_v").collect()[0].s
    assert got == 12
    spark.sql("DROP TABLE eng_test.events_ddl")


def test_pipeline_emits_metrics_and_alerts(spark, sf_dir, tmp_path):
    sink = CollectingSink()
    p = Pipeline(spark, str(tmp_path / "wh"), metrics_sink=sink, alert_sink=sink)
    report = p.run(sf_dir=sf_dir)
    assert report.passed
    names = {m[0] for m in sink.metrics}
    assert "pipeline.bronze.seconds" in names and "pipeline.gold.rows" in names
    assert sink.alerts == []
    # corrupted run must raise an alert naming the failed check
    events = load_table(spark, sf_dir, "events")
    bad = events.unionByName(
        events.limit(20)
        .withColumn("event_id", F.col("event_id") + 30_000_000)
        .withColumn("event_type", F.lit("mystery"))
    )
    p2 = Pipeline(spark, str(tmp_path / "wh2"), metrics_sink=sink, alert_sink=sink)
    r2 = p2.run(source=bad)
    assert not r2.passed
    assert any("BLOCKED" in a[0] and "containment" in a[1] for a in sink.alerts)


def test_jsonfile_metrics_sink(tmp_path):
    path = str(tmp_path / "m" / "metrics.jsonl")
    sink = JsonFileMetricsSink(path)
    sink.emit("x", 1.5, {"a": "b"})
    sink.emit("y", 2.0)
    recs = [json.loads(l) for l in open(path, encoding="utf-8")]
    assert [r["name"] for r in recs] == ["x", "y"]
    assert recs[0]["tags"] == {"a": "b"}


def test_repair_dedup_keeps_earliest(spark, tmp_path):
    path = str(tmp_path / "dups")
    rows = [(1, "2024-01-01", "keep"), (1, "2024-01-02", "drop"),
            (2, "2024-01-03", "solo"), (3, "2024-01-05", "drop"),
            (3, "2024-01-04", "keep")]
    spark.createDataFrame(rows, "k long, processed_at string, tag string").write.parquet(path)
    before, after = repair_dedup(spark, path, keys=["k"], order_by=["processed_at"])
    assert (before, after) == (5, 3)
    got = {(r.k, r.tag) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "keep"), (2, "solo"), (3, "keep")}
    # idempotent: second repair is a no-op
    assert repair_dedup(spark, path, keys=["k"], order_by=["processed_at"]) == (3, 3)


def test_observed_write_single_pass_metrics(spark):
    """The Observation API must report exactly what a second aggregation
    pass would, while running only the one action."""
    from pyspark.sql import functions as F

    from wikistream_event_data_pipeline_aws_spark.observability import (
        CollectingSink,
        observed_write,
    )

    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    sink = CollectingSink()
    n, got = observed_write(
        df,
        sink,
        "bronze",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.sum(F.col("v").isNull().cast("long")),
            "sum_v": F.sum("v"),
        },
    )
    assert n == 100
    assert got["n_rows"] == 100
    assert got["n_null_v"] == 10
    assert got["sum_v"] == sum(i for i in range(100) if i % 10 != 0)
    emitted = {name: v for name, v, _ in sink.metrics}
    assert emitted["bronze.n_rows"] == 100.0
    assert emitted["bronze.n_null_v"] == 10.0
