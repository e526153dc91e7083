"""Pipeline-runner tests (SURVEY §5 plan items 2/3): golden medallion
flow, merge idempotency across cycles, and fail-fast gate blocking on
corrupted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_event_data_pipeline_aws_spark.catalog import load_table
from wikistream_event_data_pipeline_aws_spark.pipeline import Pipeline
from wikistream_event_data_pipeline_aws_spark.plans.wiki import hourly_stats


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")


def test_happy_path_matches_query_surface(spark, sf_dir, warehouse):
    p = Pipeline(spark, warehouse)
    report = p.run(sf_dir=sf_dir)
    assert report.passed, [
        (s.name, s.status, [r.details for r in (s.gate.results if s.gate else [])])
        for s in report.steps
    ]
    # gold hourly table == the registered hourly_stats query over the
    # same events (testdata events are all valid and key-unique, so the
    # medallion flow must be lossless)
    tbl = p.read_table("gold", "hourly_stats")
    q = hourly_stats(spark, sf_dir)
    t = {tuple(r) for r in tbl.select(*sorted(tbl.columns)).collect()}
    e = {tuple(r) for r in q.select(*sorted(q.columns)).collect()}
    assert t == e


def test_cycles_are_idempotent(spark, sf_dir, warehouse):
    p = Pipeline(spark, warehouse)
    reports = p.run_loop(cycles=2, sf_dir=sf_dir)
    assert all(r.passed for r in reports)
    bronze = p.read_table("bronze", "events")
    assert bronze.count() == bronze.select("event_id").distinct().count()
    gold = p.read_table("gold", "daily_summary")
    assert gold.count() == gold.select("event_date").distinct().count()
    # second cycle merged over the first: totals unchanged
    silver_n = p.read_table("silver", "events").count()
    assert silver_n == load_table(spark, sf_dir, "events").count()


def test_corrupt_bronze_blocks_pipeline(spark, sf_dir, warehouse):
    events = load_table(spark, sf_dir, "events")
    # corruption must SURVIVE ingestion: duplicate keys are swallowed by
    # the idempotent merge (D3 working as intended) and null ids/types by
    # the malformed-row filter/defaulting — so plant fresh keys carrying
    # an out-of-vocabulary event type
    bad_types = (
        events.limit(200)
        .withColumn("event_id", F.col("event_id") + 10_000_000)
        .withColumn("event_type", F.lit("mystery"))
    )
    corrupted = events.unionByName(bad_types)
    p = Pipeline(spark, warehouse)
    report = p.run(source=corrupted)
    assert not report.passed
    names = {s.name: s.status for s in report.steps}
    assert names["bronze_dq"] == "BLOCKED"
    assert names["silver"] == "SKIPPED" and names["gold"] == "SKIPPED"
    failed = [r for r in report.step("bronze_dq").gate.results if r.status == "FAILED"]
    assert any("containment" in r.check_name for r in failed)
    # audit trail recorded the blocked run (Q12 contract)
    assert p.audit.latest_gate_blocked(spark, "bronze") is True


def test_gold_respects_upstream_audit_block(spark, sf_dir, warehouse):
    events = load_table(spark, sf_dir, "events")
    p = Pipeline(spark, warehouse)
    # first, poison the audit trail with a blocked bronze run
    corrupted = events.unionByName(
        events.limit(50)
        .withColumn("event_id", F.col("event_id") + 20_000_000)
        .withColumn("event_type", F.lit("mystery"))
    )
    r1 = p.run(source=corrupted)
    assert not r1.passed
    # a fresh gold-only attempt must refuse while the latest gate is blocked
    step = p._gold("manual")
    assert step.status == "BLOCKED" and "upstream" in step.details
