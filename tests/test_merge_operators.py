"""Merge operator properties (SURVEY §5 item 5: merge idempotency,
deterministic intra-batch dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikistream_event_data_pipeline_aws_spark.operators.merge import (
    dedup_keep_one,
    merge_insert_only,
    merge_upsert,
    upsert_parquet,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, version long")


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_insert_only_is_idempotent(spark):
    target = _df(spark, [(1, "a", 1), (2, "b", 1)])
    source = _df(spark, [(2, "B", 2), (3, "c", 1)])
    once = merge_insert_only(target, source, ["k"])
    twice = merge_insert_only(once, source, ["k"])
    assert _sorted(once) == [(1, "a", 1), (2, "b", 1), (3, "c", 1)]
    assert _sorted(twice) == _sorted(once)


def test_upsert_matched_takes_source(spark):
    target = _df(spark, [(1, "a", 1), (2, "b", 1)])
    source = _df(spark, [(2, "B", 2), (3, "c", 1)])
    merged = merge_upsert(target, source, ["k"])
    assert _sorted(merged) == [(1, "a", 1), (2, "B", 2), (3, "c", 1)]
    again = merge_upsert(merged, source, ["k"])
    assert _sorted(again) == _sorted(merged)


def test_upsert_dedups_intra_batch_keep_latest(spark):
    target = _df(spark, [(1, "a", 1)])
    source = _df(spark, [(1, "x", 2), (1, "y", 3), (2, "c", 1), (2, "old", 0)])
    merged = merge_upsert(target, source, ["k"], order_by=["version"])
    assert _sorted(merged) == [(1, "y", 3), (2, "c", 1)]


def test_dedup_keep_one_first_and_last(spark):
    df = _df(spark, [(1, "x", 2), (1, "y", 3), (2, "c", 1)])
    first = dedup_keep_one(df, ["k"], ["version"], keep="first")
    last = dedup_keep_one(df, ["k"], ["version"], keep="last")
    assert _sorted(first) == [(1, "x", 2), (2, "c", 1)]
    assert _sorted(last) == [(1, "y", 3), (2, "c", 1)]


def test_upsert_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    n1 = upsert_parquet(spark, path, _df(spark, [(1, "a", 1), (2, "b", 1)]), ["k"])
    assert n1 == 2
    n2 = upsert_parquet(spark, path, _df(spark, [(2, "B", 2), (3, "c", 1)]), ["k"])
    assert n2 == 3
    final = spark.read.parquet(path)
    assert _sorted(final) == [(1, "a", 1), (2, "B", 2), (3, "c", 1)]
    # replay the same batch -> unchanged (exactly-once equivalence)
    n3 = upsert_parquet(spark, path, _df(spark, [(2, "B", 2), (3, "c", 1)]), ["k"])
    assert n3 == 3
    assert _sorted(spark.read.parquet(path)) == [(1, "a", 1), (2, "B", 2), (3, "c", 1)]
