"""Live-broker Kafka end-to-end (VERDICT r4 item 8) — availability-gated.

Runs ONLY when a reachable broker is configured via
``SPARK_GRAFT_KAFKA_BOOTSTRAP`` (e.g. ``localhost:9092``) AND the
spark-sql-kafka package is on the Spark classpath (launch with
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``).
Neither holds in the default sandbox, so these skip there — the
brokerless wire-contract tests in ``test_streaming.py`` remain the
always-on coverage for S1.

Exercises the reference's bronze path on a real broker
(``bronze_streaming_job.py:381-395`` consume → parse → dedup → merge):
produce JSON envelopes (with planted duplicates) THROUGH Spark's own
Kafka batch writer, subscribe from ``earliest``, parse the envelope,
watermark-dedup, and idempotent-merge into parquet.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="no live Kafka broker configured (set SPARK_GRAFT_KAFKA_BOOTSTRAP)",
)


def _kafka_on_classpath(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "classpath-probe").option(
            "startingOffsets", "earliest"
        ).option("endingOffsets", "earliest").load().schema
        return True
    except Exception as e:  # AnalysisException: Failed to find data source
        if "Failed to find data source" in str(e):
            return False
        raise


def test_kafka_live_subscribe_dedup_merge(spark, tmp_path):
    if not _kafka_on_classpath(spark):
        pytest.skip("spark-sql-kafka package not on the classpath")

    from wikistream_event_data_pipeline_aws_spark.streaming.ingest import (
        kafka_stream,
        parse_kafka_envelope,
        start_merge_sink,
        watermark_dedup,
    )

    topic = f"sg-e2e-{uuid.uuid4().hex[:12]}"

    # -- produce through Spark's own Kafka sink (no extra client libs):
    # 20 events, ids 0..19, ids 0..4 duplicated once = 25 messages
    events = [
        {"id": i, "user": f"u{i % 3}", "ts": f"2026-01-01T00:{i:02d}:00Z"}
        for i in range(20)
    ] + [
        {"id": i, "user": f"u{i % 3}", "ts": f"2026-01-01T00:{i:02d}:00Z"}
        for i in range(5)
    ]
    spark.createDataFrame(
        [(str(e["id"]), json.dumps(e)) for e in events], "key string, value string"
    ).write.format("kafka").option("kafka.bootstrap.servers", BOOTSTRAP).option(
        "topic", topic
    ).save()

    # -- consume: subscribe earliest -> parse -> watermark dedup -> merge
    raw = kafka_stream(
        spark,
        BOOTSTRAP,
        topic,
        starting_offsets="earliest",
        fail_on_data_loss=False,
    )
    parsed = parse_kafka_envelope(raw, "id long, user string, ts timestamp").select(
        "env.id", "env.user", F.col("env.ts").alias("ts"), "offset"
    )
    deduped = watermark_dedup(parsed, ["id"], ts_col="ts", watermark="1 hour")
    target = str(tmp_path / "bronze")
    q = start_merge_sink(
        deduped,
        target,
        keys=["id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    assert not q.isActive

    out = spark.read.parquet(target)
    assert out.count() == 20  # duplicates collapsed
    assert {r.id for r in out.select("id").collect()} == set(range(20))

    # -- replay with a fresh checkpoint: the merge sink must no-op
    q2 = start_merge_sink(
        watermark_dedup(parsed, ["id"], ts_col="ts", watermark="1 hour"),
        target,
        keys=["id"],
        checkpoint_dir=str(tmp_path / "ckpt2"),
        trigger={"availableNow": True},
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(target).count() == 20
