"""JSON + scalar-function surface (SURVEY §2.2 P1-P16, §2.9).

- ``json_extract_props``  <- JSON path extraction + cast (P2,
  ``bronze_streaming_job.py:164-188``) on the ``events.props`` column.
- ``json_assemble_evidence`` <- evidence JSON assembly; the reference
  CONCATs strings (``gold_batch_job.py:229-235``), the engine uses
  ``to_json(struct(...))`` (SURVEY §2.9 directive).
- ``surrogate_key_md5``   <- deterministic surrogate key (P4,
  ``bronze_streaming_job.py:191-201``): md5(concat_ws(...)).
- ``null_defaulting``     <- coalesce defaults (P3) + nullif.
- ``conditional_mapping`` <- chained when/otherwise + substring fallback
  (P9 domain->region mapping, ``silver_batch_job.py:82-100``).
- ``string_cleaning``     <- trim/regexp_replace/rlike normalization
  (P10/P11, ``silver_batch_job.py:107-112``) over documents.
- ``timestamp_normalize`` <- timestamp parse/format/epoch round-trip
  (P6/P7, ``bronze_streaming_job.py:209-221``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .withColumn("k_bucket", F.col("k") % 10)
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("k").alias("distinct_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


JSON_EXTRACT_PROPS_SQL = """
WITH parsed AS (
  SELECT *, CAST(props->>'$.k' AS INTEGER) AS k FROM events
)
SELECT k % 10 AS k_bucket,
       COUNT(*) AS n_events,
       COUNT(DISTINCT k) AS distinct_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM parsed GROUP BY k % 10
"""


def envelope_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: the Kafka wire-format round trip. The producer wraps each
    event as ``{id, data: <JSON string>, _processing: {...}}`` — note
    ``data`` is a STRINGIFIED payload (reference
    ``producer/kafka_producer.py:204-213``); the bronze job parses the
    envelope with ``from_json`` and digs into ``data`` with
    ``get_json_object`` (``bronze_streaming_job.py:143-188``). This
    query manufactures the envelope from events, then parses it back —
    both directions of the wire format in one plan."""
    e = load_table(spark, sf_dir, "events")
    envelope = e.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.to_json(
                    F.struct("event_type", "value", "user_id")
                ).alias("data"),
                F.struct(
                    F.lit("wiki-sse").alias("source"),
                ).alias("_processing"),
            )
        ).alias("raw")
    )
    env_schema = "id bigint, data string, _processing struct<source:string>"
    parsed = envelope.select(F.from_json("raw", env_schema).alias("env"))
    return parsed.select(
        F.col("env.id").alias("event_id"),
        F.get_json_object("env.data", "$.event_type").alias("event_type"),
        F.get_json_object("env.data", "$.value").cast("double").alias("value"),
        F.get_json_object("env.data", "$.user_id").cast("long").alias("user_id"),
        F.col("env._processing.source").alias("source"),
    )


# the oracle verifies the round trip is lossless: parse(serialize(x)) = x
ENVELOPE_PARSE_SQL = """
SELECT event_id, event_type, value, user_id, 'wiki-sse' AS source
FROM events
"""


def json_assemble_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("actions"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
    )
    return per_user.select(
        "user_id",
        F.to_json(
            F.struct(F.col("user_id"), F.col("actions"), F.col("errors"))
        ).alias("evidence_json"),
    )


JSON_ASSEMBLE_EVIDENCE_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS actions,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
  FROM events GROUP BY user_id
)
SELECT user_id,
       concat('{"user_id":', user_id, ',"actions":', actions, ',"errors":', errors, '}') AS evidence_json
FROM per_user
"""


def surrogate_key_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    skey = F.md5(
        F.concat_ws(
            "-",
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.col("event_id").cast("string"),
        )
    )
    return e.select("event_id", skey.alias("surrogate_key"))


SURROGATE_KEY_MD5_SQL = """
SELECT event_id,
       md5(concat_ws('-', CAST(user_id AS VARCHAR), event_type, CAST(event_id AS VARCHAR))) AS surrogate_key
FROM events
"""


def null_defaulting(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # nullif manufactures nulls so coalesce has real work (P3 semantics)
    masked = F.nullif(F.col("event_type"), F.lit("error"))
    return (
        e.select(
            "event_id",
            F.coalesce(masked, F.lit("suppressed")).alias("event_type_clean"),
            F.coalesce(F.nullif(F.col("value"), F.lit(0.0)), F.lit(-1.0)).alias("value_clean"),
        )
    )


NULL_DEFAULTING_SQL = """
SELECT event_id,
       COALESCE(NULLIF(event_type, 'error'), 'suppressed') AS event_type_clean,
       COALESCE(NULLIF(value, CAST(0.0 AS DOUBLE)), CAST(-1.0 AS DOUBLE)) AS value_clean
FROM events
"""


def conditional_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    category = (
        F.when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .otherwise(F.concat(F.lit("other_"), F.substring("event_type", 1, 2)))
    )
    return (
        e.withColumn("category", category)
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
    )


CONDITIONAL_MAPPING_SQL = """
SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
            WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
            ELSE concat('other_', substr(event_type, 1, 2)) END AS category,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


def string_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return d.select(
        "doc_id",
        "lang",
        F.length(normalized).alias("clean_len"),
        normalized.rlike(r"^[a-z ]+$").alias("is_plain_lower"),
        F.substring(normalized, 1, 20).alias("prefix20"),
    )


STRING_CLEANING_SQL = r"""
WITH norm AS (
  SELECT doc_id, lang, trim(regexp_replace(text, '\s+', ' ', 'g')) AS normalized
  FROM documents
)
SELECT doc_id, lang,
       CAST(length(normalized) AS INTEGER) AS clean_len,
       regexp_matches(normalized, '^[a-z ]+$') AS is_plain_lower,
       substr(normalized, 1, 20) AS prefix20
FROM norm
"""


def timestamp_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_ts"),
        F.unix_timestamp("ts").alias("epoch_sec"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.hour("ts").alias("event_hour"),
        F.minute("ts").alias("event_minute"),
        F.dayofweek("ts").alias("dow_1sun"),
    )


TIMESTAMP_NORMALIZE_SQL = """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
       epoch_us(ts) // 1000000 AS epoch_sec,
       strftime(ts, '%Y-%m-%d') AS event_date,
       CAST(hour(ts) AS INTEGER) AS event_hour,
       CAST(minute(ts) AS INTEGER) AS event_minute,
       CAST(dayofweek(ts) + 1 AS INTEGER) AS dow_1sun
FROM events
"""


def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion (P2's modern form): ``parse_json``
    shreds the JSON payload ONCE into the binary variant encoding, and
    ``try_variant_get`` does typed-path extraction without re-parsing
    the string per expression — at 100 TB the difference between
    variant shredding and N ``get_json_object`` calls over the same
    column is N-1 full JSON parses per row. Typed extraction feeds a
    plain hash agg; malformed payloads surface as NULL (the ``try_``
    contract), counted separately. The oracle replays the same typed
    extraction with DuckDB's JSON operators — VARIANT is an encoding,
    not a semantic, so the values must agree exactly."""
    e = load_table(spark, sf_dir, "events").select(
        # try_parse_json, not parse_json: a malformed payload must become
        # NULL (matching DuckDB's ->> returning NULL), not a runtime error
        "event_type", F.try_parse_json(F.col("props")).alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "long")
    t = e.select("event_type", k.alias("k"))
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("k").alias("n_with_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
        (F.sum("k").cast("double") / F.count("k").cast("double")).alias("avg_k"),
    )


VARIANT_PROPS_STATS_SQL = """
WITH t AS (
  SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events
)
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(k) AS n_with_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE) AS avg_k
FROM t GROUP BY event_type
"""


QUERIES = {
    "json_extract_props": json_extract_props,
    "envelope_parse": envelope_parse,
    "json_assemble_evidence": json_assemble_evidence,
    "surrogate_key_md5": surrogate_key_md5,
    "null_defaulting": null_defaulting,
    "conditional_mapping": conditional_mapping,
    "string_cleaning": string_cleaning,
    "timestamp_normalize": timestamp_normalize,
    "variant_props_stats": variant_props_stats,
}

ORACLES = {
    "json_extract_props": JSON_EXTRACT_PROPS_SQL,
    "envelope_parse": ENVELOPE_PARSE_SQL,
    "json_assemble_evidence": JSON_ASSEMBLE_EVIDENCE_SQL,
    "surrogate_key_md5": SURROGATE_KEY_MD5_SQL,
    "null_defaulting": NULL_DEFAULTING_SQL,
    "conditional_mapping": CONDITIONAL_MAPPING_SQL,
    "string_cleaning": STRING_CLEANING_SQL,
    "timestamp_normalize": TIMESTAMP_NORMALIZE_SQL,
    "variant_props_stats": VARIANT_PROPS_STATS_SQL,
}
