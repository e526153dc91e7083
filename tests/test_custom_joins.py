"""Regression tests for the custom join operators (ADVICE round 1):
banded_range_join left-join NULL handling and asof_join payload atomicity."""

from __future__ import annotations

from wikistream_event_data_pipeline_aws_spark.operators.asof import asof_join
from wikistream_event_data_pipeline_aws_spark.operators.rangejoin import (
    banded_range_join,
)


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_range_join_left_null_column_no_duplicates(spark):
    """A matched left row with a NULL non-key column must appear exactly
    once (ADVICE high: whole-row anti-join re-emitted it with NULL right
    columns)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = _ts(
        spark,
        [("k1", t0, None), ("k1", t0, 7)],
        "key string, lts timestamp, extra int",
    )
    right = _ts(
        spark,
        [("k1", t0 + dt.timedelta(minutes=30), "hit")],
        "key string, rts timestamp, tag string",
    )
    out = banded_range_join(
        left, right, ["key"], "lts", "rts",
        lower_us=0, upper_us=3_600_000_000, how="left",
    ).collect()
    assert len(out) == 2  # one per left row, both matched
    assert all(r["tag"] == "hit" for r in out)


def test_range_join_left_null_unmatched_kept_once(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = _ts(
        spark,
        [("k1", t0, None), ("k2", t0, None)],
        "key string, lts timestamp, extra int",
    )
    right = _ts(
        spark,
        [("k1", t0 + dt.timedelta(minutes=5), "hit")],
        "key string, rts timestamp, tag string",
    )
    out = banded_range_join(
        left, right, ["key"], "lts", "rts",
        lower_us=0, upper_us=3_600_000_000, how="left",
    ).collect()
    assert len(out) == 2
    by_key = {r["key"]: r["tag"] for r in out}
    assert by_key == {"k1": "hit", "k2": None}


def test_asof_join_payload_is_atomic(spark):
    """Payload columns must all come from the SAME latest right row —
    a NULL field in the latest row must not be backfilled from an older
    row (ADVICE low: per-column last(ignorenulls) mixed rows)."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m, 0)
    left = _ts(spark, [("u1", t(10))], "user_id string, ts timestamp")
    right = _ts(
        spark,
        [("u1", t(1), "A", "B"), ("u1", t(2), "C", None)],
        "user_id string, ts timestamp, x string, y string",
    )
    out = asof_join(left, right, ["user_id"], "ts", ["x", "y"]).collect()
    assert len(out) == 1
    assert (out[0]["x"], out[0]["y"]) == ("C", None)


def test_banded_range_left_join_survives_nondeterministic_left(spark):
    """The left path re-evaluates the id-tagged left plan in two
    branches; a shuffle upstream must not let rows be double-emitted or
    dropped (the id assignment is pinned by localCheckpoint)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = _ts(
        spark,
        [(f"k{i % 7}", t0 + dt.timedelta(minutes=i)) for i in range(200)],
        "key string, lts timestamp",
    ).repartition(8)  # injects a round-robin (nondeterministic) shuffle
    right = _ts(
        spark,
        [(f"k{i % 7}", t0 + dt.timedelta(minutes=i, seconds=30), f"tag{i}") for i in range(0, 200, 3)],
        "key string, rts timestamp, tag string",
    )
    out = banded_range_join(
        left, right, ["key"], "lts", "rts",
        lower_us=0, upper_us=60_000_000, how="left",
    )
    # every left row appears at least once; unmatched exactly once with NULL
    assert out.groupBy("key", "lts").count().filter("count < 1").count() == 0
    n_left = left.count()
    n_matched_keys = out.filter("tag IS NOT NULL").select("key", "lts").distinct().count()
    n_unmatched = out.filter("tag IS NULL").count()
    assert n_matched_keys + n_unmatched == n_left
