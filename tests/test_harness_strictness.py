"""Regression tests for the parity harness itself (VERDICT r4 item 2).

The driver's value-hash is type-sensitive.  Round 4 produced four red
driver rows whose values were cell-for-cell identical to the oracle —
the only difference was DuckDB widening SUM(BIGINT) to HUGEINT, which
pandas materializes as float64 while Spark emits int64.  The local
harness used to wave through ANY int-vs-float family mismatch as a
"nullable-int artifact", so all four bugs survived a green suite.

These tests pin the tightened contract of
``tests/oracle_harness.compare``:

* int-vs-float with NO nulls on either side  -> FAIL (type drift);
* int-vs-float where a side has nulls        -> forgiven (pandas has no
  native nullable int64, the column genuinely must widen);
* a HUGEINT-producing DuckDB oracle run end-to-end through ``compare``
  against an int64 Spark result fails until the oracle casts to BIGINT.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from tests.oracle_harness import compare


def _spark_int_df(spark, values, col="v"):
    return spark.createDataFrame([(int(x),) for x in values], f"{col} long")


def test_int_vs_float_without_nulls_fails(spark):
    sdf = _spark_int_df(spark, [1, 2, 3])
    odf = pd.DataFrame({"v": pd.array([1.0, 2.0, 3.0], dtype="float64")})
    problems = compare(sdf, odf)
    assert problems, "equal-valued int64 vs float64 (no nulls) must be flagged"
    assert any("dtype family" in p for p in problems)


def test_int_vs_float_with_nulls_is_forgiven(spark):
    sdf = spark.createDataFrame([(1,), (None,), (3,)], "v long")
    odf = pd.DataFrame({"v": pd.array([1.0, None, 3.0], dtype="float64")})
    assert compare(sdf, odf) == []


def test_hugeint_widening_oracle_is_caught(spark):
    """End-to-end shape of the round-4 failure: DuckDB SUM over BIGINT
    returns HUGEINT (pandas float64 / object), Spark returns int64."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(range AS BIGINT) AS x FROM range(5)")
    bad = con.execute("SELECT SUM(x) AS s FROM t").df()
    good = con.execute("SELECT CAST(SUM(x) AS BIGINT) AS s FROM t").df()
    sdf = _spark_int_df(spark, [10], col="s")

    bad_fam = bad["s"].dtype.kind
    assert bad_fam in ("f", "O"), "DuckDB SUM(BIGINT) should widen past int64"
    assert compare(sdf, bad), "HUGEINT-widened oracle must mismatch int64 Spark"
    assert compare(sdf, good) == [], "BIGINT-cast oracle must be parity-clean"
