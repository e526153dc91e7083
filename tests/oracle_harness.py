"""Local replica of the driver's DuckDB-oracle comparison:
row count + column-name set + order-insensitive value comparison.

Used by tests to catch parity drift (float aggregation order, rounding
mode, timezone) before the driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value form: everything to python objects, floats kept
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    except TypeError:
        df = df.iloc[df.astype(str).apply(tuple, axis=1).argsort()].reset_index(drop=True)
    return df


def _dtype_family(s: pd.Series) -> str:
    """Collapse a pandas column to a type family for parity checking.

    The driver's value-hash is type-sensitive: DuckDB ``//`` silently
    widens to HUGEINT, which pandas materializes as an *object* column of
    Python ints while Spark emits int64 — identical values, different
    hash (the round-2 ``pack_sequences`` red row). Families make that
    class of oracle-side type drift a local test failure instead of a
    driver-round discovery.
    """
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "timestamp"
    if k != "O":
        return k
    for v in s:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            # int values in an *object* column: pandas had no native home
            # for them (DuckDB HUGEINT) — distinct from int64 on purpose.
            return "bigint-object"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (tuple, list)):
            return "array"
        if isinstance(v, (bytes, bytearray)):
            return "binary"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, datetime.datetime):
            return "timestamp"
        if isinstance(v, datetime.date):
            return "date"
        return type(v).__name__
    return "empty"


def _has_nulls(s: pd.Series) -> bool:
    return bool(s.isna().any())


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s = _normalize(spark_df.toPandas())
    o = _normalize(oracle_df)
    if len(s) != len(o):
        problems.append(f"row count: spark={len(s)} oracle={len(o)}")
        return problems
    if list(s.columns) != list(o.columns):
        problems.append(f"columns: spark={list(s.columns)} oracle={list(o.columns)}")
        return problems
    for c in s.columns:
        fs, fo = _dtype_family(s[c]), _dtype_family(o[c])
        if fs == fo or "empty" in (fs, fo):
            continue
        # int-vs-float is a legitimate pandas artifact ONLY when nulls
        # are present (a nullable int column widens to float64).  With
        # no nulls anywhere it is genuine oracle-side type drift — e.g.
        # DuckDB SUM(BIGINT) widening to HUGEINT → float64 while Spark
        # emits int64 — which the driver's type-sensitive hash rejects
        # even though every value is equal (the round-4 red rows).
        if {fs, fo} == {"int", "float"} and (
            _has_nulls(s[c]) or _has_nulls(o[c])
        ):
            continue
        problems.append(f"col {c} dtype family: spark={fs} oracle={fo}")
    if problems:
        return problems
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                fa = float("nan") if a is None else float(a)
                fb = float("nan") if b is None else float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if fa == fb:
                    continue
                if float_tol and abs(fa - fb) <= float_tol * max(1.0, abs(fb)):
                    continue
                problems.append(
                    f"col {c} row {i}: spark={a!r} oracle={b!r} (diff={fa - fb!r})"
                )
                if len(problems) > 5:
                    return problems
            elif a != b:
                if str(a) == str(b):
                    continue
                problems.append(f"col {c} row {i}: spark={a!r} oracle={b!r}")
                if len(problems) > 5:
                    return problems
    return problems
