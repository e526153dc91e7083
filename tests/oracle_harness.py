"""Local replica of the driver's DuckDB-oracle comparison:
row count + column-name set + order-insensitive value comparison.

Used by tests to catch parity drift (float aggregation order, rounding
mode, timezone) before the driver's CORRECTNESS gate does.
"""

from __future__ import annotations

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
