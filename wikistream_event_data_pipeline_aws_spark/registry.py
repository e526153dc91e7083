"""Central query registry: name -> (builder fn, DuckDB oracle SQL | None).

Consumed by ``__spark_entry__.py`` (driver contract) and by the parity
test-suite, which replays the driver's check locally: run the Spark plan
and the oracle SQL side-by-side and compare row count, column names and
order-insensitive values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _register(queries: dict[str, QueryFn], oracles: dict[str, str | None]) -> None:
    for name, fn in queries.items():
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        sql = oracles.get(name)
        if sql is not None:
            _ORACLES[name] = sql


def _load() -> None:
    if _QUERIES:
        return
    from .plans import wiki

    _register(wiki.QUERIES, wiki.ORACLES)
    for modname in (
        "tpch",
        "windows",
        "setops",
        "json_ops",
        "dedup",
        "text",
        "similarity",
        "multimodal",
        "extensions",
        "dq",
        "merge",
        "streaming_batch",
        "streaming_live",
        "silver_flags",
        "partitioned",
    ):
        try:
            mod = __import__(f"{__package__}.plans.{modname}", fromlist=["QUERIES", "ORACLES"])
        except ImportError:
            continue
        _register(mod.QUERIES, getattr(mod, "ORACLES", {}))


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
