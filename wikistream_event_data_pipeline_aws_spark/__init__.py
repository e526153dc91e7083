"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference wikistream event pipeline
(mdshihabullah/wikistream-event-data-pipeline-aws), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, with
Structured Streaming for ingest and library-level operators
(merge, dedup, similarity, text analysis, data quality) built from
built-in functions wherever semantics allow.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, local tuning)
- ``catalog``    testdata table loading + temp-view registration
- ``plans``      named batch query plans (wiki pipeline semantics, TPC-H surface)
- ``operators``  merge/dedup/similarity/text/profiling operators
- ``dq``         data-quality constraint compiler + audit
- ``streaming``  Structured Streaming ingest (file/rate/kafka), watermark dedup
- ``registry``   name -> (query fn, oracle SQL) used by __spark_entry__
"""

__version__ = "0.1.0"


def ship_by_value(module) -> None:
    """Register ``module`` for by-VALUE cloudpickle serialization so task
    closures referencing its symbols carry the definitions with them —
    Python workers then never need the repo on their import path (launch
    cwd outside the repo; a real cluster without ``--py-files``). Leaf
    modules whose code executes inside workers call this on themselves at
    import time; driver-only failures stay non-fatal because shipping is
    an optimization of the import contract, not a semantic change."""
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except Exception:  # pragma: no cover - best-effort hardening
        pass
