"""Custom Spark data sources (Spark 4 Python DataSource API).

The reference ingests the Wikimedia SSE firehose through an
out-of-engine feeder process (``sse_consumer/consumer.py`` — SURVEY
§2.1 S2). Spark 4's Python DataSource API lets the engine own that
boundary instead: :mod:`.sse` registers an ``sse_replay`` format that
reads a recorded SSE event log (NDJSON, one event per line — exactly
what an SSE capture produces) as EITHER a batch DataFrame or a
micro-batched stream with real offset bookkeeping, so the same
downstream pipeline runs unchanged against the replayed firehose.
"""

from .sse import SSEReplayDataSource

__all__ = ["SSEReplayDataSource"]
