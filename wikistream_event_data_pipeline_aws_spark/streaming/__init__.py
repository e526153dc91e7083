"""Structured Streaming ingest (SURVEY §2.10 T1-T6)."""
