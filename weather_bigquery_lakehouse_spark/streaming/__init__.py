"""Structured Streaming: incremental ingest + windowed aggregation."""
