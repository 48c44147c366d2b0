"""Structured Streaming: incremental ingest + windowed rollups."""
