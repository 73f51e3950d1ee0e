"""Structured Streaming: incremental page ingest (SURVEY.md §2.10)."""
