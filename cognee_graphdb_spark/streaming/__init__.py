"""Structured Streaming ingest + incremental semantics (SURVEY.md §2.9)."""
