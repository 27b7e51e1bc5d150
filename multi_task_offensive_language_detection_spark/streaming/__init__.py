"""Structured Streaming surface (SURVEY.md §2.9). The reference is
batch-only; these exist for engine completeness and incremental ingest."""
