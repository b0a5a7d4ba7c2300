"""Structured Streaming ingestion patterns (SURVEY.md §2.10)."""
