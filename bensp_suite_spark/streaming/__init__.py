"""Structured Streaming variants of the pipelines (SURVEY §2.8)."""
