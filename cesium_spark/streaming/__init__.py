"""Structured Streaming seam (SURVEY.md §2.10)."""
