"""Structured Streaming harness + live query exemplars (SURVEY.md §2.10)."""
