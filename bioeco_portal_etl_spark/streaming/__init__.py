"""Structured Streaming extension (SURVEY.md §2.11 — not reference-mandated)."""
