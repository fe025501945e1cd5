"""Structured Streaming layer — SURVEY.md §2.9 (T1-T4)."""
