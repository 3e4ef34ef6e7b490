"""Structured Streaming surface (SURVEY.md §2.9 / §7.2(10) extension)."""
