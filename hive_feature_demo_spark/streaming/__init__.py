"""Structured Streaming operators (SURVEY §2.3 streaming row)."""
