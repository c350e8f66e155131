"""Deterministic test fixtures (see FIXTURES.md)."""
