"""Scalar function helpers (SURVEY.md §2.8)."""
