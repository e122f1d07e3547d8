"""Reusable dataflow operators (SURVEY.md §2 families)."""
