"""Structured Streaming runners — the streaming twin of the batch
watermark protocol (SURVEY.md §2.9, §7.5)."""
