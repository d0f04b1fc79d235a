"""Structured Streaming variants of the event operators (SURVEY.md §2.B
streaming row — stretch surface; the batch equivalents live in
operators/events.py and share the same aggregation logic)."""
