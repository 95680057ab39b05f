"""Structured Streaming variants of the event-window queries."""
