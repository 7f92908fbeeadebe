"""Streaming twins of the batch apps (SURVEY §2.10)."""
