"""Structured Streaming surface (engine extension; the reference's only
stream-like behavior is timestamped append files — SURVEY §2.7)."""
