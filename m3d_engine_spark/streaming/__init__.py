"""Structured Streaming pipelines (beyond-reference capability)."""
