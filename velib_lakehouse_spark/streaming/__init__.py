"""Structured Streaming pipelines (the reference's silver path + upgrades)."""
