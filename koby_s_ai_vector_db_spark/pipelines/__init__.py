"""Batch pipelines chaining the operators end-to-end (SURVEY §3.2)."""
