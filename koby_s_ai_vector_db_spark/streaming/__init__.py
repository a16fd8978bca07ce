"""Structured Streaming analogues of the activity analytics (SURVEY §7.6)."""
