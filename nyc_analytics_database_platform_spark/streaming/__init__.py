"""Structured Streaming operators (SURVEY.md section 2.9 - no reference
counterpart; the driver's events table is the stream source)."""
