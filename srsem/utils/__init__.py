"""Utilities: torch checkpoint conversion, profiling/tracing helpers."""
