"""Utilities: profiling, persistence."""
