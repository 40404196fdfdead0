"""Structured Streaming operators and the availableNow replay harness."""
