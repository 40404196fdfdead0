"""Plan inspection helpers (explain-based assertions for tests/bench)."""
