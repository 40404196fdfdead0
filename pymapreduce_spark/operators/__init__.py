"""Operator modules; importing each registers its queries (see registry.py)."""
