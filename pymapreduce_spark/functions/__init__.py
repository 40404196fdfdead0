"""Scalar function family queries (string/regex/date/math/array/map/json/hash)."""
