"""Operator registry — the single source of truth for the driver contract.

Each operator module registers its queries with the :func:`query`
decorator. ``__spark_entry__.py`` exposes ``QUERIES`` / ``ORACLES``
verbatim; the test suite parametrizes over them and runs the same
Spark-vs-DuckDB differential check the driver runs.

Contract (SURVEY.md §5.2): a query is a ``(spark, sf_dir) -> DataFrame``
callable; its oracle is ANSI SQL DuckDB runs over pre-registered views of
the same parquet tables. Column names must match exactly — the driver
sorts columns by name before the order-insensitive value-hash. Queries
without a SQL-expressible oracle register with ``oracle=None`` and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
_F = TypeVar("_F", bound=QueryFn)

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[_F], _F]:
    """Register ``fn`` as the implementation of operator ``name``.

    ``oracle`` is the DuckDB SQL string for the driver's hash check, or
    None for rows-only ops (streaming, approximate, partition-introspection).
    """

    def deco(fn: _F) -> _F:
        if name in QUERIES:
            raise ValueError(f"duplicate operator registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def reorder(names: list[str]) -> None:
    """Rebuild QUERIES/ORACLES in ``names`` order (must be a permutation
    of the registered query names). Called once at package-import time so
    every consumer — ``__spark_entry__`` and direct registry readers —
    sees the driver-facing verification order."""
    assert sorted(names) == sorted(QUERIES), "reorder() needs a permutation"
    q = {n: QUERIES[n] for n in names}
    o = {n: ORACLES[n] for n in names if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)
