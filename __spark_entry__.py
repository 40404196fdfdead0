"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All operators live in ``pymapreduce_spark/`` — importing the package
populates the registry (one `queries()` entry per SURVEY.md §2 op key).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pymapreduce_spark  # noqa: E402  (registers all operators)
from pymapreduce_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape) on /root/testdata/sf0.001."""
    from pymapreduce_spark.session import ensure_runtime_configs

    ensure_runtime_configs(spark)
    return registry.QUERIES["q3_shipping_priority"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The registry is already in driver-facing verification order
    (never-driver-checked queries first — see pymapreduce_spark.ordering),
    so the driver's artifact window covers fresh operators each round."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ops without an entry get the
    driver's weaker rows-only check (streaming / approximate ops)."""
    return dict(registry.ORACLES)
