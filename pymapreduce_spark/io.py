"""Fixture IO: path → typed DataFrame, owning the events nanos fix.

Every query reads fixture tables through :func:`load_table`; nothing else
in the engine calls ``spark.read.parquet`` on fixtures directly. This is
what keeps the SURVEY §1.2 gotcha (ns timestamps in ``events.parquet``)
centralized: with ``spark.sql.legacy.parquet.nanosAsLong=true`` the ``ts``
column arrives as long nanoseconds and is converted here — via integer
division, not float, to avoid ulp drift — to a microsecond TimestampType
that matches DuckDB's ``ts::TIMESTAMP`` truncation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.session import ensure_runtime_configs

#: All fixture tables (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# DataFrame catalog: fixtures are immutable, so the analyzed relation
# (file listing + parquet footer schema) is reused per session. Saves
# ~0.1-0.3 s of re-listing/footer reads on EVERY query. Keyed by session
# id so a driver-created fresh session never sees stale plans.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _fix_events(df: DataFrame) -> DataFrame:
    """Convert the ns-as-long ``ts`` column to a proper µs timestamp.

    ``ts div 1000`` is integer (floor) division on the long nanos value —
    exact, and identical to DuckDB's ns→µs cast truncation for the
    positive-epoch fixture range (2024). A float division here would lose
    precision (2024 epoch-nanos ≈ 1.7e18 exceeds double's 53-bit mantissa).
    """
    dtypes = dict(df.dtypes)
    if dtypes.get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtypes.get("ts") == "timestamp_ntz":
        # Newer fixtures store ts as parquet timestamp[us] without timezone,
        # which Spark reads as TimestampNTZType. Session timezone is pinned
        # UTC (session.py), so casting to the zoned TimestampType is
        # value-preserving and matches DuckDB's ts::TIMESTAMP. The zoned
        # type is required by withWatermark and unix_micros downstream.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a typed DataFrame.

    Plain ``spark.read.parquet`` — schema comes from the parquet footer, so
    Catalyst gets real column types for pushdown/pruning. Only ``events``
    needs post-read normalization.
    """
    key = (id(spark), os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    ensure_runtime_configs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _fix_events(df)
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
