"""Sort / limit / top-k operators (SURVEY.md §2-G).

The driver's value-hash is order-insensitive, so sort correctness is
encoded into the *values* via row_number over the same ordering — the rank
column is what proves the order.

Scale note: ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
each partition keeps a k-heap, the driver merges M×k rows; no global sort
shuffle. A full ``orderBy`` without limit is a range-partitioned sort
(sampling + range exchange) — the only one of these that shuffles all rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F

from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


def global_sort_index(
    df: DataFrame, order: list[Column], num_partitions: int = 8
) -> DataFrame:
    """Attach a 1-based global rank column ``sort_pos`` for a total
    order WITHOUT a single-partition window.

    Two-pass range-sort: (1) range-partition + sort within partitions —
    the standard distributed total sort; (2) count rows per partition,
    broadcast the tiny cumulative-offset table, and add
    ``offset + local position`` per partition via mapInPandas. Each pass
    is fully parallel; driver state is one row per partition. This is
    the 100 TB replacement for ``row_number() OVER (ORDER BY ...)``
    (which Spark executes in ONE task).

    Requires ``order`` to be a total order (add a unique tiebreak
    column) — then sort_pos is deterministic regardless of where the
    sampled range boundaries fall.

    The per-partition position is a row_number window over ``__pid``
    plus a broadcast join against the tiny offset table — pure
    Catalyst, whole-stage-codegen throughout. The earlier mapInPandas
    formulation silently turned NaN measures into NULLs on the return
    trip (pyarrow's from_pandas treats NaN as null — round-8
    extreme_measures axis); any Arrow round-trip of raw doubles is a
    NaN hazard, so the data columns never leave the JVM here."""
    spark = df.sparkSession
    ranked_input = (
        df.repartitionByRange(num_partitions, *order)
        .sortWithinPartitions(*order)
    )
    with_pid = ranked_input.withColumn("__pid", F.spark_partition_id())
    counts = dict(
        with_pid.groupBy("__pid").count().collect()
    )  # ≤ num_partitions rows on the driver
    offsets = []
    acc = 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        with_pid.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "__pid")
        .withColumn("sort_pos", (F.col("__off") + F.col("__rn")))
        .drop("__pid", "__off", "__rn")
    )


@query(
    "sort_multikey",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           row_number() OVER (
               ORDER BY s_nationkey ASC, s_acctbal DESC NULLS LAST, s_suppkey
           ) AS sort_pos
    FROM supplier
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort (asc + desc, explicit null placement); the
    sort_pos column makes the ordering hash-checkable.

    Uses :func:`global_sort_index` — a global ``row_number()`` window
    would funnel every row through one task; the two-pass range sort
    keeps both passes parallel."""
    supplier = load_table(spark, sf_dir, "supplier")
    order = [
        F.col("s_nationkey").asc(),
        F.col("s_acctbal").desc_nulls_last(),
        F.col("s_suppkey").asc(),
    ]
    indexed = global_sort_index(
        supplier.select("s_suppkey", "s_nationkey", "s_acctbal"), order
    )
    return indexed.select(
        "s_suppkey", "s_nationkey", "s_acctbal", "sort_pos"
    )


@query(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT — deterministic only after a total order (SURVEY §2-G)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy("o_orderkey").limit(100).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject (per-partition heaps, no
    global sort shuffle) — asserted in the plan tests."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "topk_paginated",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def topk_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: page 3 of the global price ranking (LIMIT 20
    OFFSET 40) — deterministic only because the ordering is total
    (price desc, key tiebreak). Spark plans offset+limit together as
    a single TakeOrdered over offset+limit rows, so the cost is the
    top-60 heap per partition, never a global sort; deep pagination
    (big OFFSET) degrades toward a full sort on ANY engine — cursor
    (keyset) pagination is the 100 TB answer, and this op is the
    bounded-page form that stays cheap."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(40)
        .limit(20)
    )
