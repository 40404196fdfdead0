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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


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
    sort_pos column makes the ordering hash-checkable."""
    supplier = load_table(spark, sf_dir, "supplier")
    order = [
        F.col("s_nationkey").asc(),
        F.col("s_acctbal").desc_nulls_last(),
        F.col("s_suppkey").asc(),
    ]
    w = Window.orderBy(*order)
    return supplier.orderBy(*order).select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.row_number().over(w).alias("sort_pos"),
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
