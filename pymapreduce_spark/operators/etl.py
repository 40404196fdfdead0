"""Warehouse-ETL composite operators: slowly-changing-dimension builds
and other change-tracking shapes a MapReduce-era pipeline expresses as
chained jobs and our engine expresses as window functions over one scan.

100 TB doctrine: SCD builds partition by the dimension's natural key —
every window below is `partitionBy(key) orderBy(time)`, so the build is
one shuffle keyed by the dimension key with no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


@query(
    "etl_scd2",
    oracle="""
    WITH ordered AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               lag(o_orderpriority) OVER w AS prev_prio
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ), changes AS (
        SELECT o_custkey, o_orderpriority,
               o_orderdate AS valid_from, o_orderkey
        FROM ordered
        WHERE prev_prio IS NULL OR prev_prio != o_orderpriority
    )
    SELECT o_custkey, o_orderpriority, valid_from,
           lead(valid_from) OVER w AS valid_to,
           row_number() OVER w AS version,
           (lead(valid_from) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
    """,
)
def etl_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each customer's
    order-priority history into validity intervals [valid_from, valid_to)
    with a version counter and an is_current flag.

    Two windows over the SAME (o_custkey, date, key) partitioning+order:
    lag() detects attribute changes, lead()/row_number() close the
    intervals — Catalyst plans both in one Window node chain after a
    single shuffle on o_custkey. Deterministic under date ties via the
    o_orderkey tiebreak (SURVEY §5.4.4)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.withColumn(
            "prev_prio", F.lag("o_orderpriority").over(w)
        )
        .where(
            F.col("prev_prio").isNull()
            | (F.col("prev_prio") != F.col("o_orderpriority"))
        )
        .select(
            "o_custkey",
            "o_orderpriority",
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    return changes.select(
        "o_custkey",
        "o_orderpriority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


@query(
    "etl_snapshot_diff",
    oracle="""
    WITH s1 AS (
        SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
        FROM orders WHERE o_orderdate >= DATE '1995-01-01'
                      AND o_orderdate <  DATE '1996-01-01'
        GROUP BY o_custkey
    ), s2 AS (
        SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
        FROM orders WHERE o_orderdate >= DATE '1996-01-01'
                      AND o_orderdate <  DATE '1997-01-01'
        GROUP BY o_custkey
    )
    SELECT coalesce(s1.o_custkey, s2.o_custkey) AS o_custkey,
           CASE WHEN s1.o_custkey IS NULL THEN 'insert'
                WHEN s2.o_custkey IS NULL THEN 'delete'
                WHEN s1.n_orders != s2.n_orders THEN 'update'
                ELSE 'unchanged' END AS change,
           s1.n_orders AS old_n_orders,
           s2.n_orders AS new_n_orders
    FROM s1 FULL OUTER JOIN s2 ON s1.o_custkey = s2.o_custkey
    """,
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots: diff each customer's
    1995 vs 1996 order activity and classify as insert / delete /
    update / unchanged — the CDC shape a warehouse sync job emits.

    One scan builds BOTH snapshots (conditional aggregation would also
    work; here two filtered aggregates of the same cached scan), then a
    single full outer join on the key classifies every row. At 100 TB
    both sides partial-aggregate to one row per key before the join, so
    the exchange carries keyed aggregates, never raw fact rows."""
    orders = load_table(spark, sf_dir, "orders")

    def snap(lo: str, hi: str) -> DataFrame:
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(lo).cast("date"))
                & (F.col("o_orderdate") < F.lit(hi).cast("date"))
            )
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"))
        )

    s1 = snap("1995-01-01", "1996-01-01").alias("s1")
    s2 = snap("1996-01-01", "1997-01-01").alias("s2")
    change = (
        F.when(F.col("s1.o_custkey").isNull(), "insert")
        .when(F.col("s2.o_custkey").isNull(), "delete")
        .when(F.col("s1.n_orders") != F.col("s2.n_orders"), "update")
        .otherwise("unchanged")
    )
    return s1.join(
        s2, F.col("s1.o_custkey") == F.col("s2.o_custkey"), "full"
    ).select(
        F.coalesce(F.col("s1.o_custkey"), F.col("s2.o_custkey")).alias(
            "o_custkey"
        ),
        change.alias("change"),
        F.col("s1.n_orders").alias("old_n_orders"),
        F.col("s2.n_orders").alias("new_n_orders"),
    )
