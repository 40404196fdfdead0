"""Additional adapted TPC-H query shapes (SURVEY §5.3: the fixture is a
TPC-H *subset* — no commitdate/receiptdate/shipmode/partsupp — so each
query is adapted to existing columns; Q1/Q3/Q5 shapes live in
aggregates.py / joins.py).

These widen the golden query corpus: every classic plan shape (scan-agg,
star join with top-k, join-to-dimension ratio, having-filtered semi
join) appears with its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.functions.checked import cents
from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(round(l_extendedprice * 100)::BIGINT
               * round(l_discount * 100)::BIGINT) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + tight predicate + global sum — the
    predicate-pushdown showcase (all three filters reach the parquet
    reader; no shuffle at all, one partial+final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(cents("l_extendedprice") * cents("l_discount")) / 10000.0
            ).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           sum(round(l_extendedprice * 100)::BIGINT
               * (100 - round(l_discount * 100)::BIGINT)) / 10000.0
               AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue by customer — fact join
    with two broadcast dims, group on a high-cardinality key, top-20."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = lineitem.where(F.col("l_returnflag") == "R")
    return (
        returned.join(ords, returned.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(customer), ords.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
                / 10000.0
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
        100.0 * sum(CASE WHEN p_type = 'PROMO'
                    THEN round(l_extendedprice * 100)::BIGINT
                         * (100 - round(l_discount * 100)::BIGINT)
                    ELSE 0 END)::DOUBLE
        / sum(round(l_extendedprice * 100)::BIGINT
              * (100 - round(l_discount * 100)::BIGINT))::DOUBLE, 6)
        AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share — broadcast dim join +
    conditional aggregation ratio. Integer-cents keeps both the
    numerator and denominator exact; only the final ratio is rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    net = cents("l_extendedprice") * (100 - cents("l_discount"))
    filtered = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    return (
        filtered.join(F.broadcast(part), filtered.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", net).otherwise(0)
                ).cast("double")
                / F.sum(net).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice * 100)::BIGINT / 100.0 AS o_totalprice,
           total_qty
    FROM customer, orders, (
        SELECT l_orderkey, sum(round(l_quantity * 100)::BIGINT) / 100.0
               AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(round(l_quantity * 100)::BIGINT) / 100.0 > 250
    ) big
    WHERE o_orderkey = big.l_orderkey AND c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — aggregate-then-join with a
    HAVING filter (the aggregate side shrinks to ~1% before joining,
    which is exactly the order you want at scale), then top-50."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg((F.sum(cents("l_quantity")) / 100.0).alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            (cents("o_totalprice") / 100.0).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )
