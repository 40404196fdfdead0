"""Projection and predicate operators (SURVEY.md §2-C).

All pure Catalyst expressions — each query's filter/projection reaches the
parquet scan (PushedFilters / ReadSchema), which is what makes these free
at 100 TB: a scan that prunes to 2 columns and skips row groups does the
work of the whole query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


@query(
    "proj_select",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_orderpriority AS priority,
           (TRY_CAST(CASE WHEN isnan(o_totalprice) THEN NULL ELSE o_totalprice END AS DECIMAL(12,2)) * 1.1::DECIMAL(2,1))::DOUBLE
               AS taxed_price
    FROM orders
    """,
)
def proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename + computed column; scan prunes to 3 cols.
    Product in exact DECIMAL for cross-engine bit determinism."""
    from pymapreduce_spark.functions.checked import dec2

    orders = load_table(spark, sf_dir, "orders")
    taxed = (dec2("o_totalprice") * F.lit(1.1).cast("decimal(2,1)")).cast(
        "double"
    )
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("priority"),
        taxed.alias("taxed_price"),
    )


@query(
    "pred_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE (l_quantity > 45 AND l_discount >= 0.05)
       OR (l_returnflag = 'R' AND NOT l_linestatus = 'F')
    """,
)
def pred_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT chains; pushed to the scan as one compound predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        ((F.col("l_quantity") > 45) & (F.col("l_discount") >= 0.05))
        | ((F.col("l_returnflag") == "R") & ~(F.col("l_linestatus") == "F"))
    ).select("l_orderkey", "l_linenumber")


@query(
    "pred_in_between_like",
    oracle="""
    SELECT p_partkey, p_brand, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_size BETWEEN 10 AND 30
      AND p_name LIKE '%a%'
    """,
)
def pred_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE membership and range predicates."""
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("p_name").like("%a%")
    ).select("p_partkey", "p_brand", "p_size")


@query(
    "pred_null",
    oracle="""
    WITH flagged AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT c_custkey, bal,
           (bal IS NULL) AS is_missing,
           (bal IS NOT DISTINCT FROM NULL) AS null_safe_eq_null
    FROM flagged
    """,
)
def pred_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: IS NULL and null-safe equality (<=>). The fixture
    has no natural NULLs, so negatives are mapped to NULL first."""
    customer = load_table(spark, sf_dir, "customer")
    flagged = customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return flagged.select(
        "c_custkey",
        "bal",
        F.col("bal").isNull().alias("is_missing"),
        F.col("bal").eqNullSafe(F.lit(None).cast("double")).alias(
            "null_safe_eq_null"
        ),
    )


@query(
    "pred_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 400000 THEN 'large'
                WHEN o_totalprice >= 200000 THEN 'medium'
                ELSE 'small' END AS size_class
    FROM orders
    """,
)
def pred_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection (CASE WHEN chain)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 400000, "large")
        .when(F.col("o_totalprice") >= 200000, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


@query(
    "proj_unpivot",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               count(*) FILTER (o_orderstatus = 'O')::BIGINT AS open_cnt,
               count(*) FILTER (o_orderstatus = 'F')::BIGINT AS filled_cnt,
               count(*) FILTER (o_orderstatus = 'P')::BIGINT AS pending_cnt
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status_col, cnt
    FROM wide
    UNPIVOT (cnt FOR status_col IN (open_cnt, filled_cnt, pending_cnt))
    """,
)
def proj_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping with the built-in unpivot/melt (the inverse
    of agg_pivot): a per-priority status crosstab melts back into
    (priority, status_col, cnt) rows — the tidy form every charting
    and ML-featurization layer wants. Spark's unpivot compiles to one
    Expand node (rows × columns, no shuffle, no join); DuckDB's
    UNPIVOT is the oracle spelling of the same reshape. Round-trip
    with agg_pivot proves both reshaping directions exist."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias(
            "open_cnt"
        ),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias(
            "filled_cnt"
        ),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias(
            "pending_cnt"
        ),
    )
    return wide.unpivot(
        "o_orderpriority",
        ["open_cnt", "filled_cnt", "pending_cnt"],
        "status_col",
        "cnt",
    )
