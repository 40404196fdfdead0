"""The remaining adapted TPC-H query shapes: Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21.

The fixture is a TPC-H *subset* (SURVEY.md §1.2: no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode, no comment/address/phone columns),
so each query keeps the classic PLAN SHAPE while re-targeting predicates
to existing columns:

- partsupp-based queries (Q2/Q9/Q11/Q16/Q20) treat lineitem's
  (l_partkey, l_suppkey) pairs as the part-supplier relation;
- "late delivery" (receipt > commit, Q4/Q12/Q21) becomes
  ``l_returnflag = 'R'``;
- comment/phone predicates become acctbal / priority / size predicates.

All money math follows the integer-cents discipline (functions/checked.py)
so the DuckDB value-hash is FP-order-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pymapreduce_spark.functions.checked import cents
from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier, nation, region
        WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
    ),
    offers AS (
        SELECT l_partkey, l_suppkey,
               min(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_c
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey AS best_part, min(price_c) AS min_c
        FROM offers, eu_supp WHERE l_suppkey = s_suppkey
        GROUP BY l_partkey
    )
    SELECT TRY_CAST(round(s_acctbal * 100) AS BIGINT) / 100.0 AS s_acctbal,
           s_name, n_name, p_partkey, p_name,
           price_c / 100.0 AS best_price
    FROM part, offers, best, eu_supp
    WHERE p_partkey = offers.l_partkey AND offers.l_suppkey = s_suppkey
      AND best_part = p_partkey AND price_c = min_c
      AND p_size = 15 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest European supplier per qualifying part —
    the correlated MIN subquery, decorrelated into a per-part window min
    (per-(part,supplier) offer prices from lineitem stand in for
    partsupp). Both selective dims broadcast-filter lineitem before the
    aggregation, and the min rides a window over the aggregate's own
    partkey partitioning — one fact scan, one shuffle, no join-back.
    The tie comparison runs on exact integer cents."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eu_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # Qualifying parts and EU suppliers filter lineitem BEFORE the
    # aggregation — at 100 TB the offers shuffle shrinks ~300× vs
    # aggregating every part and filtering at the end.
    qualifying = part.where((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    eu_offers = (
        li.join(F.broadcast(qualifying), li.l_partkey == part.p_partkey)
        .join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(cents("l_extendedprice")).alias("price_c"))
    )
    # hash(l_partkey) satisfies both the (partkey, suppkey) clustering of
    # the aggregate AND the window's partitioning — one exchange feeds
    # both, no join-back.
    min_c = F.min("price_c").over(Window.partitionBy("l_partkey"))
    return (
        eu_offers.withColumn("min_c", min_c)
        .where(F.col("price_c") == F.col("min_c"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(qualifying), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            (cents("s_acctbal") / 100.0).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("price_c") / 100.0).alias("best_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts over orders that had a
    problem line — EXISTS becomes a left-semi join (Catalyst's own
    RewritePredicateSubquery target shape). Adapted: the fixture lacks
    commit/receipt dates, so 'late' is ``l_returnflag = 'R'``."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    problem = li.where(F.col("l_returnflag") == "R")
    return (
        window.join(problem, window.o_orderkey == problem.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT))
               - TRY_CAST(round(p_retailprice * 100) AS BIGINT)
               * TRY_CAST(round(l_quantity * 100) AS BIGINT)) / 10000.0 AS profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE 'red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for a part
    family — the widest profit expression in the corpus. Adapted:
    ``p_retailprice * l_quantity`` stands in for partsupp's
    ``ps_supplycost * l_quantity``; both profit terms stay in the same
    10^-4-dollar integer unit so the sum is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    red_parts = part.where(F.col("p_name").like("red%"))
    profit_c = cents("l_extendedprice") * (100 - cents("l_discount")) - cents(
        "p_retailprice"
    ) * cents("l_quantity")
    return (
        li.join(F.broadcast(red_parts), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(profit_c) / 10000.0).alias("profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l_partkey, sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_c
        FROM lineitem, supplier
        WHERE l_suppkey = s_suppkey AND s_nationkey = 5
        GROUP BY l_partkey
    ),
    tot AS (SELECT sum(value_c)::BIGINT AS t, count(*)::BIGINT AS n
            FROM val)
    SELECT l_partkey AS ps_partkey, value_c / 100.0 AS value
    FROM val, tot
    WHERE value_c * n > 2 * t
    ORDER BY value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant fraction of one
    nation's stock value — per-key aggregate compared against a scalar
    global aggregate of itself (aggregate-then-broadcast, never
    collect()). The significance test is SELF-NORMALIZING — value above
    2× the mean part share, spelled exact-integer (value_c · n > 2t) —
    mirroring TPC-H's own scale-aware fraction (0.0001/SF): a fixed
    1/200 cut returns zero rows once part cardinality outgrows 200,
    which it already does at the sf0.01 driver gate. Adapted: lineitem
    value per part stands in for partsupp availqty · supplycost."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation5 = supplier.where(F.col("s_nationkey") == 5)
    val = (
        li.join(F.broadcast(nation5), li.l_suppkey == supplier.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("value_c"))
    )
    tot = val.agg(
        F.sum("value_c").alias("t"), F.count("*").alias("n")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("value_c") * F.col("n") > 2 * F.col("t"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (F.col("value_c") / 100.0).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "q12_shipping_priority_class",
    oracle="""
    SELECT l_linestatus AS ship_class,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_returnflag = 'R'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
)
def q12_shipping_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix of problem shipments by class —
    fact-fact join with conditional counts. Adapted: l_linestatus stands
    in for l_shipmode, returnflag='R' for the late-delivery predicate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    shipped = li.where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        shipped.join(orders, shipped.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each part spec —
    NOT IN subquery (→ broadcast anti join; s_suppkey is non-null so the
    null-trap of NOT IN cannot fire) plus COUNT(DISTINCT) over a
    composite group key. Adapted: negative-acctbal suppliers stand in
    for the 'customer complaints' exclusion; lineitem pairs stand in for
    partsupp."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    specs = part.where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    complained = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(complained), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(specs), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_dominant_supplier",
    oracle="""
    WITH sq AS (
        SELECT l_partkey, l_suppkey,
               sum(TRY_CAST(round(l_quantity * 100) AS BIGINT)) AS q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    tq AS (SELECT l_partkey AS tq_part, sum(q) AS tot FROM sq GROUP BY l_partkey)
    SELECT s_suppkey, s_name
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_1'
      AND s_suppkey IN (
          SELECT l_suppkey FROM sq, tq, part
          WHERE l_partkey = tq_part AND 2 * q > tot
            AND p_partkey = l_partkey AND p_name LIKE 'red%')
    ORDER BY s_suppkey
    """,
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who dominate supply of a
    part family — nested aggregate threshold feeding an IN subquery
    (→ left-semi join). Adapted: 'shipped more than half of a part's
    1996 volume' (2·q > tot, exact integer) stands in for the
    availqty-vs-half-year-demand test; the per-part total reuses the
    same (part, supplier) aggregate shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sq = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("q"))
    )
    # Per-part total as a WINDOW over the (part, supplier) aggregate,
    # not a second groupBy joined back (round-7 verdict perf note: the
    # decorrelated nested-agg formulation carried 18 exchanges). The
    # window repartitions sq by l_partkey ONCE and reads each row once;
    # the aggregate-then-self-join form shuffles sq twice more (build
    # tq, then re-hash sq for the join). Partition width = suppliers
    # per part — a bounded dimension, no skew risk at any scale.
    w = Window.partitionBy("l_partkey")
    red_parts = part.where(F.col("p_name").like("red%")).select("p_partkey")
    dominant = (
        sq.withColumn("tot", F.sum("q").over(w))
        .where(2 * F.col("q") > F.col("tot"))
        .join(F.broadcast(red_parts), sq.l_partkey == F.col("p_partkey"))
        .select("l_suppkey")
    )
    nation1 = nation.where(F.col("n_name") == "NATION_1")
    return (
        supplier.join(
            F.broadcast(nation1), supplier.s_nationkey == nation.n_nationkey
        )
        .join(dominant, supplier.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole supplier who failed a multi-supplier
    order. The oracle keeps the literal EXISTS / NOT EXISTS pair; the
    Spark side decorrelates BOTH into one per-order aggregate —
    nsupp = countDistinct(supplier), nfail = countDistinct(supplier
    with a failed line). For an l1 row that is itself failed:
    'another supplier exists' ⟺ nsupp > 1, and 'no OTHER supplier
    failed' ⟺ nfail = 1. The same aggregate also carries
    (fail_supp, n_fail_rows), so the l1 rows themselves never need to
    be re-joined: lineitem is scanned ONCE, vs three times in the
    literal self-join form. Adapted: returnflag='R' stands in for
    receipt-after-commit."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    is_fail = F.col("l_returnflag") == "R"
    # One pass over lineitem, two-level aggregate: the per-(order,
    # supplier) rollup makes both COUNT(DISTINCT supplier) counts plain
    # COUNTs — no Expand (which would triple the shuffle rows) — and
    # hash(l_orderkey) pre-partitioning lets both levels share one
    # exchange. When nfail == 1 every failed row in the order belongs
    # to ONE supplier, so (fail_supp, n_fail_rows) fully replaces the
    # join back to the failed l1 rows.
    per_supp = (
        li.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(is_fail, 1).otherwise(0)).alias("supp_fail_rows"))
    )
    supp_failed = F.col("supp_fail_rows") > 0
    ord_stats = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("nsupp"),
        F.count(F.when(supp_failed, 1)).alias("nfail"),
        F.sum("supp_fail_rows").alias("n_fail_rows"),
        F.max(F.when(supp_failed, F.col("l_suppkey"))).alias("fail_supp"),
    )
    nation1 = nation.where(F.col("n_name") == "NATION_1")
    return (
        ord_stats.where((F.col("nsupp") > 1) & (F.col("nfail") == 1))
        .join(
            orders.where(F.col("o_orderstatus") == "F"),
            ord_stats.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(supplier), F.col("fail_supp") == supplier.s_suppkey)
        .join(F.broadcast(nation1), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("n_fail_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
