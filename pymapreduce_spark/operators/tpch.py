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
    SELECT sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
               * TRY_CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue
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
           sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
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
                    THEN TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT))
                    ELSE 0 END)::DOUBLE
        / sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
              * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT)))::DOUBLE, 6)
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
           TRY_CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice,
           total_qty
    FROM customer, orders, (
        SELECT l_orderkey, sum(TRY_CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
               AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(TRY_CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 > 250
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


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between a nation pair by
    year — the two nation dims broadcast under DIFFERENT aliases (the
    self-join-on-a-dimension pattern); the symmetric pair predicate sits
    on the joined result so Catalyst can still push the single-nation
    filters into each broadcast side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    shipped = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        shipped.join(orders, shipped.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), shipped.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
                / 10000.0
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume_c
                     ELSE 0 END)::DOUBLE / sum(volume_c)::DOUBLE, 6)
               AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT)) AS volume_c,
               n1.n_name AS supp_nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
          AND s_nationkey = n1.n_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional market volume by
    year — the deepest star join in the corpus (8 tables, 5 broadcast
    dims + 2 shuffle fact joins). Numerator and denominator stay exact
    integer cents; only the final share ratio is rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    volume_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    joined = (
        li.join(F.broadcast(part.where(F.col("p_type") == "STANDARD")),
                li.l_partkey == part.p_partkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(customer), ords.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
              F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume_c.alias("volume_c"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume_c")).otherwise(
        F.lit(0)
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(nation_vol).cast("double") / F.sum("volume_c").cast("double"), 6
        ).alias("mkt_share")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer —
    outer join with an ON-clause (not WHERE) filter, double aggregation.
    Adapted: the original excludes 'special request' comments; the
    fixture has no o_comment, so the exclusion targets a priority class.
    count(o_orderkey) over the left join counts 0 for order-less
    customers exactly like the spec's count(*)-over-empty-group."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT))) AS total_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_c / 10000.0 AS total_revenue
    FROM supplier, rev
    WHERE s_suppkey = supplier_no
      AND total_c = (SELECT max(total_c) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    agg, then compare against the global max of that same agg. The max
    is a 1-row broadcast (aggregate-then-broadcast, never collect());
    the tie comparison runs on exact integer cents, not doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
                "total_c"
            )
        )
    )
    top = rev.agg(F.max("total_c").alias("max_c"))
    return (
        rev.join(F.broadcast(top), rev.total_c == F.col("max_c"))
        .join(F.broadcast(supplier), rev.supplier_no == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", (F.col("total_c") / 10000.0).alias("total_revenue")
        )
    )


@query(
    "q17_small_quantity",
    oracle="""
    WITH pq AS (
        SELECT l_partkey, count(*) AS n,
               sum(TRY_CAST(round(l_quantity * 100) AS BIGINT)) AS sq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)) / 700.0 AS avg_yearly
    FROM lineitem l, part p, pq
    WHERE p.p_partkey = l.l_partkey AND pq.l_partkey = l.l_partkey
      AND p_brand = 'Brand#3' AND p_size < 15
      AND 5 * pq.n * TRY_CAST(round(l.l_quantity * 100) AS BIGINT) < pq.sq
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    correlated-subquery-on-avg pattern, decorrelated into a per-part
    aggregate join. The `qty < 0.2 * avg(qty)` predicate is rewritten
    exact-integer (5·n·qty_c < Σqty_c) so no FP threshold tie can split
    the engines. Adapted: p_size < 15 stands in for the container
    predicate (fixture has no p_container)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pq = li.groupBy(F.col("l_partkey").alias("pq_key")).agg(
        F.count("*").alias("n"), F.sum(cents("l_quantity")).alias("sq")
    )
    filtered_part = part.where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
    )
    return (
        li.join(F.broadcast(filtered_part), li.l_partkey == part.p_partkey)
        .join(pq, li.l_partkey == F.col("pq_key"))
        .where(5 * F.col("n") * cents("l_quantity") < F.col("sq"))
        .agg((F.sum(cents("l_extendedprice")) / 700.0).alias("avg_yearly"))
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
        (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
         AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
         AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
         AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicate spanning
    both join sides — the OR-of-ANDs Catalyst can't fully push down, but
    the common `p_partkey = l_partkey` conjunct still drives a broadcast
    hash join; the residual disjunction evaluates post-join. Adapted:
    p_size bands replace container/shipmode predicates."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    branch = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(branch)
        .agg(
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
                / 10000.0
            ).alias("revenue")
        )
    )


@query(
    "q22_sales_opportunity",
    oracle="""
    WITH pos AS (
        SELECT sum(TRY_CAST(round(c_acctbal * 100) AS BIGINT)) AS s, count(*) AS n
        FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 7
    )
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           sum(TRY_CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
    FROM customer, pos
    WHERE c_nationkey < 7
      AND TRY_CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers who never ordered — a
    scalar-aggregate threshold (aggregate-then-broadcast) plus an anti
    join against recent orders (no order since 2000 — the spec's
    "7 years without an order", shifted into the fixture date range). The `acctbal > avg(positive acctbal)` compare is exact-integer
    (bal_c · n > Σbal_c). Adapted: c_nationkey < 7 stands in for the
    phone-prefix country filter (fixture has no c_phone)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cohort = customer.where(F.col("c_nationkey") < 7)
    pos = cohort.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents("c_acctbal")).alias("s"), F.count("*").alias("n")
    )
    return (
        cohort.crossJoin(F.broadcast(pos))
        .where(cents("c_acctbal") * F.col("n") > F.col("s"))
        .join(
            orders.where(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ),
            cohort.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("totacctbal"),
        )
    )
