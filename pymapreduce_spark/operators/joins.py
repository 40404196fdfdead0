"""Join operators (SURVEY.md §2-D) + the flagship Q3-shape query.

Strategy notes for 100 TB (the point of building on Catalyst):

- Dimension tables (region 5, nation 25, supplier ~1k, customer ~15k rows
  at sf0.1; all ≪ broadcast threshold even at sf100) are *broadcast* —
  explicitly where the op demands it, otherwise by
  ``autoBroadcastJoinThreshold``/AQE. The fact side never shuffles for a
  broadcast join.
- Fact–fact joins (orders⋈lineitem) shuffle on the join key; AQE handles
  skew splitting and post-shuffle coalescing. No hand scheduling.
- Semi/anti joins are expressed as such (not DISTINCT-after-join), so the
  build side deduplicates during the join and no fact row is duplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.functions.checked import cents, dec2, trunc_ntz  # noqa: F401
from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q3 adapted to the fixture subset, SURVEY §5.3).

    Exercises the whole kernel: parquet scan with pushed filters →
    broadcast join (filtered customer is small) → shuffle join on
    orderkey → partial/final aggregation → top-k
    (TakeOrderedAndProject). This is ``entry()``'s query.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    cust = customer.where(F.col("c_mktsegment") == "BUILDING")
    ords = orders.where(F.col("o_orderdate") < cutoff)
    items = lineitem.where(F.col("l_shipdate") > cutoff)
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            (
                F.sum(
                    cents("l_extendedprice")
                    * (100 - cents("l_discount"))
                )
                / 10000.0
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "join_inner_equi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi-join; Catalyst picks broadcast or sort-merge from stats."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT r_name, count(*) AS n_suppliers, round(avg(s_acctbal), 4) AS avg_bal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side join: both dims replicated via ``F.broadcast`` — zero
    shuffle of the supplier side. Plan test asserts BroadcastHashJoin."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_bal"),
        )
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           big.n_big AS n_big_orders
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 450000
        GROUP BY o_custkey
    ) big ON c_custkey = big.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; unmatched customers keep NULL counts (the
    aggregate-then-join shape keeps the outer side un-duplicated)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.where(F.col("o_totalprice") > 450000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big_orders"))
    )
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left"
    ).select("c_custkey", "c_mktsegment", "n_big_orders")


@query(
    "join_right",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           big.n_big AS n_big_orders
    FROM (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 450000
        GROUP BY o_custkey
    ) big RIGHT JOIN customer ON big.o_custkey = c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (mirror of join_left, preserving the right side)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.where(F.col("o_totalprice") > 450000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big_orders"))
    )
    return big.join(
        customer, big.o_custkey == customer.c_custkey, "right"
    ).select("c_custkey", "c_mktsegment", "n_big_orders")


@query(
    "join_full",
    oracle="""
    WITH v AS (
        SELECT user_id, date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
               count(*) AS n_views
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), p AS (
        SELECT user_id, date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
               count(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT coalesce(v.user_id, p.user_id) AS user_id,
           coalesce(v.day, p.day) AS day,
           v.n_views, p.n_purchases
    FROM v FULL OUTER JOIN p ON v.user_id = p.user_id AND v.day = p.day
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join over sparse (user, day) cells — both sides produce
    unmatched rows, exercising NULL fill on each side."""
    ev = load_table(spark, sf_dir, "events")
    day = trunc_ntz("day", F.col("ts")).alias("day")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", day)
        .agg(F.count("*").alias("n_views"))
        .alias("v")
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", day)
        .agg(F.count("*").alias("n_purchases"))
        .alias("p")
    )
    cond = (F.col("v.user_id") == F.col("p.user_id")) & (
        F.col("v.day") == F.col("p.day")
    )
    return views.join(purch, cond, "full").select(
        F.coalesce(F.col("v.user_id"), F.col("p.user_id")).alias("user_id"),
        F.coalesce(F.col("v.day"), F.col("p.day")).alias("day"),
        "n_views",
        "n_purchases",
    )


@query(
    "join_semi",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity >= 49.5
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter as a true semi-join: the probe row is emitted at
    most once regardless of match multiplicity."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    heavy = lineitem.where(F.col("l_quantity") >= 49.5)
    return orders.join(
        heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderpriority")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-existence filter as an anti-join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r_name, c_mktsegment
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny inputs (5 regions × 5 segments).

    At scale: cross joins are only ever sane when one side is broadcast-
    small; this one is 5×5."""
    region = load_table(spark, sf_dir, "region")
    segs = load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return region.crossJoin(segs).select("r_name", "c_mktsegment")


@query(
    "join_theta_range",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
        ('negative', -10000.0, 0.0),
        ('low',      0.0,      2500.0),
        ('mid',      2500.0,   5000.0),
        ('high',     5000.0,   7500.0),
        ('top',      7500.0,   10000.0))
    SELECT s_suppkey, band
    FROM supplier JOIN bands ON s_acctbal >= lo AND s_acctbal < hi
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (interval) join: classic banding. Physical plan is a
    broadcast nested-loop join — fine because the band table is tiny;
    at 100 TB the band side stays broadcast so cost is one fact scan."""
    supplier = load_table(spark, sf_dir, "supplier")
    bands = spark.createDataFrame(
        [
            ("negative", -10000.0, 0.0),
            ("low", 0.0, 2500.0),
            ("mid", 2500.0, 5000.0),
            ("high", 5000.0, 7500.0),
            ("top", 7500.0, 10000.0),
        ],
        "band string, lo double, hi double",
    )
    cond = (supplier.s_acctbal >= bands.lo) & (supplier.s_acctbal < bands.hi)
    return supplier.join(F.broadcast(bands), cond).select("s_suppkey", "band")


@query(
    "join_self",
    oracle="""
    SELECT o1.o_custkey AS c_custkey, count(*) AS n_pairs
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey AND o1.o_orderdate < o2.o_orderdate
    GROUP BY o1.o_custkey
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with aliases: ordered order-pairs per customer."""
    orders = load_table(spark, sf_dir, "orders")
    o1 = orders.alias("o1")
    o2 = orders.alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o1.o_orderdate") < F.col("o2.o_orderdate")),
        )
        .groupBy(F.col("o1.o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "join_multiway",
    oracle="""
    SELECT n_name,
           sum(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - TRY_CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a region filter. All
    dimension sides broadcast; the only shuffle is orders⋈lineitem and
    the final tiny aggregation. AQE may reorder — that's the point."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia = region.where(F.col("r_name") == "ASIA")
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        lineitem.join(ords, lineitem.l_orderkey == ords.o_orderkey)
        .join(
            F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(
            F.broadcast(customer),
            (ords.o_custkey == customer.c_custkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(asia), nation.n_regionkey == asia.r_regionkey)
        .groupBy("n_name")
        .agg(
            (
                F.sum(
                    cents("l_extendedprice")
                    * (100 - cents("l_discount"))
                )
                / 10000.0
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (
        SELECT nullif(user_id % 10, 0) AS k,
               count(*)::BIGINT AS n_a
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), b AS (
        SELECT nullif(user_id % 10, 0) AS k,
               count(*)::BIGINT AS n_b
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT a.k, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: keys compared with <=> (IS NOT DISTINCT
    FROM), so NULL joins NULL instead of silently dropping — the
    semantics sentinel-key data (unknown bucket → NULL) needs. Catalyst
    plans <=> as a REAL equi-join (EqualNullSafe join key, hash/SMJ),
    not a nested-loop fallback; a plain = join would lose the NULL
    bucket on both sides. Both sides aggregate before the join, so the
    exchange carries one row per bucket at any scale."""
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("user_id") % 10, F.lit(0))

    def side(t: str, alias: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == t)
            .groupBy(k.alias("k"))
            .agg(F.count("*").alias(alias))
        )

    a, b = side("view", "n_a"), side("purchase", "n_b")
    return a.join(
        b, a["k"].eqNullSafe(b["k"])
    ).select(a["k"].alias("k"), "n_a", "n_b")


@query(
    "join_star_denormalize",
    oracle="""
    SELECT l_orderkey, l_partkey,
           round(l_extendedprice, 2) AS l_extendedprice,
           o_orderpriority, c_mktsegment, n_name, r_name, p_type,
           s_name
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_orderkey < 1000
    """,
)
def join_star_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full star-schema denormalization: the fact slice widened with
    every dimension in ONE query — the export/feature-table build that
    feeds BI extracts and training feature stores. All six dimension
    joins broadcast (orders-side keys pre-filtered by the fact
    predicate through join pushdown; dims are dimension-sized by
    definition), so the fact table never shuffles — the wide row is
    assembled scan-side. At 100 TB this is THE query where broadcast
    vs shuffle decides feasibility; the plan test pins the broadcast
    count."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") < 1000
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .select(
            "l_orderkey",
            "l_partkey",
            F.round("l_extendedprice", 2).alias("l_extendedprice"),
            "o_orderpriority",
            "c_mktsegment",
            "n_name",
            "r_name",
            "p_type",
            "s_name",
        )
    )


@query(
    "join_coverage_report",
    oracle="""
    WITH v AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    ), p AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), j AS (
        SELECT v.user_id AS vu, p.user_id AS pu
        FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
    )
    SELECT count(*) FILTER (vu IS NOT NULL AND pu IS NOT NULL)::BIGINT
               AS matched,
           count(*) FILTER (pu IS NULL)::BIGINT AS left_only,
           count(*) FILTER (vu IS NULL)::BIGINT AS right_only,
           round(count(*) FILTER (vu IS NOT NULL AND pu IS NOT NULL)
                 / (1.0 * nullif(count(*), 0)), 6) AS match_rate
    FROM j
    """,
)
def join_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-coverage audit: before trusting an inner join, ONE full
    outer join over the two key sets reports matched / left-only /
    right-only counts and the match rate — the diagnosis that
    distinguishes 'the join is wrong' from 'the data never overlapped'
    (an inner join silently conflates them). Both sides reduce to
    DISTINCT keys first, so the outer join carries key-cardinality
    rows; one conditional aggregate folds the Venn diagram into a
    single row."""
    ev = load_table(spark, sf_dir, "events")

    def keys(t: str, alias: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == t)
            .select(F.col("user_id").alias(alias))
            .distinct()
        )

    v, p = keys("view", "vu"), keys("purchase", "pu")
    j = v.join(p, v.vu == p.pu, "full")
    matched = F.count(
        F.when(F.col("vu").isNotNull() & F.col("pu").isNotNull(), 1)
    )
    return j.agg(
        matched.alias("matched"),
        F.count(F.when(F.col("pu").isNull(), 1)).alias("left_only"),
        F.count(F.when(F.col("vu").isNull(), 1)).alias("right_only"),
        F.round(
            matched / (1.0 * F.nullif(F.count("*"), F.lit(0))), 6
        ).alias("match_rate"),
    )


@query(
    "join_accumulating_snapshot",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           min(l.l_shipdate) AS first_ship,
           max(l.l_shipdate) AS last_ship,
           (epoch(min(l.l_shipdate)) - epoch(o.o_orderdate))::BIGINT
               // 86400 AS days_to_first_ship,
           count(*)::BIGINT AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey < 2000
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
)
def join_accumulating_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Accumulating-snapshot fact: each order's lifecycle milestones —
    placed, first shipment, last shipment, and the placed→first-ship
    lag in whole days — the one-row-per-process-instance table a
    fulfillment dashboard reads (vs the transaction fact's
    one-row-per-event). One fact-fact equi-join and one grouped
    aggregate; the milestone lag is exact integer epoch-seconds //
    86400. At scale both sides shuffle once on the order key and the
    per-order group is the order's line count."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 2000
    )
    li = load_table(spark, sf_dir, "lineitem")
    j = orders.join(li, orders.o_orderkey == li.l_orderkey)
    days = (
        (
            F.unix_timestamp(F.min("l_shipdate"))
            - F.unix_timestamp(F.first("o_orderdate"))
        )
        / 86400
    ).cast("long")
    return (
        j.groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
            F.floor(
                (
                    F.unix_timestamp(F.min("l_shipdate"))
                    - F.unix_timestamp(F.min("o_orderdate"))
                )
                / 86400
            ).cast("long").alias("days_to_first_ship"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "join_lateral_topk",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           l.linenumber,
           l.price_cents
    FROM orders AS o, LATERAL (
        SELECT l_linenumber AS linenumber,
               TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
                   AS price_cents
        FROM lineitem
        WHERE l_orderkey = o.o_orderkey
        ORDER BY TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
                     DESC NULLS LAST,
                 l_linenumber ASC NULLS LAST
        LIMIT 2
    ) AS l
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join (SQL:2003 lateral derived table; Spark SQL lateral
    correlated subquery): for each urgent order, its top-2 lineitems by
    price — the "per-row subquery with ORDER BY/LIMIT" shape users
    write naturally. The 100 TB story is what Catalyst DOES with it:
    the correlated subquery is DECORRELATED — no per-outer-row
    nested-loop execution survives planning — into a distributed
    ``WindowGroupLimit`` top-k (PARTIAL per-partition limit before the
    single hash exchange, exactly topk_per_group's physical shape)
    plus one equi-join. DuckDB runs the very same LATERAL SQL
    natively, so this op is two-engine SURFACE parity, not just value
    parity.

    Plan doctrine (measured, r11): ordering the lateral subquery by
    the raw EXPRESSION ``TRY_CAST(round(price*100) ...)`` blocks the
    WindowGroupLimit rewrite — Catalyst plans a plain row_number over
    a GLOBAL rangepartitioning exchange of the whole inner relation
    (a full extra shuffle at 100 TB). Naming the sort key in an inner
    projection first restores the partial group-limit and drops the
    range exchange. Always project-then-sort in lateral top-ks.

    Determinism: top-k ordered by exact integer cents DESC with the
    l_linenumber tie-break, NULLS LAST pinned on both axes in both
    engines (Spark defaults DESC→NULLS LAST, ASC→NULLS FIRST; DuckDB
    defaults both to NULLS LAST — never rely on either)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "lat_orders"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lat_lineitem"
    )
    return spark.sql(
        """
        SELECT o.o_orderkey AS orderkey,
               l.linenumber,
               l.price_cents
        FROM lat_orders AS o, LATERAL (
            SELECT linenumber, price_cents
            FROM (
                SELECT l_orderkey,
                       l_linenumber AS linenumber,
                       TRY_CAST(round(l_extendedprice * 100) AS BIGINT)
                           AS price_cents
                FROM lat_lineitem
            )
            WHERE l_orderkey = o.o_orderkey
            ORDER BY price_cents DESC NULLS LAST,
                     linenumber ASC NULLS LAST
            LIMIT 2
        ) AS l
        WHERE o.o_orderpriority = '1-URGENT'
        """
    )
