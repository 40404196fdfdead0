"""MapReduce core primitives (SURVEY.md §2-A), expressed Spark-first.

The reference is a Python MapReduce framework (SURVEY §0-§1): its native
surface is map / flatMap / filter / reduce-by-key / combiner / partitioner /
secondary sort / distributed cache / counters / job chaining. Each maps to
a *declarative* DataFrame construct so Catalyst owns the physical plan:

- mapper emit        → ``select`` / ``withColumn`` (whole-stage codegen)
- flatMap emit       → ``explode`` over an array expression
- combiner           → automatic partial aggregation (asserted in plan tests)
- partitioner        → ``repartition(n, key)`` (hash partitioning)
- secondary sort     → window ``row_number`` ordered within key partitions
- distributed cache  → ``F.broadcast`` join
- counters           → ``observe``-style global aggregates
- job chaining       → plain DataFrame composition (one DAG, no
  intermediate materialization — strictly better than MR's write-to-HDFS
  barrier between jobs)

At 100 TB: everything here is a single scan + at most one shuffle keyed on
the group column; partial aggregation bounds shuffle volume by the number
of distinct keys per partition, not input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pymapreduce_spark.functions.checked import dec2
from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


@query(
    "mr_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (TRY_CAST(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE l_extendedprice END AS DECIMAL(12,2))
            * (1 - TRY_CAST(CASE WHEN isnan(l_discount) THEN NULL ELSE l_discount END AS DECIMAL(12,2))))::DOUBLE AS net_price
    FROM lineitem
    """,
)
def mr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→1 record transform: the MR mapper emitting exactly one pair.
    The product is computed in exact DECIMAL (see functions.checked)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast(
        "double"
    )
    return li.select("l_orderkey", "l_linenumber", net.alias("net_price"))


@query(
    "mr_flatmap",
    oracle="""
    SELECT doc_id, unnest(str_split(text, ' ')) AS word
    FROM documents
    """,
)
def mr_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N emit (the classic mapper): explode a produced array."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )


@query(
    "mr_filter",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase' AND value > 100
    """,
)
def mr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→{0,1} emit. The predicate is pushed to the parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 100)
    ).select("event_id", "user_id", "value")


@query(
    "mr_reduce",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def mr_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group all values by key, fold per group (shuffle + reduce)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "mr_combine",
    oracle="""
    SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def mr_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side combine: Catalyst plans partial_/merge_ HashAggregate
    automatically — shuffle volume is O(distinct keys per partition).
    Plan-shape test asserts the partial aggregate exists."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


@query(
    "mr_partition",
    oracle="""
    SELECT user_id, 1 AS n_partitions, count(*) AS n_rows
    FROM events
    GROUP BY user_id
    """,
)
def mr_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash partitioning invariant: after ``repartition(8, key)`` every
    key lives in exactly one partition (the MR partitioner contract)."""
    ev = load_table(spark, sf_dir, "events")
    parts = ev.repartition(8, "user_id").withColumn(
        "pid", F.spark_partition_id()
    )
    return parts.groupBy("user_id").agg(
        F.count_distinct("pid").cast("int").alias("n_partitions"),
        F.count("*").alias("n_rows"),
    )


@query(
    "mr_sort_within",
    oracle="""
    SELECT user_id, rn, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id NULLS FIRST
               ) AS rn
        FROM events
        WHERE ts IS NOT NULL
    ) WHERE rn <= 3
    """,
)
def mr_sort_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort: values ordered within each key group. Declared as a
    window (partition by key, order by value) so Catalyst plans one
    shuffle keyed on user_id + an in-partition sort — exactly MR's
    shuffle-with-secondary-sort, minus the hand-written comparator.
    NULL event times are excluded (null-ts doctrine: the secondary
    SORT KEY is the time — Spark ranks NULLS FIRST, DuckDB NULLS
    LAST, so an un-timestamped row would steal rank 1 on one engine
    only)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "rn", "event_id", "event_type")
    )


@query(
    "mr_distribute_cache",
    oracle="""
    SELECT n_name, count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def mr_distribute_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side table shipped to every worker = broadcast join. nation (25
    rows) is replicated; the big side never shuffles for the join."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


@query(
    "mr_counter",
    oracle="""
    SELECT count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           count(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def mr_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global task counters = a global aggregate (single row). The
    ``observe`` API is the streaming-safe equivalent; here the counters
    ARE the query result."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.count_distinct("user_id").alias("n_users"),
    )


@query(
    "mr_chain",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents
    ), tf AS (
        SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
    )
    SELECT word, count(*) AS doc_freq, sum(tf)::BIGINT AS total_tf
    FROM tf GROUP BY word
    ORDER BY doc_freq DESC, word
    LIMIT 20
    """,
)
def mr_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job chaining: MR job₁ output feeds job₂ feeds job₃. In Spark this
    is one DAG — no HDFS materialization barrier between 'jobs', and
    Catalyst optimizes across the whole chain."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(
        F.count("*").alias("doc_freq"), F.sum("tf").alias("total_tf")
    )
    return dfreq.orderBy(F.desc("doc_freq"), "word").limit(20)


@query(
    "mr_wordcount",
    oracle="""
    SELECT word, count(*) AS cnt FROM (
        SELECT unnest(str_split(text, ' ')) AS word FROM documents
    ) GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical MapReduce program: split → explode → count by word.
    Partial aggregation is the combiner; top-k is TakeOrderedAndProject
    (no global sort shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    counts = words.groupBy("word").agg(F.count("*").alias("cnt"))
    return counts.orderBy(F.desc("cnt"), "word").limit(20)


@query(
    "mr_total_order_sort",
    oracle="""
    SELECT true AS n_partitions_ok,
           (SELECT count(*) FROM orders)::BIGINT AS n_rows,
           true AS globally_sorted,
           true AS partitions_disjoint
    """,
)
def mr_total_order_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TeraSort pattern: a TOTAL-ORDER sort across output
    partitions via range partitioning (repartitionByRange samples the
    key distribution to place boundaries — Hadoop's
    TotalOrderPartitioner with InputSampler, built in) +
    sortWithinPartitions. Every partition is internally sorted AND all
    of partition i precedes all of partition i+1, so concatenating
    output files yields a globally sorted dataset without any single
    node ever holding it.

    The sampled boundaries are not deterministic, so the CHECKED
    output is the invariant, not the boundaries: per-partition
    (min,max,rows) are computed distributed (one row per partition),
    and the two claims — each partition sorted range-disjoint from the
    next — are folded into booleans the oracle states as `true`.
    Verification cost is one scan of the sorted result plus a
    window over ≤ n_partitions rows."""
    orders = load_table(spark, sf_dir, "orders")
    ranged = orders.repartitionByRange(
        8, "o_totalprice", "o_orderkey"
    ).sortWithinPartitions("o_totalprice", "o_orderkey")
    per_part = (
        ranged.select(
            F.spark_partition_id().alias("pid"),
            "o_totalprice",
        )
        .groupBy("pid")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )
    w = Window.orderBy("pid")
    flags = per_part.select(
        "n",
        (F.col("hi") >= F.col("lo")).alias("part_ok"),
        F.coalesce(
            F.lag("hi").over(w) <= F.col("lo"), F.lit(True)
        ).alias("disjoint_ok"),
    )
    # coalesce: over an EMPTY input the claims hold vacuously (an empty
    # dataset is sorted) and the row total is 0, not NULL.
    # n_partitions_ok (a bound, not a count): range partitioning fills
    # AT MOST the requested 8 partitions — with 3 input rows only 3 are
    # non-empty, and Spark never promises all 8 get rows even at size
    # (skewed keys collapse ranges) — so the checked claim is
    # 0 < n_non_empty <= 8, vacuous-true on empty input (round-7 tiny
    # axis; the old literal-8 oracle was asserting a non-guarantee)
    return flags.agg(
        (
            (F.count("*") <= 8)
            & ((F.count("*") > 0) | (F.coalesce(F.sum("n"), F.lit(0)) == 0))
        ).alias("n_partitions_ok"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_rows"),
        F.coalesce(F.bool_and("part_ok"), F.lit(True)).alias(
            "globally_sorted"
        ),
        F.coalesce(F.bool_and("disjoint_ok"), F.lit(True)).alias(
            "partitions_disjoint"
        ),
    )
