"""Warehouse-ETL composite operators: slowly-changing-dimension builds
and other change-tracking shapes a MapReduce-era pipeline expresses as
chained jobs and our engine expresses as window functions over one scan.

100 TB doctrine: SCD builds partition by the dimension's natural key —
every window below is `partitionBy(key) orderBy(time)`, so the build is
one shuffle keyed by the dimension key with no global ordering anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pymapreduce_spark.functions.checked import epoch_micros
from pymapreduce_spark.io import load_table, read_back
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


@query(
    "etl_fk_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS relationship,
           (SELECT count(*) FROM lineitem) AS n_child,
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM orders o
                WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o WHERE NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c WHERE NOT EXISTS
               (SELECT 1 FROM nation n
                WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s WHERE NOT EXISTS
               (SELECT 1 FROM nation n
                WHERE n.n_nationkey = s.s_nationkey))
    UNION ALL
    SELECT 'nation.n_regionkey -> region',
           (SELECT count(*) FROM nation),
           (SELECT count(*) FROM nation n WHERE NOT EXISTS
               (SELECT 1 FROM region r
                WHERE r.r_regionkey = n.n_regionkey))
    """,
)
def etl_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for every
    foreign-key edge, how many child rows exist and how many are
    orphans (no matching parent) — the data-quality gate an ETL
    pipeline runs before publishing a snapshot. NOT EXISTS is spelled
    as a left_anti join, the null-safe formulation (NOT IN returns
    zero rows the moment the parent side has one NULL key).

    Each check is one anti join where the parent side is
    dims-or-aggregated — broadcastable at any fixture scale, and at
    100 TB the fact-side anti join partial-aggregates to a count
    before anything crosses the wire. The five checks union into one
    plan, so Catalyst schedules them as parallel independent stages."""
    checks = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey -> region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    parts = []
    for label, child_t, child_k, parent_t, parent_k in checks:
        child = load_table(spark, sf_dir, child_t)
        parent = load_table(spark, sf_dir, parent_t).select(
            F.col(parent_k).alias("__pk")
        )
        orphans = child.join(
            parent, child[child_k] == F.col("__pk"), "left_anti"
        )
        parts.append(
            child.agg(F.count("*").alias("n_child")).crossJoin(
                orphans.agg(F.count("*").alias("n_orphan"))
            ).select(
                F.lit(label).alias("relationship"), "n_child", "n_orphan"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "etl_data_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           (SELECT count(*) FROM orders) AS n_rows,
           count(*) FILTER (o_orderkey IS NULL) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_custkey', (SELECT count(*) FROM orders),
           count(*) FILTER (o_custkey IS NULL), count(DISTINCT o_custkey)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', (SELECT count(*) FROM orders),
           count(*) FILTER (o_orderstatus IS NULL),
           count(DISTINCT o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', (SELECT count(*) FROM orders),
           count(*) FILTER (o_totalprice IS NULL),
           count(DISTINCT o_totalprice)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', (SELECT count(*) FROM orders),
           count(*) FILTER (o_orderdate IS NULL),
           count(DISTINCT o_orderdate)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', (SELECT count(*) FROM orders),
           count(*) FILTER (o_orderpriority IS NULL),
           count(DISTINCT o_orderpriority)
    FROM orders
    """,
)
def etl_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling of the `orders` table — row count, null count,
    exact distinct count per column — the schema-drift/data-quality
    summary an ingestion pipeline publishes with every batch.

    All six columns profile in ONE aggregate over ONE scan
    (count+count_distinct per column are partial-aggregable in a single
    HashAggregate), then the 1×N metric row unpivots to N rows with
    `stack` — no per-column scan, no union of six jobs (the oracle
    spells it per-column; DuckDB scans a 15 k-row view six times for
    free, Spark at 100 TB must not). Exact integers only — no string
    min/max, whose casts render differently across engines."""
    orders = load_table(spark, sf_dir, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, dist_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


@query(
    "etl_dq_rules",
    oracle="""
    SELECT 'orders.totalprice_positive' AS rule,
           count(*) AS n_checked,
           count(*) FILTER (NOT coalesce(o_totalprice > 0, false))
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders.orderdate_in_range', count(*),
           count(*) FILTER (NOT coalesce(
               o_orderdate BETWEEN DATE '1992-01-01'
                               AND DATE '1998-12-31', false))
    FROM orders
    UNION ALL
    SELECT 'orders.status_enum', count(*),
           count(*) FILTER (NOT coalesce(
               o_orderstatus IN ('O', 'F', 'P'), false))
    FROM orders
    UNION ALL
    SELECT 'events.type_enum', count(*),
           count(*) FILTER (NOT coalesce(event_type IN
               ('view', 'click', 'signup', 'purchase', 'error'), false))
    FROM events
    UNION ALL
    SELECT 'documents.n_chars_consistent', count(*),
           count(*) FILTER (NOT coalesce(n_chars = length(text), false))
    FROM documents
    """,
)
def etl_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule engine: each rule is a boolean
    predicate over one table; the report is (rule, n_checked,
    n_violations) — the publish gate an ETL pipeline evaluates before
    promoting a batch, and the natural place to wire alert thresholds.

    All rules on one table evaluate in ONE conditional aggregate over
    ONE scan (`count(when(~pred, 1))` columns, unpivoted with stack),
    so the whole report costs one map-only pass per table regardless of
    rule count — the oracle spells it per-rule, which at 100 TB would
    re-scan the fact table once per rule. Violation counts are exact
    integers; NULL predicate results count as violations (a NULL where
    the rule expects truth IS a quality failure)."""
    from pymapreduce_spark.io import load_table as _lt

    def rule_block(table: str, rules: list[tuple[str, F.Column]]) -> DataFrame:
        df = _lt(spark, sf_dir, table)
        aggs = [F.count("*").alias("n_checked")]
        for i, (_, pred) in enumerate(rules):
            aggs.append(
                F.count(
                    F.when(~F.coalesce(pred, F.lit(False)), 1)
                ).alias(f"v{i}")
            )
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{label}', v{i}" for i, (label, _) in enumerate(rules)
        )
        return wide.selectExpr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)",
            "n_checked",
        ).select("rule", "n_checked", "n_violations")

    orders_rules = rule_block(
        "orders",
        [
            ("orders.totalprice_positive", F.col("o_totalprice") > 0),
            (
                "orders.orderdate_in_range",
                F.col("o_orderdate").between("1992-01-01", "1998-12-31"),
            ),
            (
                "orders.status_enum",
                F.col("o_orderstatus").isin("O", "F", "P"),
            ),
        ],
    )
    events_rules = rule_block(
        "events",
        [
            (
                "events.type_enum",
                F.col("event_type").isin(
                    "view", "click", "signup", "purchase", "error"
                ),
            )
        ],
    )
    docs_rules = rule_block(
        "documents",
        [
            (
                "documents.n_chars_consistent",
                F.col("n_chars") == F.length("text"),
            )
        ],
    )
    return orders_rules.unionByName(events_rules).unionByName(docs_rules)


@query(
    "etl_skew_report",
    oracle="""
    WITH k AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ), m AS (
        SELECT max(cnt) AS mc FROM k
    )
    SELECT count(*)::BIGINT AS n_keys,
           sum(cnt)::BIGINT AS total_rows,
           max(cnt)::BIGINT AS max_cnt,
           round(sum(cnt)::BIGINT / (1.0 * count(*)), 4) AS avg_cnt,
           round(quantile_cont(cnt, 0.95), 4) AS p95_cnt,
           round(max(cnt) / (sum(cnt)::BIGINT / (1.0 * count(*))), 4)
               AS skew_ratio,
           (SELECT min(user_id) FROM k, m WHERE k.cnt = m.mc)
               AS heaviest_key
    FROM k
    """,
)
def etl_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnosis: distribution of per-key row counts for a
    prospective join/agg key (events.user_id) — the report you run
    BEFORE keying a 100 TB shuffle, to decide between a plain hash
    join, salting, or AQE skew splitting.

    Two-phase: per-key counts (one map-side-combined shuffle on the
    key), then a single global aggregate over the key histogram — the
    histogram has one row per key, orders of magnitude smaller than the
    data, so the global stage is trivial at any scale. The heaviest key
    is picked deterministically as min(struct(-cnt, key)): largest
    count, smallest key id on ties — one partial-aggregable expression,
    no second scan. avg/skew use sum/count explicitly (exact integer
    sum, one division) so both engines emit bit-identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    heavy = F.min(
        F.struct((-F.col("cnt")).alias("neg"), F.col("user_id").alias("k"))
    )
    avg_cnt = F.sum("cnt") / (1.0 * F.count("*"))
    rep = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(avg_cnt, 4).alias("avg_cnt"),
        F.round(F.percentile("cnt", 0.95), 4).alias("p95_cnt"),
        F.round(F.max("cnt") / avg_cnt, 4).alias("skew_ratio"),
        heavy.alias("h"),
    )
    return rep.select(
        "n_keys",
        "total_rows",
        "max_cnt",
        "avg_cnt",
        "p95_cnt",
        "skew_ratio",
        F.col("h").getField("k").alias("heaviest_key"),
    )


@query(
    "etl_compact_plan",
    oracle="""
    WITH p AS (
        SELECT (year(l_shipdate) * 100 + month(l_shipdate))::BIGINT
                   AS part_key,
               count(*)::BIGINT AS n_rows
        FROM lineitem GROUP BY 1
    )
    SELECT part_key, n_rows,
           (coalesce(sum(n_rows) OVER (
                ORDER BY part_key NULLS FIRST
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), 0) // 20000)::BIGINT AS target_file
    FROM p
    """,
)
def etl_compact_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: bin-pack date partitions into
    ~20 k-row output files by running-sum assignment — the maintenance
    pass a 100 TB lake runs to fix write-amplified partition layouts.

    The global-ordered window is NOT a scale hazard here: it runs over
    the partition-level summary (one row per year-month — thousands of
    rows at any data scale), never over the data. The data-scale work
    is the per-partition count, a map-side-combined shuffle. Executing
    the plan is then `repartitionByRange(target_file)` + write, which
    this op deliberately stops short of (the plan IS the contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    part_key = (
        F.year("l_shipdate") * 100 + F.month("l_shipdate")
    ).cast("long")
    p = li.groupBy(part_key.alias("part_key")).agg(
        F.count("*").alias("n_rows")
    )
    w = (
        Window.orderBy("part_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("n_rows").over(w), F.lit(0))
    return p.select(
        "part_key",
        "n_rows",
        F.floor(prior / 20000).alias("target_file"),
    )


@query(
    "etl_scd2_lookup",
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
    ), scd AS (
        SELECT o_custkey, o_orderpriority, valid_from,
               lead(valid_from) OVER w AS valid_to,
               row_number() OVER w AS version
        FROM changes
        WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           s.o_orderpriority AS prio_at_order,
           s.version::BIGINT AS dim_version
    FROM orders o
    JOIN scd s ON o.o_custkey = s.o_custkey
              AND s.valid_from <= o.o_orderdate
              AND (s.valid_to IS NULL OR o.o_orderdate < s.valid_to)
    """,
)
def etl_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: every fact row (order) joined to
    the SCD2 dimension version that was valid AT its event date — the
    late-arriving-fact / historical-reporting join every type-2
    warehouse runs, composed on top of etl_scd2's build.

    The temporal predicate rides an EQUI-join on the dimension's
    natural key (o_custkey) with the [valid_from, valid_to) range as a
    post-join filter — Catalyst plans a hash/sort-merge join on the
    key, never a nested loop over intervals; half-open intervals are
    non-overlapping by construction, so each fact matches exactly one
    version. At 100 TB both sides shuffle once on the key and the
    per-key match set is a customer's handful of versions."""
    orders = load_table(spark, sf_dir, "orders")
    scd = etl_scd2(spark, sf_dir).select(
        F.col("o_custkey").alias("s_custkey"),
        F.col("o_orderpriority").alias("prio_at_order"),
        "valid_from",
        "valid_to",
        F.col("version").cast("long").alias("dim_version"),
    )
    return (
        orders.join(
            scd,
            (F.col("o_custkey") == F.col("s_custkey"))
            & (F.col("valid_from") <= F.col("o_orderdate"))
            & (
                F.col("valid_to").isNull()
                | (F.col("o_orderdate") < F.col("valid_to"))
            ),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            "prio_at_order",
            "dim_version",
        )
    )


@query(
    "etl_compact_execute",
    oracle="""
    WITH p AS (
        SELECT (year(l_shipdate) * 100 + month(l_shipdate))::BIGINT
                   AS part_key,
               count(*)::BIGINT AS n_rows
        FROM lineitem GROUP BY 1
    ), planned AS (
        SELECT part_key, n_rows,
               (coalesce(sum(n_rows) OVER (
                    ORDER BY part_key NULLS FIRST
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) // 20000)::BIGINT AS target_file
        FROM p
    )
    SELECT target_file,
           count(*)::BIGINT AS n_partitions,
           sum(n_rows)::BIGINT AS n_rows
    FROM planned GROUP BY target_file
    """,
)
def etl_compact_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction EXECUTION: apply etl_compact_plan's bin assignment —
    rewrite the table hive-partitioned by target_file — then read the
    compacted layout back and report per-file totals, which must equal
    what the plan promised (the oracle recomputes the promise from the
    raw table; the Spark side reports only what is physically on disk
    after the rewrite — write path and read path both under test).

    The rewrite is one shuffle keyed by the bin id (repartition on
    target_file before partitionBy write → one file per bin), the same
    move a 100 TB lake's maintenance job makes; the read-back is a
    partition-pruned scan of the new layout."""
    from pymapreduce_spark.io import stable_scratch
    from pymapreduce_spark.operators.etl import etl_compact_plan

    li = load_table(spark, sf_dir, "lineitem")
    plan = etl_compact_plan(spark, sf_dir)
    part_key = (
        F.year("l_shipdate") * 100 + F.month("l_shipdate")
    ).cast("long")
    # Null-SAFE bin lookup: rows with a NULL ship date form a real
    # partition in the plan; a plain equi-join would silently drop them
    # from the rewrite — compaction must move EVERY row.
    bins = plan.select(
        F.col("part_key").alias("plan_key"), "target_file"
    )
    assigned = (
        li.withColumn("part_key", part_key)
        .join(
            F.broadcast(bins),
            F.col("part_key").eqNullSafe(F.col("plan_key")),
        )
        .drop("plan_key")
    )
    out = stable_scratch(sf_dir, "compact_exec")
    (
        assigned.repartition("target_file")
        .write.mode("overwrite")
        .partitionBy("target_file")
        .parquet(out)
    )
    back = read_back(spark, out, assigned.schema)
    # count_distinct over the bare key would SKIP the NULL-ship-date
    # partition; wrapping it in a struct makes NULL a countable value
    # (a struct whose field is null is itself non-null)
    return back.groupBy("target_file").agg(
        F.count_distinct(F.struct("part_key")).alias("n_partitions"),
        F.count("*").alias("n_rows"),
    )


@query(
    "etl_write_audit_publish",
    oracle="""
    WITH agg AS (
        SELECT o_orderstatus,
               count(*)::BIGINT AS n_orders,
               sum(TRY_CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
        FROM orders GROUP BY o_orderstatus
    )
    SELECT 'staged_groups' AS check_name,
           count(*)::BIGINT AS metric, true AS passed
    FROM agg
    UNION ALL
    SELECT 'staged_rows', sum(n_orders)::BIGINT, true FROM agg
    UNION ALL
    SELECT 'staged_cents', sum(cents)::BIGINT, true FROM agg
    UNION ALL
    SELECT 'published', 1::BIGINT, true
    """,
)
def etl_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write–audit–publish (WAP): stage a derived table to a staging
    path, AUDIT the staged files by reading them back (never the
    in-memory frame — the on-disk bytes are what consumers will see),
    and only then atomically publish via marker. The returned audit
    report's metrics come exclusively from the STAGED copy; the oracle
    recomputes them from the raw source — so a lossy write path (type
    narrowing, dropped rows, bad partitioning) fails the hash match.

    The publish step is the atomic-rename idiom object stores emulate
    with a manifest: consumers resolve the published marker, never a
    half-written directory. Audit cost is a scan of the (small)
    derived table, not the source."""
    from pymapreduce_spark.functions.checked import cents as cents_col
    from pymapreduce_spark.io import stable_scratch

    orders = load_table(spark, sf_dir, "orders")
    derived = orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents_col("o_totalprice")).alias("cents"),
    )
    base = stable_scratch(sf_dir, "wap")
    staging = os.path.join(base, "_staging")
    derived.write.mode("overwrite").parquet(staging)

    # audit the on-disk copy (schema-explicit: an empty staged write has
    # no footers to infer from, and an empty audit must FAIL, not crash)
    staged = read_back(spark, staging, derived.schema)
    audit = staged.agg(
        F.count("*").alias("groups"),
        F.coalesce(F.sum("n_orders"), F.lit(0)).alias("rows"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"),
    ).first()
    passed = audit["groups"] > 0 and audit["rows"] > 0

    published = os.path.join(base, "published")
    if passed:  # atomic publish: rename, then marker
        os.rename(staging, published)
        with open(os.path.join(published, "_PUBLISHED"), "w") as fh:
            fh.write("ok")
    rows = [
        ("staged_groups", int(audit["groups"]), bool(passed)),
        ("staged_rows", int(audit["rows"]), bool(passed)),
        ("staged_cents", int(audit["cents"]), bool(passed)),
        (
            "published",
            1 if os.path.exists(os.path.join(published, "_PUBLISHED"))
            else 0,
            bool(passed),
        ),
    ]
    return spark.createDataFrame(
        rows, "check_name string, metric long, passed boolean"
    )


@query(
    "etl_scd1_current",
    oracle="""
    WITH cur AS (
        SELECT o_custkey,
               max(struct_pack(d := o_orderdate, k := o_orderkey,
                               p := o_orderpriority)) AS c,
               count(*)::BIGINT AS n_history_rows
        FROM orders
        GROUP BY o_custkey
    )
    SELECT o_custkey,
           c.p AS current_priority,
           c.d AS as_of_date,
           n_history_rows
    FROM cur
    """,
)
def etl_scd1_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 SCD: the current-state dimension — each customer's
    LATEST order priority, overwriting history (etl_scd2 keeps it;
    etl_scd2_lookup reads it as-of; this is the overwrite variant most
    dimensions actually use). The survivor is picked with ONE
    partial-aggregable max(struct(date, key, value)) — no window, no
    sort — so the current-state build is a single map-side-combined
    shuffle at any history depth. Tie-broken by order key, explicit in
    both engines."""
    orders = load_table(spark, sf_dir, "orders")
    latest = F.max(
        F.struct(
            F.col("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("p"),
        )
    )
    return (
        orders.groupBy("o_custkey")
        .agg(
            latest.alias("cur"),
            F.count("*").alias("n_history_rows"),
        )
        .select(
            "o_custkey",
            F.col("cur").getField("p").alias("current_priority"),
            F.col("cur").getField("d").alias("as_of_date"),
            "n_history_rows",
        )
    )


@query(
    "etl_rowcount_drift",
    oracle="""
    WITH d AS (
        SELECT (ts::TIMESTAMP)::DATE AS day, count(*)::BIGINT AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    )
    SELECT day, n,
           lag(n) OVER (ORDER BY day)::BIGINT AS prev_n,
           (n * 10 < lag(n) OVER (ORDER BY day) * 8
            OR n * 10 > lag(n) OVER (ORDER BY day) * 12) AS drift_alert
    FROM d
    """,
)
def etl_rowcount_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume drift monitor: daily row counts vs the previous
    day, alerting outside a ±20% band — the cheapest data-ops canary
    (a stuck upstream shows up here before any content check fires).
    The band test is exact-integer (n·10 vs prev·8 / prev·12), no
    float thresholds; the window runs over the per-day summary, one
    row per day at any volume. First day alerts NULL (no baseline),
    honest rather than defaulted. NULL event times are excluded (the
    null-ts doctrine: a row with no day would sort FIRST in Spark's
    lag window and LAST in DuckDB's, shifting every baseline pair —
    route un-timestamped rows with etl_dq_rules instead)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("day")
    prev = F.lag("n").over(w)
    return d.select(
        "day",
        "n",
        prev.alias("prev_n"),
        (
            (F.col("n") * 10 < prev * 8)
            | (F.col("n") * 10 > prev * 12)
        ).alias("drift_alert"),
    )


@query(
    "etl_late_data_quarantine",
    oracle="""
    WITH b AS (
        SELECT max(ts::TIMESTAMP) AS mx FROM events
    )
    SELECT CASE WHEN epoch_us(b.mx) - epoch_us(e.ts::TIMESTAMP)
                     > 7 * 86400 * 1000000::BIGINT
                THEN 'quarantine' ELSE 'accept' END AS route,
           count(*)::BIGINT AS n_events,
           min(e.ts::TIMESTAMP) AS oldest,
           max(e.ts::TIMESTAMP) AS newest
    FROM events e, b
    GROUP BY route
    """,
)
def etl_late_data_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data routing: events older than 7 days relative to the
    batch's high-water mark go to quarantine instead of the live
    table — the batch-side cousin of the streaming watermark (same
    horizon policy, applied at ingest). The high-water mark is an
    aggregate-then-broadcast scalar; the route predicate is exact
    integer microseconds; per-route counts and time bounds give the
    ops report. At 100 TB the quarantine route feeds a
    reconcile-and-replay job rather than silently polluting
    partitions that were already compacted and published."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.max("ts").alias("mx"))
    late = (
        epoch_micros(F.col("mx")) - epoch_micros(F.col("ts"))
    ) > 7 * 86400 * 1_000_000
    route = F.when(late, "quarantine").otherwise("accept")
    return (
        ev.crossJoin(F.broadcast(b))
        .groupBy(route.alias("route"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("oldest"),
            F.max("ts").alias("newest"),
        )
    )
