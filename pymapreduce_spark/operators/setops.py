"""Set operations & row dedup (SURVEY.md §2-H).

Set ops shuffle on the full row; Catalyst plans union as a no-shuffle
concatenation and distinct/intersect/except as hash aggregates / joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.functions.checked import trunc_ntz
from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


def _split_events(spark: SparkSession, sf_dir: str):
    """Two overlapping projections of events used by the set ops: users
    seen clicking vs users seen purchasing, as (user_id, day) rows."""
    ev = load_table(spark, sf_dir, "events")
    day = trunc_ntz("day", F.col("ts")).alias("day")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", day)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", day
    )
    return clicks, purchases


_ORACLE_CTES = """
    WITH c AS (
        SELECT user_id, date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day
        FROM events WHERE event_type = 'purchase'
    )
"""


@query(
    "set_union_all",
    oracle=_ORACLE_CTES
    + """
    SELECT user_id, day, count(*) AS n FROM (
        SELECT * FROM c UNION ALL SELECT * FROM p
    ) GROUP BY user_id, day
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (unionByName keeps duplicates); grouped so the
    duplicate multiplicity is hash-visible."""
    clicks, purchases = _split_events(spark, sf_dir)
    return (
        clicks.unionByName(purchases)
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n"))
    )


@query(
    "set_union_distinct",
    oracle=_ORACLE_CTES
    + """
    SELECT user_id, day FROM c UNION SELECT user_id, day FROM p
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union = bag union + distinct."""
    clicks, purchases = _split_events(spark, sf_dir)
    return clicks.unionByName(purchases).distinct()


@query(
    "set_intersect",
    oracle=_ORACLE_CTES
    + """
    SELECT user_id, day FROM c INTERSECT SELECT user_id, day FROM p
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): days a user both clicked and purchased."""
    clicks, purchases = _split_events(spark, sf_dir)
    return clicks.intersect(purchases)


@query(
    "set_intersect_all",
    oracle=_ORACLE_CTES
    + """
    SELECT user_id, day FROM c INTERSECT ALL SELECT user_id, day FROM p
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, min multiplicity)."""
    clicks, purchases = _split_events(spark, sf_dir)
    return clicks.intersectAll(purchases)


@query(
    "set_except",
    oracle=_ORACLE_CTES
    + """
    SELECT user_id, day FROM c EXCEPT SELECT user_id, day FROM p
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): click-days with no purchase."""
    clicks, purchases = _split_events(spark, sf_dir)
    return clicks.subtract(purchases)


@query(
    "set_except_all",
    oracle=_ORACLE_CTES
    + """
    SELECT user_id, day FROM c EXCEPT ALL SELECT user_id, day FROM p
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics, multiplicity subtraction)."""
    clicks, purchases = _split_events(spark, sf_dir)
    return clicks.exceptAll(purchases)


@query(
    "dedup_rows",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def dedup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-row removal — deterministic because the surviving
    row IS the key (no hidden payload columns; keyed survivor rules live
    in llm_dedup_exact)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


@query(
    "set_union_evolved_schema",
    oracle="""
    SELECT * FROM (
        SELECT o_orderkey AS id, o_totalprice AS amount,
               NULL::VARCHAR AS channel
        FROM orders WHERE o_orderkey < 100
        UNION ALL BY NAME
        SELECT event_id AS id, value AS amount, event_type AS channel
        FROM events WHERE event_id < 100
    )
    """,
)
def set_union_evolved_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: two sources whose schemas drifted (the
    newer one added a `channel` column) combined with
    unionByName(allowMissingColumns=True) — missing columns fill NULL,
    matching is by NAME not position. This is the ingest reality of a
    long-lived 100 TB table: every schema version keeps unioning
    cleanly instead of forcing a backfill. DuckDB's UNION ALL BY NAME
    is the oracle spelling of the same semantics."""
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    old = orders.where(F.col("o_orderkey") < 100).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
    )
    new = ev.where(F.col("event_id") < 100).select(
        F.col("event_id").alias("id"),
        F.col("value").alias("amount"),
        F.col("event_type").alias("channel"),
    )
    return old.unionByName(new, allowMissingColumns=True)
