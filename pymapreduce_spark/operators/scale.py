"""Scale-technique operators: the shuffle-management patterns a 100 TB
deployment leans on, demonstrated as oracle-checked queries.

- Salted two-phase aggregation: THE mitigation for skewed group keys.
  The fixture's 5 event types are exactly the hot-key shape (100 k rows,
  5 keys → every row funnels to 5 reducers). Salting fans each hot key
  across 16 sub-keys for the heavy partial phase; the final phase
  aggregates 5×16 tiny partials.
- Bucketed co-located join: pre-bucketing both fact tables on the join
  key removes the per-query shuffle entirely — the table layout IS the
  exchange, amortized over every future join. The plan test asserts the
  join runs with zero hash exchanges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.functions.checked import cents
from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query

_ARTIFACTS = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".artifacts")
_BUCKETED_READY: set[tuple[int, str]] = set()


@query(
    "agg_salted_twophase",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           sum(round(value * 100)::BIGINT) / 100.0 AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation over 5 hot keys: phase 1 groups on
    (key, salt=event_id % 16) so the heavy partial aggregation spreads
    over 80 reducers; phase 2 merges 80 tiny partials. Result is
    identical to the direct groupBy (the oracle) — only the shuffle
    distribution changes. (AQE's skew handling covers joins; salting is
    the aggregation-side counterpart and composes with it.)"""
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("n_part"),
            F.sum(cents("value")).alias("cents_part"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("n_part").alias("n_events"),
        (F.sum("cents_part") / 100.0).alias("total_value"),
    )


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Create (once per session+sf) bucketed copies of orders/lineitem,
    bucketed AND sorted by the join key, stored under .artifacts."""
    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    t_orders = f"orders_bucketed_{sf_tag}"
    t_lineitem = f"lineitem_bucketed_{sf_tag}"
    key = (id(spark), sf_tag)
    if key in _BUCKETED_READY:
        return t_orders, t_lineitem
    base = os.path.join(_ARTIFACTS, sf_tag)
    for tbl, src, col in (
        (t_orders, "orders", "o_orderkey"),
        (t_lineitem, "lineitem", "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load_table(spark, sf_dir, src)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", os.path.join(base, tbl))
            .bucketBy(8, col)
            .sortBy(col)
            .saveAsTable(tbl)
        )
    _BUCKETED_READY.add(key)
    return t_orders, t_lineitem


@query(
    "join_bucketed",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_items,
           sum(round(l_extendedprice * 100)::BIGINT
               * (100 - round(l_discount * 100)::BIGINT)) / 10000.0
               AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact–fact join with ZERO per-query shuffle: both tables are
    bucketed (8 buckets) and sorted on the join key, so the sort-merge
    join reads co-located buckets directly — the layout amortizes the
    exchange across every future join on that key. This is the batch
    analogue of co-partitioned 100 TB fact tables. The `merge` hint
    keeps Catalyst from broadcasting the (locally small) orders side so
    the bucketing actually demonstrates."""
    t_orders, t_lineitem = _ensure_bucketed(spark, sf_dir)
    orders = spark.table(t_orders).hint("merge")
    lineitem = spark.table(t_lineitem)
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
                / 10000.0
            ).alias("revenue"),
        )
    )
