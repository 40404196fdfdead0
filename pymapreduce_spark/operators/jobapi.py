"""Oracle-checked demonstrations of the MapReduceJob facade
(pymapreduce_spark/api.py) — proof the reference's programming model
runs end-to-end on this engine with byte-identical results.

These intentionally use the *Python* hooks (the slow-but-faithful MR
surface); every one has a declarative twin elsewhere in the registry
(mr_wordcount, mr_reduce) showing the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.api import MapReduceJob
from pymapreduce_spark.registry import query


@query(
    "api_wordcount",
    oracle="""
    SELECT word, count(*) AS cnt FROM (
        SELECT unnest(str_split(text, ' ')) AS word FROM documents
    ) GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def api_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical wordcount written AS a MapReduce program against the
    facade: flat_map mapper → reduce_by_key reducer → top-k."""
    job = (
        MapReduceJob.from_table(spark, sf_dir, "documents")
        .select_expr("text")
        .flat_map(
            lambda row: ({"word": w} for w in row["text"].split(" ")),
            schema="word string",
        )
        .reduce_by_key(
            ["word"],
            lambda key, rows: {"word": key[0], "cnt": len(rows)},
            schema="word string, cnt long",
        )
    )
    return job.to_df().orderBy(F.desc("cnt"), "word").limit(20)


@query(
    "api_pipeline",
    oracle="""
    SELECT user_id,
           count(*) AS n_purchases,
           sum(round(value * 100)::BIGINT) AS total_cents
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def api_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A chained map→filter→reduce job: Python filter + mapper feeding a
    Python reducer, one DAG, no inter-job materialization."""
    job = (
        MapReduceJob.from_table(spark, sf_dir, "events")
        .filter(lambda row: row["event_type"] == "purchase")
        .map(
            lambda row: {
                "user_id": row["user_id"],
                "cents": int(round(row["value"] * 100)),
            },
            schema="user_id long, cents long",
        )
        .reduce_by_key(
            ["user_id"],
            lambda key, rows: {
                "user_id": key[0],
                "n_purchases": len(rows),
                "total_cents": int(rows["cents"].sum()),
            },
            schema="user_id long, n_purchases long, total_cents long",
        )
    )
    return job.to_df()
