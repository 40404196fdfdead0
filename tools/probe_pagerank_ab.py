"""r14 VERDICT #5 A/B: pagerank iteration half — per-step eager
localCheckpoint (r13 shape, arm A) vs one lazy 5-step unroll on the
static node table (r14 shape, arm B). Both arms share one freshly
built checkpointed edge table per round, so only the iteration cost
differs; arms alternate within each round so host drift hits both.

    python tools/probe_pagerank_ab.py [--rounds 3]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rounds = 3
    args = sys.argv[1:]
    if args and args[0] == "--rounds":
        rounds = int(args[1])
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from pymapreduce_spark.operators.graph import _edge_partitions
    from pymapreduce_spark.operators.llm_vector import llm_knn_self_join
    from pymapreduce_spark.session import get_spark

    spark = get_spark(app_name="probe-pagerank-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def build_edges():
        return (
            llm_knn_self_join(spark, SF_DIR)
            .where(F.col("nn_rank") == 1)
            .select(
                F.col("query_id").alias("src"),
                F.col("neighbor_id").alias("dst"),
            )
            .repartition(_edge_partitions(SF_DIR))
            .localCheckpoint(eager=True)
        )

    def arm_a(nn1):  # r13: eager checkpoint per step
        ranks = nn1.select(F.col("src").alias("node")).withColumn(
            "s", F.lit(1).cast("long")
        )
        for t in range(5):
            inc = (
                nn1.join(ranks, nn1.src == ranks.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("s").alias("m"))
            )
            ranks = (
                ranks.select("node")
                .join(inc, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(3 * 20**t) + 17 * F.coalesce("m", F.lit(0))
                    ).alias("s"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks.select("node", F.col("s").alias("pr_scaled"))

    def arm_b(nn1):  # r14: one lazy unroll on the static node set
        nodes = nn1.select(F.col("src").alias("node"))
        ranks = nodes.withColumn("s", F.lit(1).cast("long"))
        for t in range(5):
            inc = (
                nn1.join(ranks, nn1.src == ranks.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("s").alias("m"))
            )
            ranks = nodes.join(inc, "node", "left").select(
                "node",
                (F.lit(3 * 20**t) + 17 * F.coalesce("m", F.lit(0))).alias(
                    "s"
                ),
            )
        return ranks.select("node", F.col("s").alias("pr_scaled"))

    # warm-up + output-identity check (sorted rows must match exactly)
    nn1 = build_edges()
    rows_a = sorted(map(tuple, arm_a(nn1).collect()))
    rows_b = sorted(map(tuple, arm_b(nn1).collect()))
    assert rows_a == rows_b, "arm outputs diverge"
    print(f"identical outputs: {len(rows_a)} rows", flush=True)

    samples: dict[str, list[float]] = {"iter_ckpt": [], "iter_lazy": []}
    for r in range(rounds):
        nn1 = build_edges()
        for key, arm in (("iter_ckpt", arm_a), ("iter_lazy", arm_b)):
            spark.sparkContext.setJobDescription(f"pr-ab:{key}:r{r}")
            t0 = time.perf_counter()
            arm(nn1).toArrow()
            samples[key].append(round(time.perf_counter() - t0, 4))
        print(json.dumps({k: v[-1] for k, v in samples.items()}), flush=True)
    med = {k: round(statistics.median(v), 4) for k, v in samples.items()}
    med["speedup"] = round(med["iter_ckpt"] / med["iter_lazy"], 3)
    print("MEDIANS " + json.dumps(med), flush=True)


if __name__ == "__main__":
    main()
