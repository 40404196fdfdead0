"""r14 VERDICT #5 probe: phase breakdown of graph_components'
iteration half — sym checkpoint, labels init, and per-round
(propagation+jump checkpoint job vs convergence-sum job) — plus the
materialized round count at this SF (stats channel).

    python tools/probe_cc_phases.py [--rounds 3]
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
    reps = 3
    args = sys.argv[1:]
    if args and args[0] == "--rounds":
        reps = int(args[1])
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from pymapreduce_spark.operators.graph import _edge_partitions
    from pymapreduce_spark.operators.llm_vector import llm_knn_self_join
    from pymapreduce_spark.session import get_spark

    spark = get_spark(app_name="probe-cc-phases")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(phases, key, fn):
        t0 = time.perf_counter()
        out = fn()
        phases[key] = phases.get(key, 0.0) + time.perf_counter() - t0
        return out

    def run() -> dict:
        phases: dict[str, float] = {}
        edges = timed(
            phases,
            "edge_build",
            lambda: (
                llm_knn_self_join(spark, SF_DIR)
                .where(F.col("nn_rank") == 1)
                .select(
                    F.col("query_id").alias("src"),
                    F.col("neighbor_id").alias("dst"),
                )
            ),
        )
        sym = edges.union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        ).repartition(_edge_partitions(SF_DIR))
        sym = timed(
            phases, "sym_ckpt", lambda: sym.localCheckpoint(eager=True)
        )
        labels = timed(
            phases,
            "labels_init",
            lambda: (
                sym.select(F.col("src").alias("node"))
                .distinct()
                .withColumn("label", F.col("node"))
                .localCheckpoint(eager=True)
            ),
        )
        prev_sum = None
        rounds = 0
        while True:
            rounds += 1
            stepped = labels
            for _prop in range(3):
                nbr_min = (
                    sym.join(stepped, sym.dst == stepped.node)
                    .groupBy(F.col("src").alias("node"))
                    .agg(F.min("label").alias("nbr_label"))
                )
                stepped = stepped.join(nbr_min, "node", "left").select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce("nbr_label", F.col("label")),
                    ).alias("label"),
                )
            parents = stepped.select(
                F.col("node").alias("p_node"),
                F.col("label").alias("p_label"),
            )
            jumped = timed(
                phases,
                "round_ckpt",
                lambda s=stepped, p=parents: (
                    s.join(p, s.label == F.col("p_node"))
                    .select("node", F.col("p_label").alias("label"))
                    .localCheckpoint(eager=True)
                ),
            )
            cur_sum = timed(
                phases,
                "round_sum",
                lambda j=jumped: j.agg(
                    F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
                ).first()["s"],
            )
            labels = jumped
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        phases["rounds"] = rounds
        return phases

    run()  # warm-up
    allp: list[dict] = []
    for _ in range(reps):
        p = {k: round(v, 4) for k, v in run().items()}
        allp.append(p)
        print(json.dumps(p), flush=True)
    keys = sorted({k for p in allp for k in p})
    med = {
        k: round(statistics.median([p.get(k, 0.0) for p in allp]), 4)
        for k in keys
    }
    print("MEDIANS " + json.dumps(med), flush=True)


if __name__ == "__main__":
    main()
