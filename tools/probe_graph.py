"""r14 VERDICT #5 probe: split graph_pagerank / graph_components cost
into (a) the shared 1-NN edge build (llm_knn_self_join → rank-1 filter →
repartition → localCheckpoint) and (b) the iteration half (per-round
joins + checkpoint/convergence jobs).

Interleaved A/B/C rounds (edge build, pagerank, components) so host
drift hits all arms alike. Results print one JSON line per round and a
summary; commit the output in OPTIMIZATION_r14.md.

    python tools/probe_graph.py [--rounds 3]
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

    from pymapreduce_spark import registry
    from pymapreduce_spark.operators.graph import _edge_partitions
    from pymapreduce_spark.session import get_spark

    spark = get_spark(app_name="probe-graph")
    spark.sparkContext.setLogLevel("ERROR")

    def edge_build() -> None:
        nn1 = (
            registry.QUERIES["llm_knn_self_join"](spark, SF_DIR)
            .where(F.col("nn_rank") == 1)
            .select(
                F.col("query_id").alias("src"),
                F.col("neighbor_id").alias("dst"),
            )
            .repartition(_edge_partitions(SF_DIR))
            .localCheckpoint(eager=True)
        )
        nn1.unpersist()

    def full(name: str) -> None:
        registry.QUERIES[name](spark, SF_DIR).toArrow()

    arms = {
        "edge_build": edge_build,
        "pagerank": lambda: full("graph_pagerank"),
        "components": lambda: full("graph_components"),
    }
    # warm-up every arm once (codegen, file listing)
    for fn in arms.values():
        fn()
    samples: dict[str, list[float]] = {k: [] for k in arms}
    for r in range(rounds):
        for k, fn in arms.items():
            spark.sparkContext.setJobDescription(f"probe-graph:{k}:r{r}")
            t0 = time.perf_counter()
            fn()
            samples[k].append(round(time.perf_counter() - t0, 4))
        print(json.dumps({k: v[-1] for k, v in samples.items()}), flush=True)
    med = {k: round(statistics.median(v), 4) for k, v in samples.items()}
    med["edge_share_pagerank"] = round(med["edge_build"] / med["pagerank"], 3)
    med["edge_share_components"] = round(
        med["edge_build"] / med["components"], 3
    )
    print("MEDIANS " + json.dumps(med), flush=True)


if __name__ == "__main__":
    main()
