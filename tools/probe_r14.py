"""r14 measurement-only probes (VERDICT items 5, 7, 8).

--graph    : pagerank / connected_components cost breakdown — time the
             kNN edge build alone vs the full ops (noop sink, guide
             §1.4), so the "edge build vs per-round floor" split is a
             committed number, not a guess.
--sketch   : agg_sketch_quantiles arms — the KLL approx core alone vs
             the full op (approx + exact-median arm + join), so the
             second scan's real cost is measured before deciding
             whether a one-scan rewrite is worth changing the op's
             mergeable-sketch mechanic.
--bloomplan: the eager Bloom BUILD side's own plan (it executes via
             .collect() before the main query exists, so no committed
             plan captured it) — proves whether its orders scan is
             column-pruned.

Usage: python tools/probe_r14.py [--graph] [--sketch] [--bloomplan] [--reps N]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, build, reps) -> list[float]:
    spark.sparkContext.setJobDescription(f"r14probe:{label}:warmup")
    noop(build())
    runs = []
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"r14probe:{label}:run{r}")
        t0 = time.perf_counter()
        noop(build())
        runs.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(f"{label}: med={statistics.median(runs)} runs={runs}", flush=True)
    return runs


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    from pymapreduce_spark import registry
    from pymapreduce_spark.session import get_spark

    spark = get_spark(app_name="r14-probe")
    spark.sparkContext.setLogLevel("ERROR")
    Q = registry.QUERIES

    if "--graph" in args:
        # edge build = the kNN op the graph family consumes
        timed(spark, "knn_edge_build", lambda: Q["llm_knn_self_join"](spark, SF_DIR), reps)
        timed(spark, "graph_pagerank_full", lambda: Q["graph_pagerank"](spark, SF_DIR), reps)
        timed(spark, "graph_components_full", lambda: Q["graph_components"](spark, SF_DIR), reps)

    if "--sketch" in args:
        from pymapreduce_spark.operators.aggregates import _kll_p50_approx

        timed(spark, "kll_approx_core", lambda: _kll_p50_approx(spark, SF_DIR), reps)
        timed(spark, "sketch_quantiles_full", lambda: Q["agg_sketch_quantiles"](spark, SF_DIR), reps)
        # the exact arm alone (the second scan + median agg)
        from pymapreduce_spark.io import load_table
        from pymapreduce_spark.operators.aggregates import finite
        from pyspark.sql import functions as F

        def exact_arm():
            li = load_table(spark, SF_DIR, "lineitem")
            return li.groupBy("l_returnflag").agg(
                F.round(F.median(finite("l_extendedprice")), 4).alias("m")
            )

        timed(spark, "sketch_exact_arm", exact_arm, reps)

    if "--bloomplan" in args:
        from pyspark.sql import functions as F

        from pymapreduce_spark.io import load_table

        n_bits = 64 * 1024
        k = 3
        orders = load_table(spark, SF_DIR, "orders")
        dim = orders.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        ).select("o_orderkey")
        positions = [
            F.pmod(F.xxhash64(F.col("o_orderkey"), F.lit(i)), F.lit(n_bits))
            for i in range(k)
        ]
        words = (
            dim.select(F.explode(F.array(*positions)).alias("pos"))
            .groupBy(F.floor(F.col("pos") / 64).cast("int").alias("word"))
            .agg(
                F.bit_or(
                    F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))")
                ).alias("bits")
            )
        )
        plan = words._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out = os.path.join(REPO, "plans", "r14", "join_bloom_buildside.txt")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as fh:
            fh.write(plan)
        print("wrote", out, flush=True)
        for line in plan.splitlines():
            if "ReadSchema" in line or "PushedFilters" in line:
                print(line, flush=True)


if __name__ == "__main__":
    main()
