"""Optimization probe (r13; plan dir now env-selectable): isolate per-query compute cost and plans.

For each named registry op (default: the bench HEADLINE + NEW_KEYS set):

- captures ``explain("formatted")`` to ``plans/$SPARK_GRAFT_PLAN_DIR/<op>_<tag>.txt`` (default r14)
- times the computation through the noop sink (guide §1.4) — one
  warm-up, then median of N — so the sink/fetch cost is excluded and
  the number isolates scan→shuffle→compute
- labels each job (``setJobDescription``) per guide §1.5

This is a MEASUREMENT tool only; bench.py (the driver artifact, frozen
protocol: Arrow fetch) is untouched. Usage:

    python tools/perf_probe.py --tag before [op ...]
    python tools/perf_probe.py --tag after --runs 5 op1 op2
"""

from __future__ import annotations

import json
import re
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    tag = "probe"
    runs = 3
    plans_only = False
    ops: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--tag" and i + 1 < len(args):
            tag = args[i + 1]
            i += 2
        elif args[i] == "--runs" and i + 1 < len(args):
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--plans-only":
            plans_only = True
            i += 1
        else:
            ops.append(args[i])
            i += 1

    sys.path.insert(0, REPO)
    import bench
    from pymapreduce_spark import registry
    from pymapreduce_spark.session import get_spark

    if not ops:
        ops = sorted(
            set(bench.HEADLINE.values())
            | set(bench.NEW_KEYS.values())
            | {op for op, _ in bench.ARCHIVE.values()}
        )

    spark = get_spark(app_name=f"perf-probe-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    plan_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"))
    os.makedirs(plan_dir, exist_ok=True)

    explain_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in ops:
        fn = registry.QUERIES[name]
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                explain_mode.fromString("formatted")
            )
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
            if plans_only:
                out[name] = {"exchanges": len(re.findall(r"\bExchange\b", plan))}
                continue
            spark.sparkContext.setJobDescription(f"{tag}:{name}:warmup")
            noop(fn(spark, SF_DIR))
            samples = []
            for r in range(runs):
                spark.sparkContext.setJobDescription(f"{tag}:{name}:run{r}")
                t0 = time.perf_counter()
                noop(fn(spark, SF_DIR))
                samples.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
            out[name] = {
                "noop_med": round(statistics.median(samples), 4),
                "noop_min": round(min(samples), 4),
                "noop_max": round(max(samples), 4),
                "exchanges": len(re.findall(r"\bExchange\b", plan)),
            }
        except Exception as exc:  # noqa: BLE001 — keep probing the rest
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(f"{name}\t{json.dumps(out[name])}", flush=True)

    with open(os.path.join(plan_dir, f"PROBE_{tag}.json"), "w") as fh:
        json.dump({"sf_dir": SF_DIR, "runs": runs, "results": out}, fh, indent=1)


if __name__ == "__main__":
    main()
