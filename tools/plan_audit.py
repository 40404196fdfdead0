"""Physical-plan audit over every registered query.

Plans (never executes) all ``__spark_entry__.queries()`` entries at the
given SF and flags the shapes that break at 100 TB:

- ``cartesian``      CartesianProduct — an unbroadcast cross product.
- ``bnlj``           BroadcastNestedLoopJoin — fine when the build side
                     is a scalar/tiny aggregate or a row-count-gated
                     baseline; a hazard when it isn't. Review each.
- ``global-window``  A window function whose spec has NO partition
                     keys — Spark funnels the whole input relation
                     through one task. Fine over bounded summaries
                     (per-day/per-partition rollups); fatal over
                     data-sized relations. Round-5 catch: vocab_coverage
                     and query_doc_match ranked data-sized relations to
                     read a top-k — both rewritten to orderBy+limit
                     (TakeOrderedAndProject).
- ``py-udf-row``     BatchEvalPython — a row-at-a-time Python UDF in
                     the plan (only the udf_python/udtf_python
                     conformance ops may carry this).
- high ``exchanges`` not a defect by itself (iterative algorithms and
                     multi-table audits shuffle often) but the first
                     place to look when a query is slow.

Run:  python tools/plan_audit.py [sf_dir]
Exits non-zero only on planning errors; flag review is a human step —
the per-op rationale lives in the operator docstrings.
"""

from __future__ import annotations

import re
import sys
import time


def audit(sf_dir: str = "/root/testdata/sf0.01") -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    queries = entry.queries()
    explain_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    t0 = time.time()
    errors = 0
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                explain_mode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"{name}\tERR\t{str(exc)[:100]}")
            errors += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("bnlj")
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            if re.match(
                r"^\s*[^,]+ (ASC|DESC) NULLS (FIRST|LAST)", m.group(1)
            ):
                flags.append("global-window")
                break
        if "BatchEvalPython" in plan:
            flags.append("py-udf-row")
        n_exchanges = plan.count("Exchange")
        if flags or n_exchanges >= 8:
            print(f"{name}\t{','.join(flags) or '-'}\texchanges={n_exchanges}")
    print(
        f"# planned {len(queries)} queries in {time.time() - t0:.0f}s, "
        f"{errors} errors",
        file=sys.stderr,
    )
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(audit(*sys.argv[1:]))
