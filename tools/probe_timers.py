"""Measurement-only probe: run one streaming op at sf0.1, print wall,
trigger count, and per-batch durations from query progress."""
import json, os, sys, time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pymapreduce_spark.session import get_spark
from pymapreduce_spark.registry import QUERIES
from pymapreduce_spark.streaming import core as stream_core

op = sys.argv[1] if len(sys.argv) > 1 else "stream_stateful_timers"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark()
sf = os.environ["SPARK_GRAFT_SF_DIR"]
spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
for r in range(reps):
    t0 = time.perf_counter()
    df = QUERIES[op](spark, sf)
    n = df.count()
    wall = time.perf_counter() - t0
    prog = stream_core.LAST_QUERY_PROGRESS
    durs = [p.get("durationMs", {}) for p in prog]
    tot = [d.get("triggerExecution") for d in durs]
    rows_in = [p.get("numInputRows") for p in prog]
    print(f"rep{r}: wall={wall:.2f}s rows={n} triggers={len(prog)} "
          f"triggerExecMs={tot} inputRows={rows_in}", flush=True)
    for v in spark.catalog.listTables():
        if v.name.startswith("stream_result_"):
            spark.catalog.dropTempView(v.name)
