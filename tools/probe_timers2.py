"""Dump full progress JSON for one stateful_timers run at sf0.1."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from pymapreduce_spark.session import get_spark
from pymapreduce_spark.registry import QUERIES
from pymapreduce_spark.streaming import core as stream_core
spark = get_spark()
sf = os.environ["SPARK_GRAFT_SF_DIR"]
spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
QUERIES["stream_stateful_timers"](spark, sf).count()  # warm
t0 = time.perf_counter()
QUERIES["stream_stateful_timers"](spark, sf).count()
print("wall", round(time.perf_counter() - t0, 2), flush=True)
for p in stream_core.LAST_QUERY_PROGRESS:
    print(json.dumps({
        "batchId": p.get("batchId"),
        "numInputRows": p.get("numInputRows"),
        "durationMs": p.get("durationMs"),
        "stateOperators": [
            {k: so.get(k) for k in (
                "numRowsTotal", "numRowsUpdated", "allUpdatesTimeMs",
                "commitTimeMs", "allRemovalsTimeMs", "numShufflePartitions",
                "numStateStoreInstances")}
            for so in (p.get("stateOperators") or [])
        ],
    }), flush=True)
