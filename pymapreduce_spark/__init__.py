"""pymapreduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine covering the capabilities of the
Rossil2012/pyMapReduce reference (a Python MapReduce batch framework; see
SURVEY.md §0 — the reference tree was empty at survey time, so the semantic
contract is the MapReduce computational model plus the driver's mandated
operator inventory in SURVEY.md §2).

Design: every operator is declared with the DataFrame/SQL API so Catalyst
owns optimization (pushdown, pruning, broadcast, AQE). No custom Catalyst
rules, no RDD operator paths. Python UDFs only where built-ins genuinely
can't express the semantics — and then always Arrow-batched.

Importing this package populates the operator registry
(`pymapreduce_spark.registry.QUERIES` / `.ORACLES`) that
``__spark_entry__.py`` exposes to the verification driver.
"""

from pymapreduce_spark import registry  # noqa: F401
from pymapreduce_spark.session import get_spark, ensure_runtime_configs  # noqa: F401
from pymapreduce_spark.io import load_table, TABLES  # noqa: F401

# Import operator modules for their registration side effects.
from pymapreduce_spark.operators import (  # noqa: F401
    mapreduce,
    projection,
    joins,
    aggregates,
    windows,
    sortlimit,
    setops,
    events,
    udfs,
    llm_text,
    llm_vector,
    multimodal,
    jobapi,
    scale,
    tpch,
    tpch2,
    graph,
    etl,
)
from pymapreduce_spark.api import MapReduceJob  # noqa: F401
from pymapreduce_spark.sources import scans  # noqa: F401
from pymapreduce_spark.functions import scalar  # noqa: F401
from pymapreduce_spark.streaming import core as streaming_core  # noqa: F401
from pymapreduce_spark import sqlfront  # noqa: F401

# With every operator registered, rebuild the registry in the
# driver-facing verification order (re-checks of non-green driver rows,
# a small resample of green rows, then never-checked names; see
# pymapreduce_spark.ordering). Both access paths — __spark_entry__ and
# direct registry readers — then agree on iteration order.
from pymapreduce_spark import ordering as _ordering  # noqa: E402

registry.reorder(_ordering.ordered_names(registry.QUERIES, registry.ORACLES))

__all__ = [
    "registry",
    "get_spark",
    "ensure_runtime_configs",
    "load_table",
    "TABLES",
]
