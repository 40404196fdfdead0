"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All operators live in ``pymapreduce_spark/`` — importing the package
populates the registry (one `queries()` entry per SURVEY.md §2 op key).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pymapreduce_spark  # noqa: E402  (registers all operators)
from pymapreduce_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape) on /root/testdata/sf0.001."""
    from pymapreduce_spark.session import ensure_runtime_configs

    ensure_runtime_configs(spark)
    return registry.QUERIES["q3_shipping_priority"](
        spark, "/root/testdata/sf0.001"
    )


# Verification priority: the driver's correctness artifact samples the
# registry in iteration order, so §2 sections that have not yet received
# a driver correctness row are listed first (round 3: the llm_* pipeline
# family, windows, sort/limit, set ops, scalar functions, scans, UDFs,
# as-of join). Sections already driver-verified in rounds 1-2 (MapReduce
# core, projection, joins, aggregates) follow, still covered by the
# local pytest differential over all 180 oracles.
_PRIORITY = [
    # L. LLM-pipeline family
    "llm_dedup_exact",
    "llm_dedup_fuzzy",
    "llm_minhash_sig",
    "llm_sim_search",
    "llm_sim_search_ann",
    "llm_knn_label",
    "llm_text_stats",
    "llm_lang_filter",
    "llm_quality_filter",
    "llm_tokenize_wordcount",
    "llm_tfidf",
    "llm_multimodal_cols",
    "llm_sessionize",
    "llm_event_funnel",
    # F. Windows
    "win_ranking",
    "win_lag_lead",
    "win_running",
    "win_range_frame",
    "win_first_last_nth",
    "topk_per_group",
    # G. Sort/limit/top-k
    "sort_multikey",
    "limit_n",
    "topk_global",
    # H. Set ops & dedup
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "dedup_rows",
    # I. Scalar functions
    "fn_string",
    "fn_regex",
    "fn_date",
    "fn_math",
    "fn_array",
    "fn_map",
    "fn_json",
    "fn_hash",
    "fn_conditional",
    # B. Scans/sources/sinks
    "scan_parquet",
    "scan_csv",
    "scan_jsonl",
    "scan_text",
    "sink_parquet",
    "source_inline",
    # K. UDF surface
    "udf_python",
    "udf_pandas_scalar",
    "udaf_pandas_agg",
    "udf_grouped_map",
    "udf_map_partitions",
    "udtf_python",
    # D. As-of join
    "join_asof",
]


def _driver_checked_names() -> set[str]:
    """Query names that already have a row in any past driver
    correctness artifact (CORRECTNESS_r*.json in the repo root)."""
    import glob
    import json

    seen: set[str] = set()
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                seen.update(json.load(fh).keys())
        except Exception:  # pragma: no cover - malformed artifact
            continue
    return seen


def _ordered_names() -> list[str]:
    """Registry order for the driver: never-driver-checked queries first
    (curated priority order, then registration order), already-checked
    ones after. Because past rounds' artifacts are read at call time,
    the verification window advances itself every round until every
    query has a driver correctness row."""
    missing = [n for n in _PRIORITY if n not in registry.QUERIES]
    assert not missing, f"priority list references unknown queries: {missing}"
    seen = _driver_checked_names()
    curated = list(_PRIORITY) + [
        n for n in registry.QUERIES if n not in set(_PRIORITY)
    ]
    fresh = [n for n in curated if n not in seen]
    checked = [n for n in curated if n in seen]
    return fresh + checked


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: registry.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ops without an entry get the
    driver's weaker rows-only check (streaming / approximate ops)."""
    return {
        n: registry.ORACLES[n]
        for n in _ordered_names()
        if n in registry.ORACLES
    }
