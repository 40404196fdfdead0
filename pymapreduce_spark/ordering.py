"""Driver-facing registry order: never-driver-checked queries first.

The verification driver samples the registry in iteration order when it
builds its correctness artifact, so the ordering below decides which
operators get driver correctness rows each round. Strategy:

1. queries with no row in any past ``CORRECTNESS_r*.json`` come first —
   curated priority order (the llm_* family and the §2 sections that had
   not been checked through round 2), then registration order;
2. already-checked queries follow, keeping their registration order.

Because past artifacts are read at import time, the window advances
itself every round until every registered query has a driver row.
"""

from __future__ import annotations

import glob
import json
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Curated head of the round-3 window (SURVEY.md §2 F–L plus scans and
#: the as-of join — none had a driver correctness row after round 2).
PRIORITY: tuple[str, ...] = (
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
)


def driver_checked_names() -> set[str]:
    """Names with a row in any past CORRECTNESS_r*.json artifact."""
    seen: set[str] = set()
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                seen.update(json.load(fh).keys())
        except Exception:  # pragma: no cover - malformed artifact
            continue
    return seen


def ordered_names(registered: dict) -> list[str]:
    """Order ``registered`` keys: never-checked first (PRIORITY, then
    registration order), already-checked after."""
    missing = [n for n in PRIORITY if n not in registered]
    assert not missing, f"priority list references unknown queries: {missing}"
    seen = driver_checked_names()
    curated = list(PRIORITY) + [
        n for n in registered if n not in set(PRIORITY)
    ]
    fresh = [n for n in curated if n not in seen]
    checked = [n for n in curated if n in seen]
    return fresh + checked
