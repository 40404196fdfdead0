"""Driver-facing registry order: fix-ups first, then fresh coverage.

The verification driver samples the registry in iteration order when it
builds its correctness artifact (first 50 names), so the ordering below
decides which operators get driver correctness rows each round. Window
composition, in order:

1. **Re-checks** — names whose *latest* row in any past
   ``CORRECTNESS_r*.json`` is not hash-green and that could plausibly go
   green now (they register an oracle, or their last run errored). A
   fixed operator is not "done" until the driver re-confirms it.
2. **Resample quota** — a small, deterministic rotation of
   already-green names (oldest driver row first), so a regression in a
   previously-verified operator is eventually re-detected rather than
   being pushed out of the window permanently.
3. **Fresh** — names with no driver row yet, in curated priority order
   (sections of SURVEY.md §2 with no driver evidence first), then
   registration order.
4. The remaining already-green names, in registration order.

With no artifacts on disk (fresh clone) buckets 1/2/4 are empty and the
order is exactly the curated-then-registration order — deterministic in
every environment.
"""

from __future__ import annotations

import glob
import json
import os
import re
import warnings

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: How many already-green names to re-sample per round (bucket 2).
RESAMPLE_QUOTA = 4

#: Curated head of the fresh bucket for round 4+: §2-J streaming (the
#: only §2 section with zero driver rows after round 3), then the
#: adapted TPC-H suite (the most realistic multi-operator workloads),
#: then time-series / graph / ETL.
PRIORITY: tuple[str, ...] = (
    # J. Structured Streaming
    "stream_source",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark",
    "stream_dedup",
    "stream_join_static",
    "stream_join_stream",
    "stream_sink_foreachbatch",
    "stream_stateful",
    "stream_join",
    "stream_sink",
    # Adapted TPC-H (q1/q3 already have driver rows)
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipping_priority_class",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity",
    "q18_large_volume",
    "q19_discounted_revenue",
    "q20_dominant_supplier",
    "q21_suppliers_kept_waiting",
    "q22_sales_opportunity",
    # Time-series
    "ts_gapfill",
    "ts_forward_fill",
    "ts_resample_ohlc",
    "ts_ewma",
    # Graph
    "graph_components",
    "graph_pagerank",
    "graph_degrees",
    # ETL / CDC
    "etl_scd2",
    "etl_snapshot_diff",
)


def latest_driver_rows() -> dict[str, tuple[int, dict]]:
    """Map each driver-checked name to ``(round, row)`` of its most
    recent CORRECTNESS_r*.json row. Malformed artifacts are skipped."""
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:  # pragma: no cover - malformed artifact
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, row)
    return latest


def driver_checked_names() -> set[str]:
    """Names with a row in any past CORRECTNESS_r*.json artifact."""
    return set(latest_driver_rows())


def _needs_recheck(row: dict, has_oracle: bool) -> bool:
    """True when the name's latest driver row is not hash-green and a
    re-run could plausibly improve it: it has an oracle registered now
    (hash could go green), or its last run errored (crash fixes need a
    clean re-run even for rows-only ops)."""
    if row.get("hash_match") is True:
        return False
    err = row.get("err")
    if err == "no_oracle" and not has_oracle:
        return False  # rows-only by design; a re-run changes nothing
    return True


def ordered_names(registered: dict, oracles: dict | None = None) -> list[str]:
    """Order ``registered`` keys per the module docstring. ``oracles``
    (name -> SQL) decides whether a non-green row is worth re-checking;
    omitted means assume every name has an oracle."""
    unknown = [n for n in PRIORITY if n not in registered]
    if unknown:  # renamed/removed operators must not break import
        warnings.warn(
            f"ordering.PRIORITY references unknown queries (skipped): {unknown}",
            stacklevel=2,
        )
    priority = [n for n in PRIORITY if n in registered]
    curated = priority + [n for n in registered if n not in set(priority)]

    latest = latest_driver_rows()
    rechecks = [
        n
        for n in curated
        if n in latest
        and _needs_recheck(latest[n][1], oracles is None or n in oracles)
    ]
    green = [
        n for n in curated if n in latest and n not in set(rechecks)
    ]
    # Oldest driver row first; name tie-break keeps it deterministic.
    resample = sorted(green, key=lambda n: (latest[n][0], n))[:RESAMPLE_QUOTA]
    fresh = [n for n in curated if n not in latest]
    rest = [n for n in green if n not in set(resample)]
    return rechecks + resample + fresh + rest
