"""Driver-facing registry order: fix-ups first, then fresh coverage.

The verification driver samples the registry in iteration order when it
builds its correctness artifact (first 50 names), so the ordering below
decides which operators get driver correctness rows each round. Window
composition, in order:

1. **Re-checks** — names whose *latest* row in any past
   ``CORRECTNESS_r*.json`` is not hash-green and that could plausibly go
   green now (they register an oracle, or their last run errored). A
   fixed operator is not "done" until the driver re-confirms it.
2. **Changed-source greens** (round-9 verdict, task 1) — names whose
   implementing function's source no longer matches what the driver
   last attested green (per the committed ``SOURCE_HASHES.json``
   snapshot; see tools/update_source_hashes.py). A green row proves the
   code the driver RAN, not the code in the tree — a rewrite invalidates
   the attestation. Ranked by an interleave of the two risk factors:
   recency of the rewrite (a round-9 rewrite is riskier than a round-5
   docstring touch) and staleness of the attestation (an r3 row has had
   the most rounds to drift). Capped at ``CHANGED_QUOTA`` so one big
   refactor round cannot evict the resample/fresh buckets from the
   driver's 50-name window; the overflow leads bucket 5.
3. **Resample quota** — a small, deterministic rotation of
   already-green UNchanged names (oldest driver row first), so a
   regression in a previously-verified operator is eventually
   re-detected rather than being pushed out of the window permanently.
4. **Fresh** — names with no driver row yet, in curated priority order
   (sections of SURVEY.md §2 with no driver evidence first), then
   registration order.
5. The remaining already-green names, three sub-tiers (round-11
   verdict task 1): FIRST any unchanged name whose attestation is at
   least ``STALE_FLOOR_LAG`` rounds behind the upcoming round (the
   resample quota alone can never reach a deep staleness backlog —
   the four r4-era keys sat unsampled for seven rounds), oldest row
   first; THEN the changed-bucket overflow (in its interleaved risk
   order); then the other unchanged names oldest driver row first
   (name tie-break) — so post-backlog windows always re-verify the
   riskiest part of the green set rather than the same
   registration-order heads.

The changed quota is DYNAMIC (round-11 verdict task 1): at least
``CHANGED_QUOTA`` and as much more as needed to keep the post-round
changed-residual at ``RESIDUAL_TARGET`` or below, capped so the
resample/stale/fresh buckets keep a minimum share of the 50-name
window even in a heavy-refactor round.

With no artifacts on disk (fresh clone) buckets 1/2/3/5 are empty and
the order is exactly the curated-then-registration order —
deterministic in every environment. With artifacts but no
``SOURCE_HASHES.json`` snapshot, bucket 2 is empty and the order
degrades to the pure-staleness rotation of rounds ≤9.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import warnings

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SOURCE_HASHES_PATH = os.path.join(_REPO_ROOT, "SOURCE_HASHES.json")

#: How many changed-source greens lead the window (bucket 2), at
#: minimum. 34 keeps the full judge window (50) holding changed +
#: resample (8) + a handful of fresh debuts even in a heavy-refactor
#: round.
CHANGED_QUOTA = 34

#: The changed-backlog residual the window must drive toward: when more
#: than CHANGED_QUOTA + RESIDUAL_TARGET greens carry unattested source,
#: the quota grows (up to _CHANGED_QUOTA_CAP) so at most
#: RESIDUAL_TARGET changed names are left outside the 50-name window
#: (round-11 verdict task 1: "post-round residual backlog <= 20").
RESIDUAL_TARGET = 20
_CHANGED_QUOTA_CAP = 40

#: Bucket-5 staleness floor: an UNCHANGED green whose latest driver row
#: is this many rounds (or more) behind the upcoming round outranks the
#: changed overflow — the 8-name resample quota alone can never reach a
#: deep staleness backlog (the r4-era keys went seven rounds without a
#: row while overflow monopolized the tail slots).
STALE_FLOOR_LAG = 7


def _changed_quota(total_changed: int) -> int:
    return min(
        _CHANGED_QUOTA_CAP,
        max(CHANGED_QUOTA, total_changed - RESIDUAL_TARGET),
    )


def _next_round() -> int:
    """The round the upcoming driver run will stamp: one past the
    newest artifact on disk."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1

#: How many already-green names to re-sample per round (bucket 3).
#: While the fresh backlog dominates (first five rounds) the quota stays
#: small so new operators get driver rows quickly; once five rounds of
#: artifacts exist the quota doubles so regressions in the large green
#: set are re-detected sooner (round-4 verdict, task 6).
RESAMPLE_QUOTA = 4
_RESAMPLE_QUOTA_LATE = 8
_LATE_ROUND_ARTIFACTS = 5


def _resample_quota() -> int:
    n_artifacts = len(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")))
    return _RESAMPLE_QUOTA_LATE if n_artifacts >= _LATE_ROUND_ARTIFACTS else RESAMPLE_QUOTA

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
    # Round 5+: the LLM curation core — the operators a training-data
    # user hits first (round-4 verdict, task 1). Ranking/scoring, the
    # quality-gate chain, then the full dedup taxonomy and the
    # tokenize->chunk->pack->shard training-prep chain.
    "llm_bm25",
    "llm_semdedup",
    "llm_decontaminate",
    "llm_gopher_quality",
    "llm_repetition_filter",
    "llm_quality_classifier",
    "llm_curation_pipeline",
    "llm_dedup_ngram",
    "llm_dedup_embed",
    "llm_dedup_substring",
    "llm_dedup_editdist",
    "llm_prefix_dedup",
    "llm_dedup_incremental",
    "llm_knn_self_join",
    "llm_token_count",
    "llm_chunk_documents",
    "llm_pack_sequences",
    "llm_shard_assign",
    "llm_train_test_split",
    "llm_split_leakage",
    "llm_lsh_diagnostics",
    # ETL / CDC suite (the rest of etl.py) + CDC streaming
    "etl_fk_integrity",
    "etl_data_profile",
    "etl_dq_rules",
    "etl_skew_report",
    "etl_compact_plan",
    "etl_scd2_lookup",
    "etl_compact_execute",
    "etl_write_audit_publish",
    "etl_scd1_current",
    "etl_rowcount_drift",
    "etl_late_data_quarantine",
    "stream_cdc_apply",
    # Dual-engine SQL front-end + the MapReduce job API
    "sql_frontend",
    "sql_subquery",
    "api_wordcount",
    "api_pipeline",
    "api_reduce_side_join",
    "api_map_side_join",
    "api_secondary_sort",
    "api_counters",
    "api_multi_output",
    "mr_total_order_sort",
    # Remaining sources / streaming
    "scan_merge_schema",
    "scan_jsonl_nested",
    "stream_progress_audit",
    "stream_unified_api",
    # Remaining LLM corpus analytics / embedding ops
    "llm_pii_mask",
    "llm_fingerprint",
    "llm_lang_id",
    "llm_corpus_stats",
    "llm_inverted_index",
    "llm_topk_ngrams",
    "llm_unigram_logprob",
    "llm_bigram_lm",
    "llm_domain_mix",
    "llm_mix_rebalance",
    "llm_batch_inference",
    "llm_embed_quantize",
    "llm_embed_centroid",
    "llm_cluster_topics",
    "llm_embedding_norm_audit",
    "llm_multimodal_decode",
    "llm_frame_sample",
    "llm_audio_features",
    "llm_sim_search_ivf",
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


def source_hash(fn) -> str | None:
    """sha256 of the implementing callable's source, or None when the
    source is unavailable (builtins, test stand-ins). Must stay in sync
    with the extraction in tools/update_source_hashes.py (which imports
    this function) — the changed-source compare is hash-vs-hash."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return None
    return hashlib.sha256(src.encode("utf-8")).hexdigest()


def load_snapshot() -> dict:
    """The committed attestation snapshot (SOURCE_HASHES.json), mapping
    name -> {round, hash, latest_round, latest_hash, modified_round}.
    Missing/malformed snapshot -> {} (bucket 2 degrades to empty)."""
    try:
        with open(_SOURCE_HASHES_PATH) as fh:
            snap = json.load(fh)
    except Exception:
        return {}
    if not isinstance(snap, dict):
        return {}
    return {k: v for k, v in snap.items() if k != "_rounds" and isinstance(v, dict)}


def _changed_risk_order(changed: list[tuple[str, int, int]]) -> list[str]:
    """Interleave the two re-verification risk streams over ``changed``
    (name, attested_round, modified_round) triples:

    - **recency**: most recently modified first (a live/r9 rewrite is
      the least-attested code in the tree), stale attestation tie-break;
    - **staleness**: oldest attestation first (most rounds of drift),
      recent modification tie-break.

    Round-robin merge, dedup keeping first position — so a name at the
    top of EITHER risk axis lands near the head, and the quota cut
    never starves one axis (round-9 verdict task 1 needs both the
    r9-rewritten vector ops AND the r3-era udf keys in one window)."""
    recency = sorted(changed, key=lambda t: (-t[2], t[1], t[0]))
    staleness = sorted(changed, key=lambda t: (t[1], -t[2], t[0]))
    merged: list[str] = []
    seen: set[str] = set()
    for a, b in zip(recency, staleness):
        for name, _r, _m in (a, b):
            if name not in seen:
                seen.add(name)
                merged.append(name)
    return merged


def changed_since_attested(
    registered: dict,
    latest: dict[str, tuple[int, dict]],
    snapshot: dict | None = None,
    current: dict[str, str | None] | None = None,
) -> list[tuple[str, int, int]]:
    """(name, attested_round, modified_round) for every green-attested
    name whose implementing source differs from the snapshot's attested
    hash. ``current`` (name -> hash) is injectable for tests; by default
    it is computed from the registered callables. Live edits newer than
    the snapshot's newest extracted round rank as modified in
    ``latest_round + 1``."""
    snap = load_snapshot() if snapshot is None else snapshot
    if not snap:
        return []
    out: list[tuple[str, int, int]] = []
    for name, (rnd, _row) in latest.items():
        ent = snap.get(name)
        if not isinstance(ent, dict):
            continue
        attested = ent.get("hash")
        if not attested:
            continue
        cur = (
            current.get(name)
            if current is not None
            else source_hash(registered.get(name))
        )
        if not cur or cur == attested:
            continue
        modified = ent.get("modified_round") or rnd
        if ent.get("latest_hash") and cur != ent["latest_hash"]:
            modified = (ent.get("latest_round") or modified) + 1
        out.append((name, rnd, modified))
    return out


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


def ordered_names(
    registered: dict,
    oracles: dict | None = None,
    snapshot: dict | None = None,
    current: dict[str, str | None] | None = None,
) -> list[str]:
    """Order ``registered`` keys per the module docstring. ``oracles``
    (name -> SQL) decides whether a non-green row is worth re-checking;
    omitted means assume every name has an oracle. ``snapshot`` /
    ``current`` override the attestation snapshot and live source
    hashes (tests); by default they come from SOURCE_HASHES.json and
    ``inspect.getsource`` over the registered callables."""
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
    # Bucket 2: greens whose source the driver never attested, in
    # interleaved risk order, quota-capped (overflow leads bucket 5).
    changed_all = _changed_risk_order(
        changed_since_attested(
            {n: registered.get(n) for n in green},
            {n: latest[n] for n in green},
            snapshot=snapshot,
            current=current,
        )
    )
    quota = _changed_quota(len(changed_all))
    changed = changed_all[:quota]
    changed_overflow = changed_all[quota:]
    unchanged = [n for n in green if n not in set(changed_all)]
    # Bucket 3: oldest driver row first; name tie-break keeps it
    # deterministic. Unchanged names only — a changed name is already
    # ranked by bucket 2 and must not double-burn a window slot.
    resample = sorted(unchanged, key=lambda n: (latest[n][0], n))[
        : _resample_quota()
    ]
    fresh = [n for n in curated if n not in latest]
    # Oracle-less names NEVER outrank oracled ones in the fresh bucket:
    # the artifact record (r1–r6) shows the driver has no working
    # rows-only path — every oracle-less name it ever windowed came
    # back `err: no_oracle`, burning the slot. Stable partition, so the
    # curated order is preserved within each half.
    if oracles is not None:
        fresh = [n for n in fresh if n in oracles] + [
            n for n in fresh if n not in oracles
        ]
    # Bucket 5 (round-7 verdict task 2, round-9 task 1, round-11
    # task 1): deeply-stale unchanged greens first (attestations the
    # 8-name resample can never reach — rows STALE_FLOOR_LAG+ rounds
    # behind the upcoming round), then the changed-bucket overflow
    # (still the riskiest unattested code), then the other unchanged
    # greens by oldest-driver-row — so once the fresh backlog is empty
    # the window always re-verifies the riskiest greens rather than
    # the same registration-order heads.
    floor = _next_round() - STALE_FLOOR_LAG
    tail = sorted(
        (n for n in unchanged if n not in set(resample)),
        key=lambda n: (latest[n][0], n),
    )
    stale_tail = [n for n in tail if latest[n][0] <= floor]
    rest = (
        stale_tail
        + changed_overflow
        + [n for n in tail if n not in set(stale_tail)]
    )
    return rechecks + changed + resample + fresh + rest
