"""Unit tests for the driver-window ordering (pymapreduce_spark/ordering.py).

The external driver samples the first 50 registry names for its
correctness artifact, so this ordering IS the round's verification
plan: rechecks first, then a small resample of already-green names,
then never-checked names in curated priority order.
"""

from __future__ import annotations

import warnings

import pytest

from pymapreduce_spark import ordering


def fake_latest(rows):
    """rows: name -> (round, row-dict)."""
    return dict(rows)


@pytest.fixture
def patched(monkeypatch):
    def _patch(rows):
        monkeypatch.setattr(
            ordering, "latest_driver_rows", lambda: fake_latest(rows)
        )

    return _patch


GREEN = {"hash_match": True, "err": None}
FAIL = {"hash_match": False, "err": None}
ERR = {"hash_match": None, "err": "boom"}
NO_ORACLE = {"hash_match": None, "err": "no_oracle"}


def test_rechecks_lead_the_window(patched):
    registered = {n: None for n in ["a", "b", "c", "d"]}
    patched({"a": (1, GREEN), "b": (1, FAIL), "c": (2, ERR)})
    order = ordering.ordered_names(registered, oracles=registered)
    assert order[:2] == ["b", "c"]  # non-green driver rows first
    assert "d" in order  # fresh follows
    assert order.index("d") < order.index("a") or order.index("a") < 3


def test_rows_only_by_design_not_rechecked(patched):
    registered = {"x": None, "y": None}
    patched({"x": (1, NO_ORACLE)})
    # x has NO oracle registered → its no_oracle row is by design, not
    # a recheck candidate.
    order = ordering.ordered_names(registered, oracles={"y": "SELECT 1"})
    assert order[0] == "x" or order[0] == "y"
    # but with an oracle now registered, it becomes a recheck
    order2 = ordering.ordered_names(registered, oracles={"x": "SELECT 1"})
    assert order2[0] == "x"


def test_resample_rotates_oldest_green(patched):
    registered = {n: None for n in "abcdefg"}
    patched({n: (i + 1, GREEN) for i, n in enumerate("abcdef")})
    order = ordering.ordered_names(registered, oracles=registered)
    # quota of the OLDEST green rows resampled ahead of the rest
    quota = min(ordering._resample_quota(), 6)
    assert order[:quota] == list("abcdef")[:quota]
    if quota < 6:
        assert order[quota] == "g"  # fresh name right after the resample


def test_resample_quota_rises_after_backlog_rounds(monkeypatch):
    """Quota stays small while fresh names dominate (few artifacts),
    then doubles once five rounds of driver evidence exist."""
    import glob as _glob

    def fake_glob(n):
        return lambda pat: [f"CORRECTNESS_r{i:02d}.json" for i in range(1, n + 1)]

    monkeypatch.setattr(ordering.glob, "glob", fake_glob(4))
    assert ordering._resample_quota() == ordering.RESAMPLE_QUOTA
    monkeypatch.setattr(ordering.glob, "glob", fake_glob(5))
    assert ordering._resample_quota() == ordering._RESAMPLE_QUOTA_LATE


def test_deterministic_without_artifacts(patched):
    registered = {n: None for n in ["z", "q2_min_cost_supplier", "m"]}
    patched({})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        order = ordering.ordered_names(registered, oracles=registered)
    # curated PRIORITY member first, then registration order
    assert order[0] == "q2_min_cost_supplier"
    assert order[1:] == ["z", "m"]


def test_unknown_priority_name_warns_not_raises(patched):
    patched({})
    registered = {"only_this": None}
    with pytest.warns(UserWarning, match="unknown queries"):
        order = ordering.ordered_names(registered, oracles=registered)
    assert order == ["only_this"]


def test_oracle_less_fresh_names_never_outrank_oracled(patched):
    """The driver has no working rows-only path (every oracle-less name
    it ever windowed burned its slot as `err: no_oracle`, r1–r6), so an
    oracle-less fresh name must sort after EVERY oracled fresh name —
    it cannot consume a window slot while oracled work awaits proof."""
    registered = {n: None for n in ["rows_only_op", "a", "b", "c"]}
    patched({})
    oracles = {"a": "SELECT 1", "b": "SELECT 1", "c": "SELECT 1"}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        order = ordering.ordered_names(registered, oracles=oracles)
    assert order.index("rows_only_op") > max(
        order.index(n) for n in ("a", "b", "c")
    )


def test_rest_bucket_rotates_by_staleness(patched):
    """Bucket 4 (greens beyond the resample quota) sorts oldest driver
    row first, so once the fresh backlog clears the window always holds
    the stalest greens: no windowed green may have a strictly newer
    latest-row than an unwindowed one (round-7 verdict, task 2)."""
    registered = {f"g{i:02d}": None for i in range(20)}
    # rounds descend with registration order: g00 newest, g19 oldest
    patched({n: (20 - i, GREEN) for i, n in enumerate(sorted(registered))})
    order = ordering.ordered_names(registered, oracles=registered)
    quota = ordering._resample_quota()
    rest = order[quota:]
    rounds = [20 - int(n[1:]) for n in rest]
    assert rounds == sorted(rounds), "rest bucket not oldest-first"
    # simulate a post-backlog driver window: any cut of the order must
    # leave no unwindowed name staler than a windowed bucket-4 name
    window, outside = set(order[:10]), order[10:]
    oldest_outside = min(20 - int(n[1:]) for n in outside)
    assert all(
        (20 - int(n[1:])) <= oldest_outside for n in rest if n in window
    )


def test_real_registry_post_backlog_window_is_stalest_first():
    """On the actual registry + artifacts: among UNCHANGED greens
    beyond the resample quota (bucket 5's staleness tail), every
    windowed one must be at least as stale as every unwindowed one.
    Changed-source greens are excluded — they rank by the bucket-2
    risk interleave, not by staleness alone (round-9 verdict, task 1)."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    order = ordering.ordered_names(qs, os_)
    latest = ordering.latest_driver_rows()
    quota = ordering._resample_quota()
    greens = [
        n
        for n in order
        if n in latest and not ordering._needs_recheck(latest[n][1], n in os_)
    ]
    changed = {
        n
        for n, _r, _m in ordering.changed_since_attested(
            {n: qs[n] for n in greens}, {n: latest[n] for n in greens}
        )
    }
    unchanged = [n for n in greens if n not in changed]
    tail = unchanged[quota:]  # bucket 5's staleness tail, window order
    window = set(order[:50])
    in_w = [latest[n][0] for n in tail if n in window]
    out_w = [latest[n][0] for n in tail if n not in window]
    if in_w and out_w:
        assert max(in_w) <= min(out_w), (
            "a windowed unchanged green is fresher than an unwindowed one"
        )


def test_changed_source_greens_lead_and_interleave(patched):
    """Round-9 verdict task 1: greens whose source no longer matches
    the attested hash outrank unchanged greens, ranked by an interleave
    of rewrite-recency and attestation-staleness — so BOTH a freshly
    rewritten r5 op and a long-stale r3 op land at the bucket head."""
    registered = {n: None for n in ["rewritten", "stale3", "touched", "calm"]}
    patched(
        {
            "rewritten": (5, GREEN),  # rewritten in r9 — riskiest
            "stale3": (3, GREEN),  # touched r6, stalest attestation
            "touched": (6, GREEN),  # touched r7
            "calm": (3, GREEN),  # unchanged since attestation
        }
    )
    snapshot = {
        "rewritten": {"round": 5, "hash": "old", "latest_round": 9,
                      "latest_hash": "new", "modified_round": 9},
        "stale3": {"round": 3, "hash": "old", "latest_round": 9,
                   "latest_hash": "new", "modified_round": 6},
        "touched": {"round": 6, "hash": "old", "latest_round": 9,
                    "latest_hash": "new", "modified_round": 7},
        "calm": {"round": 3, "hash": "same", "latest_round": 9,
                 "latest_hash": "same", "modified_round": 2},
    }
    current = {"rewritten": "new", "stale3": "new", "touched": "new",
               "calm": "same"}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        order = ordering.ordered_names(
            registered, oracles=registered, snapshot=snapshot, current=current
        )
    # interleave: recency stream head (rewritten, M9) then staleness
    # stream head (stale3, r3), then the rest; unchanged 'calm' follows
    # in the resample bucket.
    assert order[:2] == ["rewritten", "stale3"]
    assert order[2] == "touched"
    assert order[3] == "calm"


def test_live_edits_rank_newest_in_changed_bucket(patched):
    """A source hash matching NEITHER the attested nor the newest
    extracted round is an in-flight edit — modified_round is treated as
    latest_round+1, so it outranks every historical rewrite."""
    registered = {"edited_now": None, "rewritten_r9": None}
    patched({"edited_now": (8, GREEN), "rewritten_r9": (4, GREEN)})
    snapshot = {
        "edited_now": {"round": 8, "hash": "a8", "latest_round": 9,
                       "latest_hash": "a9", "modified_round": 9},
        "rewritten_r9": {"round": 4, "hash": "b4", "latest_round": 9,
                         "latest_hash": "b9", "modified_round": 9},
    }
    current = {"edited_now": "a10-live", "rewritten_r9": "b9"}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        order = ordering.ordered_names(
            registered, oracles=registered, snapshot=snapshot, current=current
        )
    assert order[0] == "edited_now"


def test_unchanged_debuts_do_not_outrank_changed_greens(patched):
    """Round-9 verdict task 8: a fresh debut with one green row and
    UNCHANGED source must not deprioritize rewritten older ops — the
    changed bucket leads, the debut waits in the staleness tail."""
    registered = {"debut_r9": None, "vector_rewrite": None, "old_calm": None}
    patched(
        {
            "debut_r9": (9, GREEN),
            "vector_rewrite": (5, GREEN),
            "old_calm": (3, GREEN),
        }
    )
    snapshot = {
        "debut_r9": {"round": 9, "hash": "d", "latest_round": 9,
                     "latest_hash": "d", "modified_round": 9},
        "vector_rewrite": {"round": 5, "hash": "v5", "latest_round": 9,
                           "latest_hash": "v9", "modified_round": 9},
        "old_calm": {"round": 3, "hash": "c", "latest_round": 9,
                     "latest_hash": "c", "modified_round": 1},
    }
    current = {"debut_r9": "d", "vector_rewrite": "v9", "old_calm": "c"}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        order = ordering.ordered_names(
            registered, oracles=registered, snapshot=snapshot, current=current
        )
    assert order[0] == "vector_rewrite"  # changed bucket leads
    # unchanged names rotate by staleness: old_calm (r3) before the
    # r9 debut, which is the freshest green in the registry.
    assert order[1:] == ["old_calm", "debut_r9"]


def test_changed_quota_overflow_leads_rest_bucket(patched):
    """Changed names beyond the quota are not demoted to pure
    staleness — they lead bucket 5 ahead of every unchanged green
    that is NOT past the staleness floor (r12: deeply-stale unchanged
    names now outrank overflow; none exist in this fixture — the only
    unchanged name is consumed by the resample quota)."""
    n_changed = ordering.CHANGED_QUOTA + 2
    changed_names = [f"c{i:02d}" for i in range(n_changed)]
    registered = {n: None for n in changed_names + ["calm_old"]}
    patched(
        {
            **{n: (5, GREEN) for n in changed_names},
            "calm_old": (3, GREEN),
        }
    )
    snapshot = {
        n: {"round": 5, "hash": "old", "latest_round": 9,
            "latest_hash": "new", "modified_round": 7}
        for n in changed_names
    }
    snapshot["calm_old"] = {"round": 3, "hash": "k", "latest_round": 9,
                            "latest_hash": "k", "modified_round": 1}
    current = {n: "new" for n in changed_names}
    current["calm_old"] = "k"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        order = ordering.ordered_names(
            registered, oracles=registered, snapshot=snapshot, current=current
        )
    head = order[: ordering.CHANGED_QUOTA]
    assert set(head) <= set(changed_names)
    # resample (unchanged stalest) right after the capped changed bucket
    assert order[ordering.CHANGED_QUOTA] == "calm_old"
    # overflow follows, ahead of nothing unchanged (calm_old was the
    # only unchanged name and it is consumed by the resample quota)
    assert set(order[ordering.CHANGED_QUOTA + 1 :]) == set(
        changed_names
    ) - set(head)


def test_r10_artifact_delivered_r9_task1_keys():
    """Chronicle (round-10 verdict, task 1): the round-9 verdict demanded
    fresh driver rows for the rewritten vector ops, the r4 minhash pair,
    and the 12 r3-era win_*/udf_* keys; the round-10 driver window
    delivered them. Asserted against the PINNED, immutable
    CORRECTNESS_r10.json artifact — never against live registry order,
    which correctly rotates satisfied keys OUT of the next window (the
    previous form of this test expired the moment it succeeded).
    Convention (CLAUDE.md): round-scoped window assertions must pin
    their artifact inputs."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r10.json")
    with open(path) as fh:
        rows = json.load(fh)
    required = {
        "llm_knn_self_join", "llm_dedup_embed", "llm_sim_search_ann",
        "llm_dedup_fuzzy", "llm_minhash_sig",
        "win_ranking", "win_lag_lead", "win_running", "win_range_frame",
        "win_first_last_nth", "topk_per_group",
        "udf_python", "udf_pandas_scalar", "udaf_pandas_agg",
        "udf_grouped_map", "udf_map_partitions", "udtf_python",
    }
    missing = required - set(rows)
    assert not missing, f"r9-task-1 keys missing from the r10 artifact: {missing}"
    not_green = {
        n for n in required
        if not (rows[n].get("rows_match") and rows[n].get("schema_match")
                and rows[n].get("hash_match"))
    }
    assert not not_green, f"r9-task-1 keys not green in the r10 artifact: {not_green}"


def test_registry_has_no_oracle_less_queries():
    """Every registered query carries a DuckDB oracle. The only driver
    evidence an oracle-less query can ever produce is a burned
    `err: no_oracle` slot — registering one is a defect, full stop.
    (If a future op is GENUINELY not SQL-expressible, give it a
    self-evidencing summary oracle like llm_sim_search_ivf's recall
    frame instead of exempting it here.)"""
    import __spark_entry__ as e

    missing = [n for n in e.queries() if n not in e.oracle_sql()]
    assert not missing, f"oracle-less queries registered: {missing}"


def test_registry_window_is_driver_shaped():
    """The real registry's first 50 names must contain every known
    non-green driver row (rechecks cannot be pushed out of the window
    by fresh names)."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    latest = ordering.latest_driver_rows()
    window = set(list(qs)[:50])
    missed = [
        n
        for n, (_, row) in latest.items()
        if n in qs
        and ordering._needs_recheck(row, n in os_)
        and n not in window
    ]
    assert not missed, f"rechecks outside the driver window: {missed}"


def test_dynamic_changed_quota_pins_residual(patched, monkeypatch):
    """Round-11 verdict task 1: when the changed backlog exceeds
    CHANGED_QUOTA + RESIDUAL_TARGET, the quota grows so at most
    RESIDUAL_TARGET changed names are left outside the 50-name window
    — capped so the other buckets keep a minimum share."""
    from pymapreduce_spark.ordering import (
        CHANGED_QUOTA,
        RESIDUAL_TARGET,
        _CHANGED_QUOTA_CAP,
        _changed_quota,
    )

    # below the threshold: base quota
    assert _changed_quota(10) == CHANGED_QUOTA
    assert _changed_quota(CHANGED_QUOTA + RESIDUAL_TARGET) == CHANGED_QUOTA
    # above: quota = total - target, residual pinned at the target
    total = CHANGED_QUOTA + RESIDUAL_TARGET + 2
    assert total - _changed_quota(total) == RESIDUAL_TARGET
    # capped: a massive refactor round cannot evict every other bucket
    assert _changed_quota(500) == _CHANGED_QUOTA_CAP

    # end-to-end: 56 changed greens -> exactly RESIDUAL_TARGET outside
    # the window once resample/stale slots are accounted for
    changed_names = [f"c{i:02d}" for i in range(56)]
    registered = {n: None for n in changed_names}
    patched({n: (7, GREEN) for n in changed_names})
    snapshot = {
        n: {"round": 7, "hash": "old", "latest_round": 11,
            "latest_hash": "new", "modified_round": 9}
        for n in changed_names
    }
    current = {n: "new" for n in changed_names}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        order = ordering.ordered_names(
            registered, oracles=registered, snapshot=snapshot,
            current=current,
        )
    in_window = set(order[:50])
    residual = [n for n in changed_names if n not in in_window]
    # all 50 window slots hold changed names here (nothing unchanged
    # exists), so the residual is exactly total - 50; the quota rule
    # guarantees at least quota of them lead the window
    assert order[: _changed_quota(56)] == [
        n for n in order[: _changed_quota(56)]
    ]
    assert len(residual) == 6


def test_stale_floor_outranks_changed_overflow(patched, monkeypatch):
    """Round-11 verdict task 1: an unchanged green whose attestation is
    STALE_FLOOR_LAG+ rounds behind the upcoming round leads bucket 5
    ahead of the changed overflow — the r4-era keys must not sit
    unsampled behind an endless overflow stream again."""
    import glob as _glob

    # 11 artifacts on disk -> upcoming round 12 -> floor at r5
    monkeypatch.setattr(
        ordering.glob,
        "glob",
        lambda pat: [f"CORRECTNESS_r{i:02d}.json" for i in range(1, 12)],
    )
    quota = ordering._changed_quota(0)  # base quota for sizing
    n_changed = quota + 3  # 3 overflow names
    changed_names = [f"c{i:02d}" for i in range(n_changed)]
    # resample quota (8) eats the 8 stalest unchanged; add 9 so ONE
    # deeply-stale unchanged name (r4 row) must land in bucket 5
    unchanged_old = [f"u{i}" for i in range(9)]
    fresh_green = ["fresh_green"]  # r11 row: NOT past the floor
    registered = {
        n: None for n in changed_names + unchanged_old + fresh_green
    }
    patched(
        {
            **{n: (7, GREEN) for n in changed_names},
            **{n: (4, GREEN) for n in unchanged_old},
            "fresh_green": (11, GREEN),
        }
    )
    snapshot = {
        **{
            n: {"round": 7, "hash": "old", "latest_round": 11,
                "latest_hash": "new", "modified_round": 9}
            for n in changed_names
        },
        **{
            n: {"round": 4, "hash": "k", "latest_round": 11,
                "latest_hash": "k", "modified_round": 1}
            for n in unchanged_old
        },
        "fresh_green": {"round": 11, "hash": "f", "latest_round": 11,
                        "latest_hash": "f", "modified_round": 11},
    }
    current = {n: "new" for n in changed_names}
    current.update({n: "k" for n in unchanged_old})
    current["fresh_green"] = "f"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        order = ordering.ordered_names(
            registered, oracles=registered, snapshot=snapshot,
            current=current,
        )
    # bucket layout: changed[quota] + resample(8 of the r4 names) +
    # bucket 5 = [9th r4 name] + overflow + fresh_green
    resample_n = ordering._resample_quota()
    b5 = order[quota + resample_n:]
    ninth_old = [n for n in unchanged_old if n in b5]
    assert len(ninth_old) == 1
    overflow = [n for n in changed_names if n in b5]
    assert b5.index(ninth_old[0]) < min(b5.index(n) for n in overflow), (
        "deeply-stale unchanged name did not outrank the overflow"
    )
    # but a FRESH unchanged green (not past the floor) stays behind it
    assert b5.index("fresh_green") > max(b5.index(n) for n in overflow)
