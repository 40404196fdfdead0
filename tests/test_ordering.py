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
    """On the actual registry + artifacts: among bucket-4 names, every
    windowed one must be at least as stale as every unwindowed one."""
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
    rest = greens[quota:]  # bucket 4 in window order
    window = set(order[:50])
    in_w = [latest[n][0] for n in rest if n in window]
    out_w = [latest[n][0] for n in rest if n not in window]
    if in_w and out_w:
        assert max(in_w) <= min(out_w), (
            "a windowed bucket-4 name is fresher than an unwindowed one"
        )


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
