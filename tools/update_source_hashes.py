"""Maintain SOURCE_HASHES.json — the change-aware driver-rotation input.

Round-9 verdict, task 1: the driver's resample rotation was purely
oldest-round-first, so an operator heavily rewritten in round N could
keep riding a pre-rewrite green row for several rounds (llm_knn_self_join
rode an r5 row across the r9 tile rewrite). The fix needs to know, for
every registry name, whether the source of the implementing function
still matches what the driver last attested green — and if not, how
recently it was rewritten (a fresh rewrite is the riskiest unattested
code; a round-old docstring touch is not).

This tool writes that attestation snapshot. For each driver round R it
checks out the code the driver verified (the PARENT of the driver's
``round R: verdict/...`` artifact commit — the artifact lands on top of
the final round-R code) into a temporary ``git worktree``, imports the
registry there in a subprocess, and records
``sha256(inspect.getsource(fn))`` per name. The snapshot then stores,
per name::

    {
      "round":          # latest CORRECTNESS round with a row for it
      "hash":           # fn source hash at that round (what was attested)
      "latest_round":   # newest artifact round overall
      "latest_hash":    # fn source hash at that newest round
      "modified_round": # last round whose verified tree CHANGED the fn
                        # (first appearance counts as a modification)
    }

ordering.py compares ``hash`` against the live registry: a mismatch
means "the driver has never seen this code" and promotes the name into
the changed-source bucket, ranked most-recently-modified first (live
edits newer than ``latest_hash`` rank newest of all).

Incremental: per-round extractions are cached in the snapshot's
``_rounds`` section, so after the bootstrap each new driver round costs
one worktree extraction. Run after each driver round, before editing:

    python tools/update_source_hashes.py
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pymapreduce_spark import ordering  # noqa: E402

HASHES_PATH = os.path.join(REPO, "SOURCE_HASHES.json")

#: Subprocess payload: import the (historical) registry and print
#: name -> sha256 of the implementing function's source. Runs with cwd
#: and sys.path[0] at the worktree root so the historical package wins
#: over the live one.
_EXTRACT = r"""
import hashlib, inspect, json, sys, warnings
warnings.simplefilter("ignore")
sys.path.insert(0, sys.argv[1])
import pymapreduce_spark  # registers + reorders; harmless here
from pymapreduce_spark import registry
out = {}
for name, fn in registry.QUERIES.items():
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        continue
    out[name] = hashlib.sha256(src.encode("utf-8")).hexdigest()
print(json.dumps(out))
"""


def current_hashes(registered: dict) -> dict[str, str | None]:
    """sha256 of each registered callable's source in THIS process.
    Delegates to ordering.source_hash so the stored-vs-current compare
    is hash-vs-hash of the same extraction."""
    return {name: ordering.source_hash(fn) for name, fn in registered.items()}


def _artifact_commits() -> dict[int, str]:
    """round -> sha of the driver's ``round N: verdict/...`` commit."""
    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    out: dict[int, str] = {}
    for line in log.splitlines():
        m = re.match(r"([0-9a-f]{40}) round (\d+): verdict", line)
        if m:
            out.setdefault(int(m.group(2)), m.group(1))
    return out


def _hashes_at_round(rnd: int, commit: str) -> dict[str, str]:
    """Extract name->hash from the code the driver verified in ``rnd``
    (the parent of that round's artifact commit) via a throwaway
    worktree."""
    ref = f"{commit}^"
    with tempfile.TemporaryDirectory(prefix=f"srchash_r{rnd}_") as tmp:
        wt = os.path.join(tmp, "wt")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, ref],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _EXTRACT, wt],
                cwd=wt,
                capture_output=True,
                text=True,
                timeout=600,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"extraction at round {rnd} ({ref}) failed:\n{proc.stderr[-2000:]}"
                )
            return json.loads(proc.stdout.strip().splitlines()[-1])
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO,
                capture_output=True,
                text=True,
            )


def _modified_round(name: str, rounds: dict[int, dict[str, str]]) -> int | None:
    """Last round whose verified tree changed ``name``'s source. First
    appearance counts as a modification (a debut is unattested-new code
    until its first green row)."""
    last: int | None = None
    prev: str | None = None
    for rnd in sorted(rounds):
        h = rounds[rnd].get(name)
        if h is None:
            continue
        if prev is None or h != prev:
            last = rnd
        prev = h
    return last


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rebuild", action="store_true", help="re-extract every round"
    )
    args = ap.parse_args()

    latest = ordering.latest_driver_rows()
    if not latest:
        print("no CORRECTNESS artifacts; nothing to snapshot")
        return 0

    stored: dict = {}
    if not args.rebuild and os.path.exists(HASHES_PATH):
        with open(HASHES_PATH) as fh:
            stored = json.load(fh)
    cached_rounds: dict[int, dict[str, str]] = {
        int(r): hs for r, hs in stored.get("_rounds", {}).items()
    }

    commits = _artifact_commits()
    # Extract every artifact round ≥ the oldest latest-row round that is
    # not already cached (rounds older than any attestation can't affect
    # the changed-bucket ranking).
    min_round = min(rnd for rnd, _ in latest.values())
    rounds: dict[int, dict[str, str]] = dict(cached_rounds)
    for rnd in sorted(r for r in commits if r >= min_round):
        if rnd in rounds:
            continue
        print(f"extracting round {rnd} ({commits[rnd][:9]}^) ...", flush=True)
        rounds[rnd] = _hashes_at_round(rnd, commits[rnd])
    newest = max(rounds)

    entries: dict[str, dict] = {}
    for name, (rnd, _row) in sorted(latest.items()):
        entries[name] = {
            "round": rnd,
            "hash": rounds.get(rnd, {}).get(name),
            "latest_round": newest,
            "latest_hash": rounds[newest].get(name),
            "modified_round": _modified_round(name, rounds),
        }

    out = {"_rounds": {str(r): rounds[r] for r in sorted(rounds)}}
    out.update(entries)
    with open(HASHES_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n_null = sum(1 for v in entries.values() if v["hash"] is None)
    print(f"wrote {len(entries)} entries ({n_null} hashless) -> {HASHES_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
