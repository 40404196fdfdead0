"""Calib-adjusted bench comparison (r14 VERDICT #9 protocol): for every
key in two bench artifacts, report raw speedup AND the speedup
normalized by the calib_sec ratio (the VM-drift probe) — this host
swings ±30-40% run-to-run, so only calib-adjusted deltas (and
structural plan changes) are meaningful.

    python tools/bench_compare.py BENCH_r13.json BENCH_r14.json
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    p = doc.get("parsed", doc)
    qs = dict(p.get("queries", {}))
    qs.update(p.get("new_keys", {}))
    return {"queries": qs, "calib": p.get("calib_sec"), "sf": p.get("sf")}


def main() -> None:
    prev, now = load(sys.argv[1]), load(sys.argv[2])
    drift = (now["calib"] or 1.0) / (prev["calib"] or 1.0)
    print(
        f"calib: {prev['calib']} -> {now['calib']}  "
        f"(host {drift:.3f}x slower)" if drift > 1 else
        f"calib: {prev['calib']} -> {now['calib']}  "
        f"(host {1/drift:.3f}x faster)"
    )
    rows = []
    for k, old in sorted(prev["queries"].items()):
        new = now["queries"].get(k)
        if new is None or not old or not new:
            continue
        raw = old / new
        # adj: raw speedup × calib drift — unchanged code on a host
        # that calib says is 1/drift× faster shows raw ≈ 1/drift, so
        # multiplying by drift maps it back to ≈ 1.0 (the r13 judge's
        # convention: raw 0.71 × drift 1.407 ≈ 1 flat).
        rows.append((k, old, new, raw, raw * drift))
    rows.sort(key=lambda r: -r[4])
    print(f"{'key':24s} {'prev':>7s} {'now':>7s} {'raw':>6s} {'adj':>6s}")
    for k, old, new, raw, adj in rows:
        print(f"{k:24s} {old:7.3f} {new:7.3f} {raw:6.3f} {adj:6.3f}")
    geo_raw = math.exp(sum(math.log(r[3]) for r in rows) / len(rows))
    geo_adj = math.exp(sum(math.log(r[4]) for r in rows) / len(rows))
    print(
        f"\nn={len(rows)}  geomean raw={geo_raw:.3f}  "
        f"calib-adjusted={geo_adj:.3f}  (>1 = faster than prev)"
    )


if __name__ == "__main__":
    main()
