#!/usr/bin/env python
"""Compare two BENCH_SELF.json records per shared query:
`python scripts/bench_compare.py OLD NEW [threshold]` prints geomean,
worst/best ratios, rows above threshold (default 1.5x), and the new
queries' first-green bars."""

from __future__ import annotations

import json
import math
import sys


def main() -> int:
    old = json.load(open(sys.argv[1]))["queries"]
    newrec = json.load(open(sys.argv[2]))
    new = newrec["queries"]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(old) & set(new))
    ratios = {
        q: new[q] / old[q] for q in shared if old[q] > 0 and new[q] > 0
    }
    if not ratios:
        print("no shared positive-timing queries between the two records")
        return 1
    geo = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"shared {len(shared)}  geomean {geo:.3f}")
    ranked = sorted(ratios.items(), key=lambda kv: -kv[1])
    print("worst 8:")
    for q, r in ranked[:8]:
        print(f"  {q}: {old[q]} -> {new[q]}  ({r:.2f}x)")
    print("best 3:")
    for q, r in ranked[-3:]:
        print(f"  {q}: {old[q]} -> {new[q]}  ({r:.2f}x)")
    above = [q for q, r in ratios.items() if r > thresh]
    print(f"above {thresh}x: {above}")
    added = sorted(set(new) - set(old))
    print("new rows (first-green bars):", {q: new[q] for q in added})
    print("probe:", newrec.get("load_probe"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
