#!/usr/bin/env python3
"""Common-subset warm-time diff of two Bench artifacts (r10 verdict item
5: name a cross-round drift cause with per-query diag instead of a bare
total). Prints the common-subset totals, the top movers in both
directions, and the added/removed query sets with their times.

Usage: bench_diff.py <old_bench.json> <new_bench.json> [top_n]
"""
import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1:3]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so, sn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(f"common subset: {len(common)} queries  "
          f"old {so:.1f}s -> new {sn:.1f}s  ({(sn / so - 1) * 100:+.1f}%)")
    movers = sorted(common, key=lambda q: qn[q] - qo[q])
    print(f"\ntop {top_n} improvements:")
    for q in movers[:top_n]:
        d = qn[q] - qo[q]
        if d >= 0:
            break
        print(f"  {q:32s} {qo[q]:7.2f} -> {qn[q]:7.2f}  ({d:+.2f}s)")
    print(f"\ntop {top_n} regressions:")
    for q in reversed(movers[-top_n:]):
        d = qn[q] - qo[q]
        if d <= 0:
            break
        print(f"  {q:32s} {qo[q]:7.2f} -> {qn[q]:7.2f}  ({d:+.2f}s)")
    added = sorted(set(qn) - set(qo), key=lambda q: -qn[q])
    removed = sorted(set(qo) - set(qn), key=lambda q: -qo[q])
    if added:
        print(f"\nadded ({sum(qn[q] for q in added):.1f}s total): " +
              ", ".join(f"{q}={qn[q]:.1f}s" for q in added))
    if removed:
        print(f"removed ({sum(qo[q] for q in removed):.1f}s total): " +
              ", ".join(f"{q}={qo[q]:.1f}s" for q in removed))


if __name__ == "__main__":
    main()
