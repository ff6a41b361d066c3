#!/usr/bin/env python3
"""Compose the scale-slope ledger (r9 verdict item 4): merge two
BenchSlope runs of the same query subset at two tiers into one artifact
reporting the per-query scaling ratio vs the data-growth factor.

Queries present in only one tier (a tier-specific failure or a subset
mismatch), or with a non-positive small-tier time, are NOT silently
intersected away: they land in `dropped` with the reason, so an
incomplete ledger is visible in the committed artifact (r10 ADVICE).

Usage: slope_ledger.py <small.json> <big.json> <growth> <out.json>
"""
import json
import sys


def main() -> None:
    small_path, big_path, growth, out_path = sys.argv[1:5]
    growth = float(growth)
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    qs, qb = small["queries"], big["queries"]
    rows = {}
    dropped = {}
    for name in sorted(set(qs) | set(qb)):
        if name not in qb:
            dropped[name] = "missing_in_big_tier"
            continue
        if name not in qs:
            dropped[name] = "missing_in_small_tier"
            continue
        if qs[name] <= 0:
            dropped[name] = "nonpositive_small_tier_time"
            continue
        ratio = qb[name] / qs[name]
        rows[name] = {
            "warm_small_s": qs[name],
            "warm_big_s": qb[name],
            "ratio": round(ratio, 2),
            # scales no worse than the data grew (ratio == growth is
            # at-growth/linear, included here; strictly-better-than-
            # growth would be "sublinear" — the r10 field name overstated
            # what the artifact certifies)
            "at_or_below_growth": ratio <= growth,
        }
    out = {
        "metric": "scale_slope_ledger",
        "sf_small": small["sf"],
        "sf_big": big["sf"],
        "data_growth": growth,
        "n_queries": len(rows),
        "n_superlinear": sum(
            1 for r in rows.values() if not r["at_or_below_growth"]),
        "n_dropped": len(dropped),
        "dropped": dropped,
        "failed_small": small.get("failed", []),
        "failed_big": big.get("failed", []),
        "queries": dict(sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["ratio"] for k, v in out["queries"].items()}, indent=0))
    print(f"-> {out_path} ({out['n_superlinear']}/{out['n_queries']} exceed "
          f"{growth}x; {len(dropped)} dropped)")


if __name__ == "__main__":
    main()
