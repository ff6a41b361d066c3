#!/usr/bin/env python3
"""Compose the scale-slope ledger (r9 verdict item 4): merge two
BenchSlope runs of the same query subset at two tiers into one artifact
reporting the per-query scaling ratio vs the data-growth factor.

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
    for name in qb:
        if name not in qs or qs[name] <= 0:
            continue
        ratio = qb[name] / qs[name]
        rows[name] = {
            "warm_small_s": qs[name],
            "warm_big_s": qb[name],
            "ratio": round(ratio, 2),
            # sublinear = scales better than the data grew
            "sublinear": ratio <= growth,
        }
    out = {
        "metric": "scale_slope_ledger",
        "sf_small": small["sf"],
        "sf_big": big["sf"],
        "data_growth": growth,
        "n_queries": len(rows),
        "n_superlinear": sum(1 for r in rows.values() if not r["sublinear"]),
        "queries": dict(sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["ratio"] for k, v in out["queries"].items()}, indent=0))
    print(f"-> {out_path} ({out['n_superlinear']}/{out['n_queries']} exceed {growth}x)")


if __name__ == "__main__":
    main()
