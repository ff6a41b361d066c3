#!/usr/bin/env python3
"""Dev-only baseline bench: times every oracle SQL text in DuckDB over the
sf tables — the single-node baseline the engine's Bench numbers are judged
against.

Usage: bench_oracle.py <verify_out_dir> <sf_dir> [threads]

Reads <out>/oracle_sql.json (written by `runMain graft.Verify`), runs each
query once warm-up-free in DuckDB with the given thread count (default 32),
and prints one JSON line: {"total": sec, "threads": N, "failed": [...],
"queries": {name: sec}}. Failures are timed-to-failure but excluded from
the total, matching how a degraded engine run is reported.
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    times, failed = {}, []
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            failed.append(name)
            print(f"[oracle-bench] {name} FAILED: {e}", file=sys.stderr)
        dt = time.time() - t0
        times[name] = round(dt, 3)
        print(f"[oracle-bench] {name:34s} {dt:8.2f} s", file=sys.stderr)
    total = round(sum(v for k, v in times.items() if k not in failed), 3)
    print(json.dumps({"total": total, "threads": threads,
                      "failed": failed, "queries": times}))


if __name__ == "__main__":
    main()
