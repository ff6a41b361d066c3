#!/usr/bin/env python3
"""Dev-only oracle checker: replicates the driver's DuckDB compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name>/ parquet (Spark output) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables, then compares
values with columns sorted by name and rows sorted by all columns.
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_rows = con.sql(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            spark_cols = [d[0] for d in con.sql(
                f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]
            oracle_rel = con.sql(sql)
            oracle_rows = oracle_rel.fetchall()
            oracle_cols = [d[0] for d in oracle_rel.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
            n_fail += 1
            continue
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        s = sorted(tuple(canon(r[i]) for i in s_idx) for r in spark_rows)
        o = sorted(tuple(canon(r[i]) for i in o_idx) for r in oracle_rows)
        if s == o:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            for i, (a, b) in enumerate(zip(s, o)):
                if a != b:
                    print(f"  first diff at sorted-row {i}:\n    spark : {a}\n    oracle: {b}")
                    break
            else:
                tag = "spark" if len(s) > len(o) else "oracle"
                longer = s if len(s) > len(o) else o
                print(f"  extra {tag} row: {longer[min(len(s), len(o))]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
