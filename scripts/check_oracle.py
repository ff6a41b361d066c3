#!/usr/bin/env python3
"""Dev-only oracle checker: replicates the driver's DuckDB compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name>/ parquet (Spark output) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables, then compares
values with columns sorted by name and rows sorted by all columns.
"""
import decimal, json, sys, glob, math
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

# SURVEY §2.14 envelope rule: every emitted DECIMAL must survive a float64
# round-trip, because the DRIVER's hash canonicalization converts decimal
# values through double even though this checker compares exact Decimals.
# r8 shipped q141/q142 red on exactly this gap: DECIMAL(38,0) sums up to
# 9.1e18 (19 significant digits) passed here and hash-mismatched in the
# driver. Calibration of the rule's SCOPE is empirical: q44b has emitted
# full-width 64-bit BIGINT fingerprints since r4 and is driver-green every
# round, so native int64 columns do NOT pass through double — only decimal
# columns do. Hence: ints are safe at any width; any Decimal whose value
# changes under float64 is a HARD FAIL on both the spark dump and the
# oracle result — run at the largest tier (sf1), where checksums are
# biggest, to certify a query. Wide integer results belong in BIGINT
# (or a hi/lo split), never in DECIMAL.
_F64_EXACT = 1 << 53

def f64_safe(v):
    if isinstance(v, decimal.Decimal):
        try:
            return decimal.Decimal(repr(float(v))) == v
        except (OverflowError, ValueError, decimal.InvalidOperation):
            return False
    return True

def envelope_violations(rows, cols, limit=3):
    """First `limit` (col, value) pairs failing the float64 round-trip."""
    out = []
    for r in rows:
        for c, v in zip(cols, r):
            if not f64_safe(v):
                out.append((c, v))
                if len(out) >= limit:
                    return out
    return out

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
        bad = [("spark", c, v) for c, v in envelope_violations(spark_rows, spark_cols)]
        bad += [("oracle", c, v) for c, v in envelope_violations(oracle_rows, oracle_cols)]
        if bad:
            print(f"FAIL {name}: float64-envelope violation (driver hashes through double)")
            for side, c, v in bad:
                print(f"  {side} col {c}: {v!r} does not survive a float64 round-trip")
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
