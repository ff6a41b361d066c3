#!/usr/bin/env python3
"""Generate a larger synthetic tier by key-shifted replication of an
existing one (default: sf1 = 10x sf0.1), preserving schema and
referential integrity so the Verify/check_oracle gate runs unchanged
against the output dir.

The driver only ships sf0.001/0.01/0.1; the sf1 gate exists to exercise
cap boundaries (blocking caps, MaxDirectDocs, broadcast-refine caps)
near their edges, which only needs MORE data of the same shape — not the
driver's exact distribution. Every fact row is replicated `reps` times
with all keys offset consistently per replica (customer/supplier/part/
order keys, document/vector/event ids), so joins land exactly as in the
base tier; dimension tables (region, nation) are fixed vocabulary and
stay as-is. Text is word-hashed per replica (same construction as the
bench drain corpus: identical words map identically within a replica, so
each replica's near-dup structure mirrors the base corpus, while
cross-replica gram overlap is ~zero). Embeddings are replicated with a
deterministic per-replica orthogonal-ish sign flip so replicas are not
mutual near-duplicates. Timestamps are left unchanged (time-range
predicates keep their selectivity).

Usage: gen_sf.py [--base /root/testdata/sf0.1] [--out /tmp/graft_sf1]
                 [--reps 10]
"""
import argparse
import hashlib

import duckdb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/graft_sf1")
    ap.add_argument("--reps", type=int, default=10)
    a = ap.parse_args()

    import os
    os.makedirs(a.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def base(t: str) -> str:
        return f"read_parquet('{a.base}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{a.out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{a.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")

    # replica index relation 0..reps-1
    r = f"(SELECT unnest(range({a.reps})) AS r)"

    # key offsets: one per base-key space, from the base max so replica
    # key ranges are disjoint but contiguous-ish
    off = {}
    for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                 ("part", "p_partkey"), ("orders", "o_orderkey"),
                 ("documents", "doc_id"), ("embeddings", "vec_id"),
                 ("events", "event_id"), ("events_user", "user_id")]:
        src = "events" if t == "events_user" else t
        off[t] = con.execute(
            f"SELECT max({k}) + 1 FROM {base(src)}").fetchone()[0]

    # dimension tables: fixed vocabulary, copied verbatim
    for t in ["region", "nation"]:
        write(t, f"SELECT * FROM {base(t)}")

    write("customer", f"""
        SELECT c_custkey + r * {off['customer']} AS c_custkey,
               CASE WHEN r = 0 THEN c_name
                    ELSE c_name || '#' || r::VARCHAR END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {base('customer')}, {r}""")

    write("supplier", f"""
        SELECT s_suppkey + r * {off['supplier']} AS s_suppkey,
               CASE WHEN r = 0 THEN s_name
                    ELSE s_name || '#' || r::VARCHAR END AS s_name,
               s_nationkey, s_acctbal
        FROM {base('supplier')}, {r}""")

    write("part", f"""
        SELECT p_partkey + r * {off['part']} AS p_partkey,
               CASE WHEN r = 0 THEN p_name
                    ELSE p_name || '#' || r::VARCHAR END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM {base('part')}, {r}""")

    write("orders", f"""
        SELECT o_orderkey + r * {off['orders']} AS o_orderkey,
               o_custkey + r * {off['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate::TIMESTAMP_MS AS o_orderdate, o_orderpriority
        FROM {base('orders')}, {r}""")

    write("lineitem", f"""
        SELECT l_orderkey + r * {off['orders']} AS l_orderkey,
               l_partkey + r * {off['part']} AS l_partkey,
               l_suppkey + r * {off['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus,
               l_shipdate::TIMESTAMP_MS AS l_shipdate
        FROM {base('lineitem')}, {r}""")

    # events goes through pyarrow to pin ts at TIMESTAMP_MICROS — the
    # spelling the driver's 2026-08-13 regeneration uses (Tables.events
    # adapts to NANOS/NTZ/TZ, but generated tiers should mirror the
    # driver's current data exactly so local runs exercise the same path)
    import pyarrow as pa
    import pyarrow.parquet as pq
    ev = con.execute(f"""
        SELECT event_id + r * {off['events']} AS event_id,
               ts,
               user_id + r * {off['events_user']} AS user_id,
               event_type, value, props
        FROM {base('events')}, {r}""").arrow()
    ts_us = ev.column("ts").cast(pa.timestamp("us"))
    ev = ev.set_column(ev.schema.get_field_index("ts"), "ts", ts_us)
    pq.write_table(ev, f"{a.out}/events.parquet")
    print(f"events: {ev.num_rows} rows")

    # documents: replica r>0 keeps ~1/3 of words verbatim (hash(w)%3 ==
    # r%3) and maps the rest through a same-length per-replica hex hash.
    # Three properties matter, all learned the hard way:
    #  - SAME-LENGTH tokens: longer hashed tokens inflate shared-word
    #    gram mass and push templated doc pairs over the near-dup
    #    threshold (a pure 12-char hash produced 26k pairs where the
    #    base tier has 30);
    #  - PARTIAL shared vocabulary: a fully bijective transform (caesar,
    #    uniform hash) copies every corpus statistic exactly, so base
    #    doc k and replica doc k get cross-entropy values that are equal
    #    as real numbers — and rank cutoffs then flip on per-engine
    #    floating-point summation-order noise (q73/q100 checksum
    #    failures). Shared words mix counts across replicas and break
    #    the degeneracy by real margins;
    #  - cross-replica Jaccard stays ~0.2, far under the 0.7 near-dup
    #    threshold, so pair counts scale linearly with reps.
    # ... and drop every 13th-ish word at a (doc, replica)-dependent
    # offset: without a real multiset change, every per-gram probability
    # term of a replica doc equals its base doc's term (counts add
    # symmetrically or factor per replica), so cross-entropy stays tied
    # to the last ulp and the q73/q100 rank cutoffs flip on summation
    # order. A dropped word changes which grams exist — a real margin.
    write("documents", f"""
        WITH w AS (
          SELECT doc_id, r, lang, source, n_chars,
                 string_split(text, ' ') AS ws, text
          FROM {base('documents')}, {r}
        )
        SELECT doc_id + r * {off['documents']} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE list_aggregate(list_transform(
                      list_filter(list_zip(ws, range(1, len(ws) + 1)),
                        z -> (z[2] + doc_id + 7 * r) % 13 <> 0),
                      z -> CASE
                             WHEN z[1] = '' THEN ''
                             WHEN ('0x' || substr(md5(z[1]), 1, 6))::BIGINT % 3 = r % 3
                               THEN z[1]
                             ELSE substr(md5(z[1] || '_' || r::VARCHAR), 1, length(z[1]))
                           END), 'string_agg', ' ')
               END AS text,
               lang, source, n_chars
        FROM w""")
    # n_chars is advisory in the base tier for r>0 replicas too: queries
    # that use it (q104's length filter) read the COLUMN, not len(text),
    # in both engines, so the gate comparison is unaffected.

    # embeddings: replicas are EXACT copies under fresh vec_ids — the one
    # transform that preserves every geometric property the recall gates
    # depend on (k-means cells, IVF coverage, semdedup clusters) while
    # staying realistic: duplicated documents have duplicate embeddings.
    # Near-dup pair outputs grow by n*C(reps,2) copy pairs — linear in
    # the corpus — and every engine-side tie already breaks on (cos,
    # cid). Per-replica NOISE shells were tried and rejected: weak noise
    # floods the 0.45 cosine band, strong noise turns the corpus into
    # soup and collapses the fixed-parameter IVF/semdedup recall gates.
    write("embeddings", f"""
        SELECT vec_id + r * {off['embeddings']} AS vec_id, embedding, label
        FROM {base('embeddings')}, {r}""")


if __name__ == "__main__":
    main()
