#!/usr/bin/env python
"""Derive a ~10x (sf1-scale) bench dataset from the driver's sf0.1
tables, for the SCALING REHEARSAL only (never for correctness gates —
those run on the driver-generated sf dirs untouched).

Replication: each table is unioned 10x with replica-shifted keys so
referential integrity holds (orderkey/custkey/partkey/suppkey shift
together); nation/region dims stay fixed. Texts get a per-replica
suffix token and embeddings a per-replica component nudge so the
dedup/ANN structure scales like real data (10x the clusters) instead
of creating cross-replica exact-duplicate blowup.

Usage: python scripts/gen_sf1.py [outDir]  (default /root/repo/scratch/sf1)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scratch/sf1"
REPS = 10


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    def shift(table, col):
        mx = con.sql(f"SELECT max({col}) FROM {table}").fetchone()[0]
        return int(mx) + 1

    k_ord = shift("orders", "o_orderkey")
    k_cust = shift("customer", "c_custkey")
    k_part = shift("part", "p_partkey")
    k_supp = shift("supplier", "s_suppkey")
    k_evt = shift("events", "event_id")
    k_user = shift("events", "user_id")
    k_doc = shift("documents", "doc_id")
    k_vec = shift("embeddings", "vec_id")

    def emit(name, select):
        q = f"COPY ({select}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
        con.sql(q)
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
        print(f"{name:12s} {n} rows")

    rep = f"CROSS JOIN range(0, {REPS}) r(k)"
    emit("region", "SELECT * FROM region")
    emit("nation", "SELECT * FROM nation")
    emit("customer", f"""
        SELECT c_custkey + k * {k_cust} AS c_custkey,
               * EXCLUDE (c_custkey) FROM customer {rep}""")
    emit("supplier", f"""
        SELECT s_suppkey + k * {k_supp} AS s_suppkey,
               * EXCLUDE (s_suppkey) FROM supplier {rep}""")
    emit("part", f"""
        SELECT p_partkey + k * {k_part} AS p_partkey,
               * EXCLUDE (p_partkey) FROM part {rep}""")
    emit("orders", f"""
        SELECT o_orderkey + k * {k_ord} AS o_orderkey,
               o_custkey + k * {k_cust} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey) FROM orders {rep}""")
    emit("lineitem", f"""
        SELECT l_orderkey + k * {k_ord} AS l_orderkey,
               l_partkey + k * {k_part} AS l_partkey,
               l_suppkey + k * {k_supp} AS l_suppkey,
               * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM lineitem {rep}""")
    emit("events", f"""
        SELECT event_id + k * {k_evt} AS event_id,
               user_id + k * {k_user} AS user_id,
               * EXCLUDE (event_id, user_id) FROM events {rep}""")
    # replicas get TWO scattered k-dependent edits in the text HEAD
    # (chars 2 and 14) plus a tail tag: any two replicas of a base doc
    # are >= 2 edits apart in any prefix window, so q-gram/edit-distance
    # blocking sees 10x INDEPENDENT corpora (linear growth) instead of
    # quadratic cross-replica near-dup blowup a tail-only tag causes
    # n_chars tracks the ACTUAL length delta of the edit (head splices
    # on short docs don't add exactly the tag length), so text-stat
    # queries see consistent rows at sf1
    emit("documents", f"""
        SELECT doc_id, new_text AS text, lang, source,
               CAST(n_chars + length(new_text) - olen AS BIGINT) AS n_chars
        FROM (
          SELECT doc_id + k * {k_doc} AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE substr(text, 1, 1) || chr(CAST(97 + k AS INTEGER)) ||
                           substr(text, 3, 11) || chr(CAST(110 + k AS INTEGER)) ||
                           substr(text, 15) || ' rk' || CAST(k AS VARCHAR)
                 END AS new_text,
                 lang, source, n_chars, length(text) AS olen
          FROM documents {rep})""")
    emit("embeddings", f"""
        SELECT vec_id + k * {k_vec} AS vec_id,
               CAST(list_transform(CAST(embedding AS DOUBLE[]),
                 x -> x + k * 0.0003) AS FLOAT[]) AS embedding,
               label
        FROM embeddings {rep}""")


if __name__ == "__main__":
    main()
