#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python scripts/check_oracle.py <sfDir> <verifyOutDir> [--subset]

--subset: the verify dump was a targeted run (Verify's 3rd arg); skip
the every-oracle-key-needs-an-output-dir completeness check.

For each query dir under verifyOutDir: read the Spark parquet result,
run the oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
sort both by all columns (by name), and compare row counts + values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz/unit normalize datetimes
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    import glob
    import os
    qdirs = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    # A query that THROWS in Verify writes no output dir and would
    # silently vanish from the compare (7 event-time queries were lost
    # this way when testdata switched ts from nanos to micros). Every
    # oracle key must have a result dir.
    if "--subset" not in sys.argv:
        dropped = sorted(set(oracle) - set(qdirs))
        for name in dropped:
            print(f"{name:30s} MISSING OUTPUT (query failed in Verify?)")
            failures.append(name)
    for name in qdirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            status = "ROWS_ONLY" if len(got) > 0 else "ROWS_ONLY_EMPTY!"
            print(f"{name:30s} {status} rows={len(got)}")
            if len(got) == 0:
                failures.append(name)
            continue
        want = con.sql(oracle[name]).df()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"{name:30s} SCHEMA MISMATCH spark={list(g.columns)} duck={list(w.columns)}")
            failures.append(name)
            continue
        if len(g) != len(w):
            print(f"{name:30s} ROWCOUNT MISMATCH spark={len(g)} duck={len(w)}")
            failures.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            # The driver's hash stringifies values, so int64 3 vs float64
            # 3.0 (or HUGEINT->object) hash-differ even when values match.
            # Flag any column where the dtype KIND diverges between the
            # Spark result and the DuckDB oracle.
            drift = [
                (c, str(g[c].dtype), str(w[c].dtype))
                for c in g.columns
                if g[c].dtype.kind != w[c].dtype.kind
                and {g[c].dtype.kind, w[c].dtype.kind} != {"i", "u"}
            ]
            if drift:
                print(f"{name:30s} DTYPE DRIFT {drift}")
                failures.append(name)
            else:
                print(f"{name:30s} OK rows={len(g)}")
        except AssertionError as e:
            print(f"{name:30s} VALUE MISMATCH: {str(e)[:300]}")
            failures.append(name)
    print("=" * 60)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print(f"ALL {len(qdirs)} QUERIES MATCH")


if __name__ == "__main__":
    main()
