#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's t2 correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Loads outDir/oracle_sql.json (written by graft.Verify), registers the
testdata parquet tables as DuckDB views, runs each oracle SQL, and compares
against the Spark result parquet (outDir/<name>/), column-sorted, cell-exact.
NOT part of the engine — development tooling only.
"""
import glob
import json
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    sdf = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    odf = odf[sorted(odf.columns)]
    sdf = sdf[sorted(sdf.columns)]
    if list(odf.columns) != list(sdf.columns):
        print(f"FAIL {name}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
        fails += 1
        continue
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        fails += 1
        continue
    bad = None
    for c in odf.columns:
        a, b = sdf[c].tolist(), odf[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    bad = (c, i, x, y)
                    break
            elif str(x) != str(y):
                bad = (c, i, x, y)
                break
        if bad:
            break
    if bad:
        c, i, x, y = bad
        print(f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r}")
        fails += 1
    else:
        print(f"OK   {name} ({len(sdf)} rows, {len(sdf.columns)} cols)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
