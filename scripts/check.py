#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Runs each oracle_sql.json entry in DuckDB over the same parquet tables and
compares against the Verify.scala parquet dumps: row count, column names,
dtypes, and exact values after sorting columns by name (mirrors the driver's
sort-columns-then-hash compare).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{spark_dir}/*.parquet"))])
    except ValueError:
        print(f"FAIL {name}: empty spark output"); fails += 1; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1).reset_index(drop=True)
    odf = odf.reindex(sorted(odf.columns), axis=1).reset_index(drop=True)
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: cols spark={list(sdf.columns)} oracle={list(odf.columns)}"); fails += 1; continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}"); fails += 1; continue
    mismatch = None
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                # EXACT: the determinism contract (left-to-right folds,
                # decimal accumulators) promises bit-identical doubles;
                # a tolerance here could green-light a query the
                # driver's hash compare would fail
                eq = a.astype(float).fillna(-1e308) == b.astype(float).fillna(-1e308)
            else:
                eq = a.astype(object).where(pd.notna(a), None) == b.astype(object).where(pd.notna(b), None)
                eq = eq | (pd.isna(a) & pd.isna(b))
        except Exception as e:
            mismatch = (c, f"compare error {e}"); break
        if not eq.all():
            i = eq.idxmin()
            mismatch = (c, f"row {i}: spark={a[i]!r} oracle={b[i]!r}"); break
        if str(a.dtype) != str(b.dtype):
            print(f"  note {name}.{c}: dtype spark={a.dtype} oracle={b.dtype}")
    if mismatch:
        print(f"FAIL {name}: col {mismatch[0]} {mismatch[1]}"); fails += 1
    else:
        print(f"OK   {name} ({len(sdf)} rows)")
print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
