#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Runs each oracle_sql.json entry in DuckDB over the same parquet tables and
compares against the Verify.scala parquet dumps: row count, column names,
dtypes, and EXACT values after sorting columns by name (mirrors the
driver's sort-columns-then-hash compare). Both sides are read through
DuckDB so NULL and NaN stay distinct (pandas float columns collapse
None to NaN, which would green-light a divergence the driver's hash
compare fails); floats compare exactly — the determinism contract
(left-to-right folds, decimal accumulators) promises bit-identical
doubles.
"""
import json, sys, glob, os, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"  # distinct from None; equal to another NaN
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir) or not glob.glob(f"{spark_dir}/*.parquet"):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        sq = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols, srows = sq.columns, sq.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark read error {e}"); fails += 1; continue
    try:
        oq = con.sql(sql)
        ocols, orows = oq.columns, oq.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
        fails += 1; continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
        fails += 1; continue
    # align oracle columns to spark order, compare row-by-row (both
    # sides carry a stable ORDER BY)
    oidx = [ocols.index(c) for c in scols]
    mismatch = None
    for rn, (sr, orow) in enumerate(zip(srows, orows)):
        for ci, c in enumerate(scols):
            a, b = norm(sr[ci]), norm(orow[oidx[ci]])
            if a != b:
                mismatch = f"col {c} row {rn}: spark={a!r} oracle={b!r}"
                break
        if mismatch:
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}"); fails += 1; continue
    # Simulate the DRIVER's compare path: pandas sort_values over every
    # column (sorted by name) before hashing. Nested cells (dict/list/
    # ndarray) crash that sort with "unhashable type" — round 4 shipped
    # three queries that passed the row-by-row compare above but were
    # driver-red for exactly this. Any query output must survive it.
    try:
        sdf = pd.DataFrame(srows, columns=scols)
        sdf[sorted(scols)].sort_values(by=sorted(scols))
    except Exception as e:
        print(f"FAIL {name}: driver-sim sort failed: {type(e).__name__}: {e}")
        fails += 1; continue
    print(f"OK   {name} ({len(srows)} rows)")
print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
