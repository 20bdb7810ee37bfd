#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given SF (threads=32 to mirror local[32])."""
import json, sys, glob, os, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle = json.load(open("/tmp/verify_out/oracle_sql.json"))
con = duckdb.connect()
con.execute("SET threads TO 32")
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
res = {}
for name, sql in sorted(oracle.items()):
    # warm once, then min of 2 (mirror Bench.scala)
    try:
        con.sql(sql).fetchall()
        ts = []
        for _ in range(2):
            t0 = time.time()
            con.sql(sql).fetchall()
            ts.append(time.time() - t0)
        res[name] = round(min(ts), 4)
    except Exception as e:
        res[name] = f"ERROR:{e}"
total = sum(v for v in res.values() if isinstance(v, float))
print(json.dumps({"total": round(total,2), "queries": res}))
