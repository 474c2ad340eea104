#!/usr/bin/env python3
"""DuckDB baseline timings for the oracle SQL at a given SF (the 2x
comparison target in BASELINE.md). Usage: tools/bench_duckdb.py [sfDir]."""
import duckdb, json, sys, time, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"))
times = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        times[name] = round(time.time() - t0, 4)
    except Exception as e:
        times[name] = None
        print(f"# {name} failed: {e}", file=sys.stderr)
print(json.dumps({"total": round(sum(t for t in times.values() if t), 3), "queries": times}))
