#!/usr/bin/env python3
"""DuckDB baseline timings for the oracle SQL at a given SF (the 2x
comparison target in BASELINE.md). Usage:
    tools/bench_duckdb.py [sfDir] [oracle_sql.json]
Each query runs under a per-query wall cap (DUCK_CAP_SEC, default 60):
a query still running at the cap is interrupted and recorded as the
string "TIMEOUT" (the quadratic dd_minhash* oracles at sf0.1 — measured
365s in round 8 — would otherwise dominate the run). Failures record
null with the error on stderr."""
import duckdb, json, sys, time, glob, os, threading

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cap = float(os.environ.get("DUCK_CAP_SEC", "60"))
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"))
times = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    # the TIMEOUT classification keys off this flag, set by the timer
    # callback itself, NOT off elapsed wall time: a genuine failure
    # that happens to surface near the cap must record as a failure,
    # not masquerade as a timeout in the committed baseline artifact
    interrupted = threading.Event()

    def _interrupt():
        interrupted.set()
        con.interrupt()
    timer = threading.Timer(cap, _interrupt)
    timer.start()
    try:
        con.execute(sql).fetchall()
        times[name] = round(time.time() - t0, 4)
    except Exception as e:
        if interrupted.is_set():
            times[name] = "TIMEOUT"
            print(f"# {name} TIMEOUT at {cap}s", file=sys.stderr)
        else:
            times[name] = None
            print(f"# {name} failed: {e}", file=sys.stderr)
    finally:
        timer.cancel()
numeric = [t for t in times.values() if isinstance(t, float)]
print(json.dumps({
    "sf": sf, "cap_sec": cap,
    "total": round(sum(numeric), 3),
    "n_timeout": sum(1 for t in times.values() if t == "TIMEOUT"),
    "queries": times}))
