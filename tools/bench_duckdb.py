#!/usr/bin/env python3
"""DuckDB baseline timings for the oracle SQL at a given SF (the 2x
comparison target in BASELINE.md). Usage:
    tools/bench_duckdb.py [sfDir] [oracle_sql.json]
Each query runs DUCK_REPS times (default 3) and the MEDIAN is recorded:
round 16 showed per-gate DuckDB times moving 4-8x between rounds on an
identical binary/SQL/parquet triple (host noise), and a single-shot
denominator churned the whole weak-set computation (round-16 verdict
item 7). Each rep runs under a per-query wall cap (DUCK_CAP_SEC,
default 60): a query still running at the cap is interrupted and
recorded as the string "TIMEOUT" (the quadratic dd_minhash* oracles at
sf0.1 - measured 365s in round 8 - would otherwise dominate the run); a
first-rep timeout short-circuits the remaining reps. Failures record
null with the error on stderr. The artifact also carries the same
deterministic SHA-256 machine yardstick the Spark artifacts record
(fixed 1 MiB buffer, ~300 ms window, single-thread MB/s), so host
drift between DUCK_r* rounds is attributable inside the artifact."""
import duckdb, json, sys, time, glob, os, threading, hashlib


def machine_yardstick():
    buf = b"\x5a" * (1 << 20)
    hashlib.sha256(buf).digest()  # warm
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 0.3:
        hashlib.sha256(buf).digest()
        n += 1
    return round(n / (time.perf_counter() - t0), 1)  # MiB/s


sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cap = float(os.environ.get("DUCK_CAP_SEC", "60"))
reps = int(os.environ.get("DUCK_REPS", "3"))
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"))
times = {}
dispersion = {}
for name, sql in sorted(oracle.items()):
    samples = []
    outcome = None  # None = numeric reps, else "TIMEOUT"/"FAIL"
    for _ in range(max(1, reps)):
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
            samples.append(time.time() - t0)
        except Exception as e:
            if interrupted.is_set():
                outcome = "TIMEOUT"
                print(f"# {name} TIMEOUT at {cap}s", file=sys.stderr)
            else:
                outcome = "FAIL"
                print(f"# {name} failed: {e}", file=sys.stderr)
            break  # a timed-out/failed rep short-circuits the rest
        finally:
            timer.cancel()
    if outcome == "TIMEOUT":
        times[name] = "TIMEOUT"
    elif outcome == "FAIL":
        times[name] = None
    else:
        samples.sort()
        times[name] = round(samples[len(samples) // 2], 4)
        dispersion[name] = [round(samples[0], 4), round(samples[len(samples) // 2], 4),
                            round(samples[-1], 4)]
numeric = [t for t in times.values() if isinstance(t, float)]
print(json.dumps({
    "sf": sf, "cap_sec": cap, "reps": reps,
    "machine": {"sha256_st_mbs": machine_yardstick()},
    "total": round(sum(numeric), 3),
    "n_timeout": sum(1 for t in times.values() if t == "TIMEOUT"),
    "queries": times, "dispersion": dispersion}))
