#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads each SparkEntry query result (parquet written by `graft.Verify`)
and the dumped oracle_sql.json, runs the oracle SQL in DuckDB over the
same testdata parquet, and compares: schema (sorted column names), row
count, and cell-exact values (floats compared exactly; also reports the
max abs diff when exact fails so tolerance issues are visible).
"""
import duckdb, pandas as pd, numpy as np, json, sys, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
# optional third arg: comma-separated query names to skip (the
# quadratic-oracle set when cross-checking at sf0.1)
skip = set(filter(None, (sys.argv[3] if len(sys.argv) > 3 else "").split(",")))
n_pass = n_fail = 0
# per-query pass/fail map -> JSON artifact (CHECK_local_r{N}.json):
# the round's correctness evidence must be self-contained in the repo
# even when the driver's own CORRECTNESS artifact fails (round-15:
# CORRECTNESS_r15.json came back {} on a green tree)
res = {}
json_out = os.environ.get("CHECK_JSON_OUT", "")


def tclass(col):
    """Raw type class BEFORE normalization. The driver's hash is
    type-/serialization-sensitive (round 6: DuckDB HUGEINT sum vs Spark
    BIGINT hashed differently while values were cell-equal), so a class
    mismatch here must FAIL even when normalized values compare equal."""
    d = str(col.dtype)
    if d.startswith("int") or d.startswith("uint"):
        return "int"
    if d.startswith("float"):
        return "float"
    if d.startswith("datetime64"):
        return "datetime[tz]" if getattr(col.dtype, "tz", None) is not None else "datetime"
    if d == "bool" or d == "boolean":
        return "bool"
    if col.dtype == object:
        nn = col.dropna()
        if not len(nn):
            return "null"
        tn = type(nn.iloc[0]).__name__
        if tn == "Decimal":
            return "decimal"
        if tn in ("date", "datetime", "Timestamp"):
            return "datetime"
        if tn in ("str",):
            return "str"
        if tn in ("bytes", "bytearray"):
            return "bytes"
        if tn in ("list", "ndarray", "tuple"):
            return "array"
        return tn
    return d


def norm(col):
    s = col
    if s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if len(s.dropna()) else None, (pd.Timestamp,)):
        s = pd.to_datetime(s)
    # datetime-likes → ns datetime64
    if str(s.dtype).startswith("datetime64") or (
        s.dtype == object and len(s.dropna()) and type(s.dropna().iloc[0]).__name__ in ("date", "datetime", "Timestamp")
    ):
        s = pd.to_datetime(s)
        try:
            s = s.dt.tz_localize(None)
        except (TypeError, AttributeError):
            pass
        return s.astype("datetime64[ns]")
    if str(s.dtype) in ("float32",):
        return s.astype("float64")
    if str(s.dtype).startswith("int") or str(s.dtype).startswith("uint"):
        return s.astype("int64")
    if s.dtype == object and len(s.dropna()) and type(s.dropna().iloc[0]).__name__ == "Decimal":
        return s.astype("float64")
    return s


for name in sorted(oracle):
    if name in skip:
        print(f"SKIP {name}")
        res[name] = {"status": "skip"}
        continue
    sql = oracle[name]
    try:
        sdf = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable: {e}")
        res[name] = {"status": "fail", "detail": f"spark result unreadable: {e}"}
        n_fail += 1
        continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        res[name] = {"status": "fail", "detail": f"oracle SQL error: {e}"}
        n_fail += 1
        continue
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
        res[name] = {"status": "fail", "detail": f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}"}
        n_fail += 1
        continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        res[name] = {"status": "fail", "detail": f"rows spark={len(sdf)} oracle={len(odf)}"}
        n_fail += 1
        continue
    bad = []
    for c in sdf.columns:
        ta, tb = tclass(sdf[c]), tclass(odf[c])
        if ta != tb and "null" not in (ta, tb):
            bad.append(f"{c} (DTYPE spark={ta}/{sdf[c].dtype} oracle={tb}/{odf[c].dtype})")
            continue
        a, b = norm(sdf[c]).reset_index(drop=True), norm(odf[c]).reset_index(drop=True)
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype("float64"); b = b.astype("float64")
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                d = (a - b).abs().max()
                bad.append(f"{c} (maxdiff={d}, n_bad={int((~eq).sum())})")
        else:
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                i = int(np.argmax(~eq.values))
                bad.append(f"{c} (first bad row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r})")
    if bad:
        print(f"FAIL {name}: value mismatch: {'; '.join(bad)}")
        res[name] = {"status": "fail", "rows": len(sdf), "detail": f"value mismatch: {'; '.join(bad)}"}
        n_fail += 1
    else:
        print(f"PASS {name} ({len(sdf)} rows)")
        res[name] = {"status": "pass", "rows": len(sdf)}
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf": sf, "n_pass": n_pass, "n_fail": n_fail,
                   "queries": res}, f, indent=0, sort_keys=True)
    print(f"wrote {json_out}")
sys.exit(1 if n_fail else 0)
