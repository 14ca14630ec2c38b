#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL
from outDir/oracle_sql.json in DuckDB over the sf parquet tables, load
the Spark result parquet, sort columns by name, and compare values.
Usage: check.py <sfDir> <verifyOutDir> [--promote <stampfile>]

Changed-only loop (builder tooling; the driver always runs the full
gate): run Verify with SPARK_GRAFT_VERIFY_STAMP=<stampfile> — it skips
queries whose (normalized plan + oracle) fingerprint matches the
last-green stamp and writes the fresh fingerprints to
<stampfile>.next. Pass --promote <stampfile> here: ONLY when every
checked query passes does the .next file replace the stamp, so a red
run never marks anything green and the full sweep (no env) remains
the round-close gate.
"""
import duckdb, json, sys, glob, math, os

# --fresh: one DuckDB connection PER oracle instead of one shared
# connection for the run. The shared connection accumulates state
# that tips heavy oracles (~25M-row windows at sf10) into spurious
# tiny-block OOMs; fresh connections also isolate a crashed oracle.
# Use for sf1/sf10 stamp runs; the default stays cheap for sf0.01.

def _feq(a, b):
    try:
        return float(a) == float(b)
    except (TypeError, ValueError):
        return False

sf, out = sys.argv[1], sys.argv[2]
promote = None
if "--promote" in sys.argv:
    promote = sys.argv[sys.argv.index("--promote") + 1]
fresh = "--fresh" in sys.argv

def connect():
    c = duckdb.connect()
    if fresh:
        c.execute("SET preserve_insertion_order=false")
    for p in glob.glob(f"{sf}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        # driver testdata ships one file per table; builder-synthesized
        # scale data (GenScale) writes Spark directories — accept both
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        c.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return c

con = None if fresh else connect()
oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if fresh:
        if con is not None:
            con.close()
        con = connect()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    try:
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}"); fails += 1; continue
    ec = sorted(exp.columns); gc = sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: columns {gc} != oracle {ec}"); fails += 1; continue
    exp, got = exp[ec], got[ec]
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}"); fails += 1; continue
    # the driver's compare hashes TYPED values: a float64 oracle column vs
    # an int64 spark column fails there even when values print identically.
    # Integer WIDTH differences (int32 vs int64) are normalized by the
    # driver (observed: r2 hash-green queries with int32 spark cols), so
    # compare the dtype KIND only.
    kind = lambda d: d.kind if d.kind not in "ui" else "i"
    dt_bad = [c for c in ec if kind(exp[c].dtype) != kind(got[c].dtype)]
    if dt_bad:
        print(f"FAIL {name}: dtype mismatch " +
              ", ".join(f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}"
                        for c in dt_bad))
        fails += 1; continue
    bad = 0
    for col in ec:
        ev, gv = exp[col].tolist(), got[col].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            ana = a is None or (isinstance(a, float) and math.isnan(a))
            bna = b is None or (isinstance(b, float) and math.isnan(b))
            if ana and bna:
                continue
            eq = (not ana and not bna) and (str(a) == str(b) or
                 (isinstance(a, float) or isinstance(b, float)) and
                 _feq(a, b))
            if not eq:
                if bad < 3:
                    print(f"  {name}.{col}[{i}]: spark={b!r} oracle={a!r}")
                bad += 1
    if bad:
        print(f"FAIL {name}: {bad} value mismatches"); fails += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)")

if promote and not fails:
    nxt = promote + ".next"
    if os.path.exists(nxt):
        os.replace(nxt, promote)
        print(f"stamp promoted: {promote}")
    else:
        print(f"WARN: no {nxt} to promote (Verify ran without "
              "SPARK_GRAFT_VERIFY_STAMP?)")
sys.exit(1 if fails else 0)
