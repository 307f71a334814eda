#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify at a
scale factor, then replay each oracle SQL in DuckDB on the same parquet
tables and compare (column names sorted, exact values). Dev tool only — the
engine itself is pure Scala/Spark."""
import decimal
import json, sys, subprocess, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if os.environ.get("SKIP_SPARK") != "1":
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                               if "error" in l.lower() or "verify" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-2000:]); sys.exit(1)

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{OUT}/{name}")
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: no spark output ({e})"); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle error {str(e)[:200]}"); continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append(name)
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); continue
    if len(got) != len(exp):
        fails.append(name); print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
    # Driver parity: the driver hashes *formatted* values, so an int column on
    # one side vs a float column on the other (e.g. DuckDB HUGEINT -> pandas
    # float64 when the oracle forgot a CAST) hash-mismatches even when the
    # numbers are equal. Fail on int-vs-float dtype-kind divergence up front.
    def kind(s):
        k = s.dtype.kind
        # object-of-int columns: DuckDB HUGEINT surfaces as object of int OR
        # of Decimal (zero exponent). isinstance(True, int) is True in
        # Python, so bools must be excluded or a boolean column reads as
        # int-kind and int-vs-float divergences slip to the opaque
        # hash-mismatch path (ADVICE r9).
        def int_like(v):
            if isinstance(v, bool):
                return False
            if isinstance(v, int):
                return True
            return (isinstance(v, decimal.Decimal)
                    and v == v.to_integral_value())
        if k == "O" and len(s) and all(pd.isna(v) or int_like(v) for v in s):
            return "i"
        return k
    dbad = None
    for c in got.columns:
        gk, ek = kind(got[c]), kind(exp[c])
        if {gk, ek} == {"i", "f"} or ({gk, ek} <= {"i", "u", "f"} and gk != ek
                                      and "f" in {gk, ek}):
            dbad = (c, gk, ek); break
    if dbad:
        fails.append(name)
        print(f"FAIL {name}: dtype-kind col={dbad[0]} spark={dbad[1]} oracle={dbad[2]}"
              " (int-vs-float: missing CAST in oracle?)")
        continue
    # exact value compare, row order as produced (both sides ORDER BY)
    bad = None
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            ana, bna = pd.isna(a), pd.isna(b)
            if ana and bna:
                continue
            if ana != bna or a != b:
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        fails.append(name)
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
    else:
        print(f"PASS {name}: {len(got)} rows")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
