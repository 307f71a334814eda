#!/usr/bin/env python3
"""Oracle type lint: catch the q323-class escape (r4 had the first, r8 the
second) where a DuckDB aggregate silently widens past BIGINT.

DuckDB types `sum(BIGINT)` as HUGEINT; pandas renders HUGEINT as float64 or
object, so the driver's formatted-value hash can never match Spark's int64
even when the numbers are identical.  The repo convention is to wrap every
final integer aggregate in CAST(... AS BIGINT).  This lint makes the escape
impossible: it DESCRIBEs every oracle SQL against the sf0.001 tables and
fails on any HUGEINT / UHUGEINT output column.

Usage: python3 tools/oracle_lint.py [oracle_sql.json] [sf_dir]
Default oracle source: /tmp/verify_out/oracle_sql.json (written by graft.Verify).
"""
import json, sys
import duckdb

ORACLE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(ORACLE))
bad = []
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(sql)
        cols = list(zip(rel.columns, [str(t) for t in rel.types]))
    except Exception as e:
        bad.append((name, "?", f"oracle error: {str(e)[:160]}"))
        continue
    for col, typ in cols:
        if "HUGEINT" in typ.upper():
            bad.append((name, col, typ))

if bad:
    for name, col, typ in bad:
        print(f"LINT {name}: column {col} is {typ} — wrap in CAST(... AS BIGINT)")
    print(f"\n{len(bad)} HUGEINT escapes across {len(oracle)} oracles")
    sys.exit(1)
print(f"OK: {len(oracle)} oracles, no HUGEINT/UHUGEINT output columns")
