#!/usr/bin/env python3
"""Run every oracle SQL from SparkEntry.scala against DuckDB on a test
SF dir — catches dialect errors before the driver does. (Driver-side
python/duckdb is available in the container; this never ships with the
library.)"""
import duckdb, re, sys, json

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

src = open("/root/repo/src/main/scala/graft/SparkEntry.scala").read()
# extract "name" -> """sql""" pairs
pairs = re.findall(r'"(\w+)" ->\s*\n?\s*"""(.*?)"""\.stripMargin', src, re.S)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
ok = fail = 0
for name, sql in pairs:
    sql = re.sub(r"^\s*\|", "", sql, flags=re.M)
    try:
        df = con.execute(sql).fetchdf()
        print(f"OK   {name}: {len(df)} rows, cols={list(df.columns)}, dtypes={[str(t) for t in df.dtypes]}")
        ok += 1
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:300]}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
