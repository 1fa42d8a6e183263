#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Spark
result parquet from Verify's outDir, run the matching oracle SQL in
DuckDB over the same SF tables, sort columns by name, compare values.
Usage: compare.py <sfDir> <outDir>"""
import duckdb, json, sys, math
import pandas as pd

sfDir, outDir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfDir}/{t}.parquet'")
oracle = json.load(open(f"{outDir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # sort on non-float columns only: cross-engine floats can differ
    # within tolerance, and using them as sort keys would misalign rows
    keys = [c for c in df.columns if df[c].dtype.kind != 'f']
    if not keys:  # all-float frame: sort on rounded copies, compare originals
        for c in list(df.columns):
            df['_sk_' + c] = df[c].round(6)
        keys = [c for c in df.columns if c.startswith('_sk_')]
    df = df.sort_values(by=keys, kind='mergesort').reset_index(drop=True)
    return df[[c for c in df.columns if not c.startswith('_sk_')]]

ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        want = canon(con.execute(sql).fetchdf())
        got = canon(con.execute(f"SELECT * FROM '{outDir}/{name}/*.parquet'").fetchdf())
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} got={list(got.columns)}")
            fail += 1; continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            fail += 1; continue
        mismatch = None
        for c in want.columns:
            w, g = want[c], got[c]
            if w.dtype.kind == 'f' or g.dtype.kind == 'f':
                bad = ~((w.isna() & g.isna()) | (abs(w.astype(float) - g.astype(float)) < 1e-9))
            else:
                bad = ~((w.isna() & g.isna()) | (w.astype(str) == g.astype(str)))
            if bad.any():
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: want={w[i]!r} got={g[i]!r} ({int(bad.sum())} bad)"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); fail += 1
        else:
            # dtype check: the driver may hash dtype-sensitively
            dt = [(c, str(want[c].dtype), str(got[c].dtype)) for c in want.columns
                  if str(want[c].dtype) != str(got[c].dtype)]
            note = f"  [dtype diff: {dt}]" if dt else ""
            print(f"OK   {name}: {len(want)} rows{note}"); ok += 1
    except Exception as e:
        print(f"ERR  {name}: {str(e)[:250]}"); fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
