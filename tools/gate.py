#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf-dir parquet tables, compare against the Verify parquet
dumps (columns sorted by name, rows sorted, values compared with a small
float tolerance). Usage: gate.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for q, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, q)
    if not os.path.isdir(spark_dir):
        print(f"[MISS] {q}: no spark output"); fails += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[ORACLE-ERR] {q}: {e}"); fails += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in
                     glob.glob(os.path.join(spark_dir, "*.parquet"))])
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    o, s = norm(odf), norm(sdf)
    if list(o.columns) != list(s.columns):
        print(f"[SCHEMA] {q}: oracle={list(o.columns)} spark={list(s.columns)}")
        fails += 1; continue
    if len(o) != len(s):
        print(f"[ROWS] {q}: oracle={len(o)} spark={len(s)}"); fails += 1; continue
    bad = None
    for c in o.columns:
        oc, sc = o[c], s[c]
        if oc.dtype.kind == 'f' or sc.dtype.kind == 'f':
            import numpy as np
            if not np.allclose(oc.astype(float), sc.astype(float),
                               rtol=1e-9, atol=1e-12, equal_nan=True):
                bad = c; break
        else:
            if not (oc.astype(object) == sc.astype(object)).all():
                bad = c; break
    if bad:
        m = (o[bad] != s[bad])
        print(f"[VALUES] {q}: col {bad} differs, e.g.\n{pd.concat([o[m][:3], s[m][:3]], axis=1)}")
        fails += 1
    else:
        print(f"[OK] {q}: {len(o)} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
