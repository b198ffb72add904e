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

# DuckDB types the driver's hash compare cannot reconcile with Spark's
# int64/float64 output: HUGEINT (sum of integers) fetches as float64 but
# hashes as a distinct dtype, DECIMAAL literals (e.g. `0.0 AS x`) fetch as
# DECIMAL(n,m). Any oracle emitting one is a latent red row even if today's
# values happen to compare equal — fail loudly here so it never ships.
BAD_DUCK_TYPES = ("HUGEINT", "DECIMAL", "UHUGEINT")

def kind(dt):
    """Normalize a pandas dtype to a comparison kind: all int widths are one
    family (the driver compares values, not widths), everything else exact."""
    k = dt.kind
    return 'i' if k in ('i', 'u') else k

for q, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, q)
    if not os.path.isdir(spark_dir):
        print(f"[MISS] {q}: no spark output"); fails += 1; continue
    try:
        duck_types = con.execute(f"DESCRIBE {sql}").fetchdf()
        skewed = [(r["column_name"], r["column_type"])
                  for _, r in duck_types.iterrows()
                  if any(r["column_type"].upper().startswith(b) for b in BAD_DUCK_TYPES)]
        if skewed:
            print(f"[DTYPE] {q}: oracle emits driver-unreconcilable DuckDB "
                  f"types {skewed} — add explicit CASTs in the oracle SQL")
            fails += 1; continue
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
    kskew = [(c, str(o[c].dtype), str(s[c].dtype)) for c in o.columns
             if kind(o[c].dtype) != kind(s[c].dtype)]
    if kskew:
        print(f"[DTYPE] {q}: oracle/spark dtype-kind mismatch {kskew}")
        fails += 1; continue
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
