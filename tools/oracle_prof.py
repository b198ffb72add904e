#!/usr/bin/env python3
"""Profile each oracle SQL's DuckDB wall time over an sf dir.
Usage: oracle_prof.py <sfDir> <oracle_sql.json> [timeout_sec]
Prints one line per query sorted by cost, then the total."""
import sys, os, json, glob, time
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
times = {}
for q, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        n = len(con.execute(sql).fetchdf())
        times[q] = (time.time() - t0, n, "")
    except Exception as e:
        times[q] = (time.time() - t0, -1, str(e)[:80])
for q, (t, n, err) in sorted(times.items(), key=lambda kv: -kv[1][0]):
    print(f"{t:8.2f}s  {n:8d} rows  {q}  {err}")
print(f"TOTAL: {sum(t for t, _, _ in times.values()):.1f}s over {len(times)} queries")
