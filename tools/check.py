#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify via sbt,
then compare each dumped parquet against the DuckDB oracle on the same
scale-factor directory. Usage: tools/check.py [sfDir] [outDir] [--skip-verify]
"""
import json, subprocess, sys, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = ""
if "--only" in sys.argv:  # comma-separated query-name prefixes
    only = sys.argv[sys.argv.index("--only") + 1]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {sf} {out} {only}'.strip()],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:]); sys.exit(1)

import duckdb

def fresh_con():
    # A single shared connection accumulates allocator state across 200+
    # oracle evaluations and eventually dies "Failed to allocate block"
    # at sf0.1 (observed round 7: everything after q1xx errored). A
    # fresh connection per query + an explicit memory limit with a
    # spill directory keeps each oracle's footprint independent.
    c = duckdb.connect()
    c.execute("SET memory_limit='64GB'")
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = bad = 0
for name in sorted(oracle):
    sql = oracle[name]
    con = fresh_con()
    pq = f"{out}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"MISS  {name}: no spark output"); bad += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"ERR   {name}: {e}"); bad += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA {name}: {list(got.columns)} vs {list(want.columns)}"); bad += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(g) != len(w):
        print(f"ROWS  {name}: spark={len(g)} oracle={len(w)}"); bad += 1; continue
    if not g.equals(w):
        diff = (g != w) & ~(g.isna() & w.isna())
        cols = [c for c in g.columns if diff[c].any()]
        print(f"HASH  {name}: differing cols {cols}")
        for c in cols[:2]:
            idx = diff[c].idxmax()
            print(f"      {c}[{idx}]: spark={g[c][idx]!r} oracle={w[c][idx]!r}")
        bad += 1; continue
    print(f"OK    {name} ({len(g)} rows)"); ok += 1
    con.close()

print(f"\n{ok} ok, {bad} bad")
sys.exit(1 if bad else 0)
