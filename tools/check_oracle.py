#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against DuckDB executions of oracle_sql.json on the same sf dir, compare
values with columns sorted by name (and rows sorted), report per-query."""
import sys, json, glob, os
import duckdb
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for q, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{outdir}/{q}")
        want = con.execute(sql).df()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {q}: columns {list(got.columns)} vs {list(want.columns)}")
            fail += 1
            continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        # normalize dtypes for compare
        gs = gs.astype(str)
        ws = ws.astype(str)
        if gs.equals(ws):
            ok += 1
            print(f"OK   {q}")
        else:
            fail += 1
            print(f"FAIL {q}:\n  spark={got.head(5).to_dict('records')}\n  duck ={want.head(5).to_dict('records')}")
    except Exception as e:
        fail += 1
        print(f"ERR  {q}: {e}")
print(f"\n{ok} ok, {fail} fail of {len(oracle)}")
sys.exit(1 if fail else 0)
