#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Verify.scala
parquet dumps (columns sorted by name, rows sorted, values compared
exactly). Dev tool only — not part of the library."""
import sys, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(oracles):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING {name}: no spark output"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        exp = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"ERROR  {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
        fail += 1; continue
    gs = got.sort_values(by=list(got.columns), na_position="first").reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns), na_position="first").reset_index(drop=True)
    if len(gs) != len(es):
        print(f"ROWS   {name}: spark={len(gs)} oracle={len(es)}"); fail += 1; continue
    # exact value compare (mimics hash compare, worst case)
    import pandas as pd
    try:
        pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
        print(f"OK     {name} ({len(gs)} rows)")
    except AssertionError as e:
        print(f"VALUES {name}: {str(e).splitlines()[-1][:200]}"); fail += 1
print(f"\n{len(oracles)-fail}/{len(oracles)} match")
sys.exit(1 if fail else 0)
