#!/usr/bin/env python3
"""Self-check harness mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each table parquet as a DuckDB view, runs every oracle SQL from
oracle_sql.json, and compares with the Spark result parquet: columns sorted
by name, rows sorted by all columns, exact match on values (doubles must be
bit-identical after the 6dp rounding both sides apply).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{q}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {q}: {e}")
        fails += 1
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {q}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    schema_diff = [(c, str(got[c].dtype), str(exp[c].dtype))
                   for c in exp.columns if str(got[c].dtype) != str(exp[c].dtype)]
    if len(exp) != len(got):
        print(f"FAIL {q}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    exp_s = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got_s = got.sort_values(list(got.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False,
                                      check_exact=True)
        note = f" (dtype diff: {schema_diff})" if schema_diff else ""
        print(f"OK   {q}: {len(got)} rows{note}")
    except AssertionError as e:
        print(f"FAIL {q}: {str(e).splitlines()[-1]}")
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
