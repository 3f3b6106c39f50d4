#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs DuckDB oracle.

Mimics the driver's compare: run Verify output parquet vs oracle_sql.json
executed in DuckDB over the same sf dir; sort columns by name, compare
row-by-row. Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        bad.append((name, "NO SPARK OUTPUT")); continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"SQL ERROR: {e}")); continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        bad.append((name, f"SCHEMA: spark={list(got.columns)} oracle={list(exp.columns)}")); continue
    if len(got) != len(exp):
        bad.append((name, f"ROWS: spark={len(got)} oracle={len(exp)}")); continue
    # normalize: stringify everything the way a hash compare would
    def norm(df):
        return df.map(lambda v: f"{v}")
    g, e = norm(got), norm(exp)
    neq = (g.values != e.values)
    if neq.any():
        i, j = [x[0] for x in neq.nonzero()][:2], None
        r = neq.any(axis=1).nonzero()[0][:3]
        diffs = []
        for ri in r:
            for ci, c in enumerate(g.columns):
                if neq[ri, ci]:
                    diffs.append(f"row{ri} {c}: spark={g.iloc[ri, ci]!r} oracle={e.iloc[ri, ci]!r}")
        bad.append((name, "VALUES: " + "; ".join(diffs[:4])))
    else:
        ok.append(name)

print(f"PASS {len(ok)}: {' '.join(ok)}")
print(f"FAIL {len(bad)}:")
for n, msg in bad:
    print(f"  {n}: {msg[:300]}")
sys.exit(1 if bad else 0)
