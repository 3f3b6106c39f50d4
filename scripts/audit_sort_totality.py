#!/usr/bin/env python3
"""Audit that every gate's ORDER BY determines its output rows.

The driver compare is row-by-row, so a gate whose sort keys do NOT
functionally determine the full output row is tie-fragile: both engines
sort correctly, but tie order within duplicate key groups is
engine-dependent and the compare flakes once ties with differing values
materialize (the synthetic lineitem has duplicate (l_orderkey,
l_linenumber) pairs at every SF — found the hard way at sf1, see
ROUND_NOTES round-6 item 13).

For each query output under <verifyOutDir>: parse the oracle's final
ORDER BY, group the output by those keys, and flag any group carrying
more than one distinct remaining-column tuple. Run against a scale big
enough for ties to exist (sf0.01+; sf1 output is the strongest signal).

Usage: audit_sort_totality.py <verifyOutDir>
"""
import json, os, re, sys
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
fragile, skipped = [], []
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        skipped.append((name, "no output"))
        continue
    s = sql.strip()
    i = s.upper().rfind("ORDER BY")
    if i < 0:
        skipped.append((name, "no order by"))
        continue
    # key = last path segment of each comma-separated term, stripped of
    # quotes, casts, and direction/null modifiers
    keys = []
    for term in s[i + len("ORDER BY"):].split(","):
        t = term.strip().split()[0]          # drop ASC/DESC/NULLS ...
        t = t.split("::")[0]                 # drop ::CAST
        t = t.split(".")[-1]                 # drop table qualifier
        keys.append(t.strip('"'))
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{pq}/*.parquet'").fetchall()]
    keys = [k for k in keys if k in cols]
    others = [c for c in cols if c not in keys]
    if not keys:
        skipped.append((name, "keys unparsed"))
        continue
    if not others:
        continue  # sort covers every column: total by construction
    kq = ", ".join(f'"{k}"' for k in keys)
    oq = ", ".join(f'"{c}"' for c in others)
    n = con.execute(
        f"""SELECT count(*) FROM (
              SELECT {kq} FROM '{pq}/*.parquet'
              GROUP BY {kq} HAVING count(DISTINCT ({oq})) > 1)""").fetchone()[0]
    if n > 0:
        fragile.append((name, n))

print(f"FRAGILE {len(fragile)}:")
for n, c in fragile:
    print(f"  {n}: {c} sort-key groups with differing values")
if skipped:
    print("skipped:", skipped)
sys.exit(1 if fragile else 0)
