#!/usr/bin/env python3
"""sf1 value-proof for the recursive-CTE oracle tail.

DuckDB's recursive CTEs are impractical on the CC/greedy oracles at sf1:
the `reach` transitive closure materializes |component|^2 rows per
cluster (one sf1 CC CTE ran 45+ min without finishing in the round-6
sweep), and pack_greedy's recurrence iterates once per row. This script
value-checks those gates at sf1 by running the SAME committed oracle SQL
with ONLY the recursive block swapped for an exact, linear-time Python
replacement:

  - a union-find (path-halving, min-label components) over the `edges`
    CTE — which is computed in DuckDB, non-recursively, from the
    unchanged upstream SQL — replaces the `reach`/`comp` closure block;
  - a linear Python replay replaces the pack_greedy recurrence.

Everything upstream and downstream of the closure still runs in DuckDB,
so the check exercises the full oracle pipeline, and `min(r)` label
semantics are preserved exactly (python min == DuckDB min for both the
integer ids and q_graph_cc's zero-padded strings).

Usage: sf1_check.py <sfDir> <verifyOutDir> [gate ...]
  (no gates -> the whole recursive tail below)
"""
import sys, json, glob, os, re
import duckdb

CC_GATES = [
    "q_dedup_minhash_cc", "q_dedup_cluster_sizes", "q_dedup_elect",
    "q_curation_pipeline", "q_dedup_simhash_hamming", "q_dedup_embed_cc",
]
SPECIAL_GATES = ["q_graph_cc", "q_pack_greedy"]
ALL_GATES = CC_GATES + SPECIAL_GATES

# the exact ccClosureCtes text the Scala oracle builder emits (whitespace
# varies with interpolation depth -> match it flexibly)
CLOSURE_RE = re.compile(
    r"sym\s+AS\s+\(SELECT\s+src\s+AS\s+a.*?"
    r"comp\s+AS\s+\(SELECT\s+id,\s*min\(r\)\s+AS\s+component\s+FROM\s+reach\s+GROUP\s+BY\s+id\)",
    re.S)
# q_graph_cc inlines the closure and SELECTs from reach directly
GRAPH_CC_RE = re.compile(r"sym\s+AS\s+\(SELECT\s+src\s+AS\s+a.*$", re.S)


def union_find(pairs):
    """Min-label connected components over (a, b) pairs."""
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:           # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo             # min label becomes the root
    return {n: find(n) for n in parent}


def compare(con, name, pq_dir, expected_rel):
    """Driver-style compare: sort columns by name, stringify, row equality."""
    got = con.execute(f"SELECT * FROM '{pq_dir}/*.parquet'").fetchdf()
    exp = expected_rel.fetchdf()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA: spark={list(got.columns)} oracle={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS: spark={len(got)} oracle={len(exp)}"
    g = got.map(lambda v: f"{v}")
    e = exp.map(lambda v: f"{v}")
    neq = (g.values != e.values)
    if neq.any():
        r = neq.any(axis=1).nonzero()[0][:3]
        diffs = []
        for ri in r:
            for ci, c in enumerate(g.columns):
                if neq[ri, ci]:
                    diffs.append(
                        f"row{ri} {c}: spark={g.iloc[ri, ci]!r} oracle={e.iloc[ri, ci]!r}")
        return "VALUES: " + "; ".join(diffs[:4])
    return None


def check_cc_gate(con, sql, name, out_dir):
    m = CLOSURE_RE.search(sql)
    if not m:
        return "PATTERN: ccClosureCtes block not found in oracle SQL"
    # edges comes from the unchanged upstream CTE chain (non-recursive)
    prefix = sql[:m.start()].rstrip().rstrip(",")
    edges = con.execute(prefix + " SELECT src, target FROM edges").fetchall()
    comp = union_find(edges)
    con.register("__pycc", __import__("pandas").DataFrame(
        {"id": list(comp.keys()), "component": list(comp.values())}))
    patched = (sql[:m.start()]
               + "comp AS (SELECT id, component FROM __pycc)"
               + sql[m.end():])
    err = compare(con, name, f"{out_dir}/{name}", con.sql(patched))
    con.unregister("__pycc")
    return err


def check_graph_cc(con, sql, name, out_dir):
    m = GRAPH_CC_RE.search(sql)
    if not m:
        return "PATTERN: inline closure not found in q_graph_cc oracle"
    prefix = sql[:m.start()].rstrip().rstrip(",")
    edges = con.execute(prefix + " SELECT src, target FROM edges").fetchall()
    comp = union_find(edges)
    import pandas as pd
    exp = pd.DataFrame(sorted(comp.items()), columns=["node_id", "component"])
    con.register("__pycc", exp)
    err = compare(con, name, f"{out_dir}/{name}",
                  con.sql("SELECT node_id, component FROM __pycc ORDER BY node_id"))
    con.unregister("__pycc")
    return err


def check_pack_greedy(con, sql, name, out_dir, sf_dir):
    rows = con.execute(
        f"""SELECT doc_id, n_chars FROM '{sf_dir}/documents.parquet'
            WHERE doc_id % 2 = 0 ORDER BY doc_id""").fetchall()
    out, b, used = [], 0, 0
    for doc_id, n_chars in rows:
        w = max(0, n_chars or 0)
        if used > 0 and used + w > 2000:
            b, used = b + 1, w
        else:
            used += w
        out.append((doc_id, n_chars, f"0:{b}"))
    import pandas as pd
    exp = pd.DataFrame(out, columns=["doc_id", "n_chars", "bin_id"])
    con.register("__pypack", exp)
    err = compare(con, name, f"{out_dir}/{name}",
                  con.sql("SELECT * FROM __pypack ORDER BY doc_id"))
    con.unregister("__pypack")
    return err


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    gates = sys.argv[3:] or ALL_GATES
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name in gates:
        if not os.path.isdir(f"{out_dir}/{name}"):
            bad.append((name, "NO SPARK OUTPUT")); continue
        try:
            if name == "q_graph_cc":
                err = check_graph_cc(con, oracle[name], name, out_dir)
            elif name == "q_pack_greedy":
                err = check_pack_greedy(con, oracle[name], name, out_dir, sf_dir)
            else:
                err = check_cc_gate(con, oracle[name], name, out_dir)
        except Exception as e:
            err = f"CHECK ERROR: {e}"
        bad.append((name, err)) if err else ok.append(name)
    print(f"PASS {len(ok)}: {' '.join(ok)}")
    print(f"FAIL {len(bad)}:")
    for n, msg in bad:
        print(f"  {n}: {msg[:300]}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
