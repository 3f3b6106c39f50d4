#!/usr/bin/env python3
"""sf100 value sweep for the third-decade gate subset.

Checks the 14 gates benchmarked at sf100 (600M-row lineitem, 150M orders,
5M documents, 10M embeddings) against their COMMITTED oracle SQL, with
the check method each gate's scale regime requires — same honesty rules
as the sf10 sweep (SF10_CHECK_r12.json):

  exact       — pandas row compare, identical to check_oracle.py, for
                gates whose outputs stay small and whose values stay in
                the engines' exact regime.
  fingerprint — exact MULTISET equality via a DuckDB-side hash
                fingerprint (count + sum(hash(row-as-varchars))) for the
                two huge-output gates (q_zorder_value: 600M rows,
                q_topk_per_group: ~45M rows) where a pandas materialize
                is impossible. Same strength as the driver's own hash
                compare; a single differing row flips the sum with
                probability 1 - 2^-64.
  relative    — per-cell compare with 1e-9 RELATIVE tolerance for the
                round(sum(...), 2) gates: at 600M rows the sums reach
                ~1e12, where the last-bits order dependence of double
                addition on BOTH engines exceeds the 2-decimal rounding
                (a wrong aggregation is >> 1e-9). Tried exact FIRST;
                recorded as exact when exact passes.
  rank-bound  — q_kll_quantiles: KLL(k=8192) left its exact regime at
                sf10 already; each reported quantile's normalized rank in
                the exact sorted multiset must be within 0.005 of the
                requested rank (theoretical bound at k=8192 ~6e-4).
  replay      — q_pack_greedy: the committed oracle's recursive CTE is
                impractical at this row count; sf1_check.py re-runs the
                SAME oracle SQL with only the recurrence swapped for an
                exact linear Python replay (the sf1/sf10 pattern).

Usage: sf100_check.py <sfDir> <verifyOutDir> [SF100_CHECK_out.json]
Exit 0 iff every gate passes.
"""
import sys, json, glob, os, subprocess
import duckdb

# label for the artifact provenance fields: REQUIRED so a round that
# forgets to export it cannot silently stamp stale provenance (ADVICE r14)
ROUND_LABEL = os.environ.get("SF100_ROUND_LABEL")
if not ROUND_LABEL:
    sys.exit("SF100_ROUND_LABEL is not set — export it (e.g. 'round 15') "
             "so the artifact's provenance fields cannot go stale")

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out_json = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
con.execute("SET memory_limit='48GB'")
con.execute("SET threads=32")
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

EXACT = ["q_dedup_exact", "q_etl_scan", "q_hll_distinct_union",
         "q_mix_by_source", "q_range_join_overlap", "q_sim_lsh_topk",
         "q_theta_overlap", "q_weighted_sample"]
TRY_EXACT_THEN_RELATIVE = ["q_agg_basic", "q_inner_join"]
FINGERPRINT = ["q_zorder_value", "q_topk_per_group"]
RANK_BOUND = ["q_kll_quantiles"]
REPLAY = ["q_pack_greedy"]

# Optional gate subset (round-17: the sfBIG fifth-decade run checks only
# the gates its disk budget allowed) — SF100_GATES="g1,g2" restricts
# every method list; unset = the full 14-gate sf100 protocol.
_gates_env = os.environ.get("SF100_GATES")
if _gates_env:
    _only = set(g.strip() for g in _gates_env.split(",") if g.strip())
    EXACT = [g for g in EXACT if g in _only]
    TRY_EXACT_THEN_RELATIVE = [g for g in TRY_EXACT_THEN_RELATIVE if g in _only]
    FINGERPRINT = [g for g in FINGERPRINT if g in _only]
    RANK_BOUND = [g for g in RANK_BOUND if g in _only]
    REPLAY = [g for g in REPLAY if g in _only]
    _known = set(EXACT + TRY_EXACT_THEN_RELATIVE + FINGERPRINT +
                 RANK_BOUND + REPLAY)
    _unknown = _only - _known
    if _unknown:
        sys.exit(f"SF100_GATES names gates with no check method: "
                 f"{sorted(_unknown)}")

results, fails = {}, []


def cols_of(rel):
    return [d[0] for d in con.execute(f"SELECT * FROM {rel} LIMIT 0").description]


def exact_check(gate):
    got = con.execute(f"SELECT * FROM '{out_dir}/{gate}/*.parquet'").fetchdf()
    exp = con.execute(oracle[gate]).fetchdf()
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    assert list(got.columns) == list(exp.columns), \
        f"schema: {list(got.columns)} vs {list(exp.columns)}"
    assert len(got) == len(exp), f"rows: {len(got)} vs {len(exp)}"
    assert len(got) > 0, "vacuous: both empty"
    g = got.map(lambda v: f"{v}")
    e = exp.map(lambda v: f"{v}")
    neq = (g.values != e.values)
    assert not neq.any(), \
        "first diff: " + str([(r, c) for r in neq.any(axis=1).nonzero()[0][:2]
                              for c in g.columns[neq[r]].tolist()])
    return {"method": "exact", "rows": len(got)}


def relative_check(gate, tol=1e-9):
    got = con.execute(f"SELECT * FROM '{out_dir}/{gate}/*.parquet'").fetchdf()
    exp = con.execute(oracle[gate]).fetchdf()
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    assert list(got.columns) == list(exp.columns), "schema"
    assert len(got) == len(exp) and len(got) > 0, "rows"
    worst = 0.0
    for c in got.columns:
        for a, b in zip(got[c], exp[c]):
            if isinstance(a, str) or isinstance(b, str):
                assert f"{a}" == f"{b}", f"{c}: {a!r} != {b!r}"
            else:
                fa, fb = float(a), float(b)
                d = abs(fa - fb) / max(abs(fa), abs(fb), 1.0)
                assert d <= tol, f"{c}: {fa} vs {fb} rel {d:.2e} > {tol}"
                worst = max(worst, d)
    return {"method": "relative", "rows": len(got),
            "worst_relative_diff": worst, "bound": tol}


def fingerprint_check(gate):
    """Exact multiset equality of (all columns stringified) via
    count + sum-of-row-hashes, computed streaming on both sides."""
    spark_rel = f"(SELECT * FROM '{out_dir}/{gate}/*.parquet')"
    got_cols = cols_of(spark_rel)
    con.execute(f"CREATE OR REPLACE VIEW _oracle_{gate} AS {oracle[gate]}")
    exp_cols = cols_of(f"_oracle_{gate}")
    assert sorted(got_cols) == sorted(exp_cols), \
        f"schema: {sorted(got_cols)} vs {sorted(exp_cols)}"
    def fp(rel, cols):
        hl = ", ".join(f'CAST("{c}" AS VARCHAR)' for c in sorted(cols))
        n, h = con.execute(
            f"SELECT count(*), sum(hash({hl})::HUGEINT) FROM {rel}").fetchone()
        return int(n), int(h)
    gn, gh = fp(spark_rel, got_cols)
    en, eh = fp(f"_oracle_{gate}", exp_cols)
    assert gn == en, f"rows: {gn} vs {en}"
    assert gn > 0, "vacuous"
    assert gh == eh, f"multiset hash: {gh} vs {eh}"
    return {"method": "fingerprint", "rows": gn,
            "detail": "count + sum(hash(all cols as varchar)) multiset "
                      "equality, both sides computed in DuckDB"}


def kll_rank_check(gate, bound=0.005):
    got = con.execute(f"SELECT * FROM '{out_dir}/{gate}/*.parquet'").fetchdf()
    assert len(got) > 0, "empty"
    # derive the exact multiset from the COMMITTED oracle's own CTE (its
    # shape is `WITH v AS (<multiset select>) SELECT ...quantile ranks...`)
    # so a change to the gate's predicate/value expression changes this
    # check with it instead of silently desynchronizing (ADVICE r13)
    import re
    m = re.search(r"WITH v AS\s*\((.+?)\)\s*SELECT", oracle[gate],
                  re.S | re.I)
    assert m, (f"{gate} oracle no longer matches 'WITH v AS (...) SELECT'; "
               "update kll_rank_check to re-derive its multiset")
    multiset_sql = m.group(1)
    worst = 0.0
    for _, r in got.iterrows():
        flag = r["l_returnflag"]
        vals = con.execute(
            f"""SELECT v FROM ({multiset_sql})
                WHERE l_returnflag = ? ORDER BY v""",
            [flag]).fetchdf()["v"].to_numpy()
        n = len(vals)
        assert n == int(r["n_rows"]), f"{flag}: n {n} != {r['n_rows']}"
        import numpy as np
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            v = float(r[col])
            assert (vals == v).any(), f"{flag} {col}: {v} not in multiset"
            rank_hi = np.searchsorted(vals, v, side="right") / n
            rank_lo = (np.searchsorted(vals, v, side="left") + 1) / n
            err = min(abs(rank_hi - q), abs(rank_lo - q),
                      0.0 if rank_lo <= q <= rank_hi else 1.0)
            assert err <= bound, f"{flag} {col}: rank err {err:.4f} > {bound}"
            worst = max(worst, err)
    return {"method": "rank-bound", "groups": len(got),
            "worst_rank_error": round(worst, 6), "bound": bound, "k": 8192}


for gate in EXACT:
    try:
        results[gate] = exact_check(gate)
        print(f"PASS {gate} (exact, {results[gate]['rows']} rows)", flush=True)
    except Exception as e:
        fails.append(gate)
        results[gate] = {"method": "exact", "status": "FAIL", "err": str(e)[:400]}
        print(f"FAIL {gate}: {e}", flush=True)

for gate in TRY_EXACT_THEN_RELATIVE:
    try:
        try:
            results[gate] = exact_check(gate)
            print(f"PASS {gate} (exact, {results[gate]['rows']} rows)", flush=True)
        except AssertionError:
            results[gate] = relative_check(gate)
            print(f"PASS {gate} (relative, worst "
                  f"{results[gate]['worst_relative_diff']:.2e})", flush=True)
    except Exception as e:
        fails.append(gate)
        results[gate] = {"method": "relative", "status": "FAIL", "err": str(e)[:400]}
        print(f"FAIL {gate}: {e}", flush=True)

for gate in FINGERPRINT:
    try:
        results[gate] = fingerprint_check(gate)
        print(f"PASS {gate} (fingerprint, {results[gate]['rows']} rows)", flush=True)
    except Exception as e:
        fails.append(gate)
        results[gate] = {"method": "fingerprint", "status": "FAIL", "err": str(e)[:400]}
        print(f"FAIL {gate}: {e}", flush=True)

for gate in RANK_BOUND:
    try:
        results[gate] = kll_rank_check(gate)
        print(f"PASS {gate} (rank-bound, worst "
              f"{results[gate]['worst_rank_error']})", flush=True)
    except Exception as e:
        fails.append(gate)
        results[gate] = {"method": "rank-bound", "status": "FAIL", "err": str(e)[:400]}
        print(f"FAIL {gate}: {e}", flush=True)

for gate in REPLAY:
    rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "sf1_check.py"),
         sf_dir, out_dir, gate]).returncode
    if rc == 0:
        results[gate] = {"method": "replay",
                         "detail": "sf1_check.py linear replay of the "
                                   "committed oracle's recurrence"}
        print(f"PASS {gate} (replay)", flush=True)
    else:
        fails.append(gate)
        results[gate] = {"method": "replay", "status": "FAIL"}
        print(f"FAIL {gate} (replay rc={rc})", flush=True)

summary = {
    "note": f"Big-fixture value sweep ({ROUND_LABEL}) at {sf_dir}"
            + (f", gate subset {sorted(_only)}" if _gates_env else
               ": the 14-gate third-decade subset")
            + ". Verify outputs value-checked against the committed oracle "
            "SQL run directly in DuckDB over the same tables. Methods per "
            "gate follow the same honesty rules as the sf10 sweep; "
            "'fingerprint' is exact multiset equality via a DuckDB-side "
            "row-hash sum for outputs too large to materialize in pandas.",
    "generated": ROUND_LABEL,
    "fixture": __import__("fixture_stamp").stamp(sf_dir),
    "total": len(results),
    "fail": len(fails),
    "by_method": {m: sum(1 for r in results.values()
                         if r["method"] == m and "status" not in r)
                  for m in ("exact", "relative", "fingerprint",
                            "rank-bound", "replay")},
    "detail": results,
}
print(json.dumps({k: v for k, v in summary.items() if k != "detail"}, indent=1))
if out_json:
    json.dump(summary, open(out_json, "w"), indent=1)
    print(f"wrote {out_json}")
sys.exit(1 if fails else 0)
