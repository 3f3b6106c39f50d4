#!/usr/bin/env python3
"""Scale curve: per-query and per-family growth factors from BENCH_FULL
artifacts at sf0.1 -> sf1 -> sf10 (10x data per step), optionally
extended to a third decade (sf100) for the queries measured there.

Usage: scale_curve.py <bench_sf01.json> <bench_sf1.json> <bench_sf10.json> \
                      [out.json] [bench_sf100.json]

Only queries present in the FIRST THREE artifacts enter the curve (the
sf10 artifact is a subset run: the ~15 worst sf1 scalers + one
representative per family); the sf100 columns are filled where that
subset-of-a-subset was measured. Queries carrying Bench's fail sentinel
(1e9) in ANY artifact are excluded and reported — a failed pass must
error out of the curve, not poison geomeans.
"""
import sys, json, math
import fixture_stamp

FAMILIES = {
    "span dedup (linear gram build)": ["q_dup_spans"],
    "explode_json fuzz": ["q_fuzz_76", "q_fuzz_77"],
    "multimodal decode": ["q_multimodal_features"],
    "per-row JSON parse": ["q_filter_json_xpath"],
    "row-linear output": ["q_agg_collapse_false", "q_explode_json_flat",
                          "q_cumsum_global", "q_zorder_value",
                          "q_text_token_count", "q_text_lang_id"],
    "minhash/simhash dedup": ["q_dedup_simhash", "q_dedup_simhash_hamming",
                              "q_dedup_minhash_lsh", "q_dedup_exact"],
    "iterative CC / graph": ["q_graph_cc", "q_dedup_minhash_cc",
                             "q_dedup_elect", "q_dedup_elect_str"],
    "curation pipeline": ["q_curation_pipeline"],
    "ANN topk": ["q_sim_bruteforce_topk", "q_sim_lsh_topk", "q_sim_ivf_topk"],
    "streaming": ["q_stream_window_agg", "q_stream_dedup", "q_stream_distinct"],
    "sketches (mergeable)": ["q_hll_distinct_union", "q_theta_overlap",
                             "q_kll_quantiles"],
    "core agg/join/window": ["q_agg_basic", "q_inner_join",
                             "q_window_aggregate_ref", "q_topk_per_group"],
    "range join": ["q_range_join_overlap"],
    "sampling/mixing": ["q_weighted_sample", "q_sample_class_cap",
                        "q_mix_by_source"],
    "skew": ["q_salted_join", "q_skew_aqe_join"],
    "fuzz (span)": ["q_fuzz_71"],
    "packing": ["q_pack_greedy"],
    "partition-pruned scan": ["q_etl_scan"],
}


def geomean(xs):
    xs = [x for x in xs if x > 0]
    return math.exp(sum(math.log(x) for x in xs) / len(xs)) if xs else float("nan")


FAIL_SENTINEL = 1e8  # Bench records 1e9 for a failed pass


def main():
    paths = {"sf01": sys.argv[1], "sf1": sys.argv[2], "sf10": sys.argv[3]}
    full = {k: json.load(open(p)) for k, p in paths.items()}
    if len(sys.argv) > 5:
        paths["sf100"] = sys.argv[5]
        full["sf100"] = json.load(open(sys.argv[5]))
    a01, a1, a10 = full["sf01"]["queries"], full["sf1"]["queries"], \
        full["sf10"]["queries"]
    a100 = full["sf100"]["queries"] if "sf100" in full else {}
    # every growth factor names its numerator/denominator artifact — the
    # paths AND each artifact's shuffle_partitions land in the output so
    # a "9.5x at the third decade" claim is reproducible from the curve
    # file alone (round-13 verdict: growth claims must name denominators)
    artifacts = {k: {"path": paths[k],
                     "shuffle_partitions": full[k].get("shuffle_partitions"),
                     "passes": full[k].get("passes"),
                     "fixture_fingerprint":
                         full[k].get("fixture", {}).get("fingerprint"),
                     # box-speed stamp (round-17): the pinned calibration
                     # jar's score measured right before this sweep — a
                     # slow box-hour for ONE decade shows up here, before
                     # anyone argues about growth factors
                     "calib_score_sec":
                         full[k].get("calibration", {}).get("score_sec")}
                 for k in paths}
    calibs = {k: a["calib_score_sec"] for k, a in artifacts.items()
              if a["calib_score_sec"]}
    if calibs:
        base = min(calibs.values())
        rel = {k: round(v / base, 3) for k, v in sorted(calibs.items())}
        print(f"box-speed calibration per decade (score_sec, lower=faster): "
              f"{calibs} — relative {rel}")
        spread = max(calibs.values()) / base
        if spread > 1.1:
            print(f"NOTE: calibration spread {spread:.2f}x across decades — "
                  "growth factors include a measured box-speed drift; "
                  "compare per-decade numbers against their calib stamps")
    # fixture integrity (round-16): REFUSE to divide artifacts that were
    # measured against different bytes than the committed pins — a
    # regenerated fixture changes row-group layout and invalidates the
    # growth factors (up to 11x on scan-bound gates, round 14). Artifacts
    # predating the stamp (no "fixture" field) pass with a warning.
    bad = []
    for k in paths:
        fx = full[k].get("fixture")
        if fx is None:
            print(f"WARNING: {paths[k]} has no fixture stamp "
                  "(pre-round-16 artifact) — pin not verifiable")
            continue
        ok, msg = fixture_stamp.check_pin(fx.get("dir", full[k].get("sf", "")),
                                          fx.get("fingerprint"), who=paths[k])
        if not ok:
            print(f"REFUSING: {msg}")
            bad.append(k)
    if bad:
        sys.exit(f"scale_curve: fixture fingerprint mismatch in "
                 f"{[paths[k] for k in bad]} — growth factors across a "
                 "regeneration are not comparable; re-pin deliberately "
                 "with fixture_stamp.py --pin if intended")
    common = sorted(set(a01) & set(a1) & set(a10))
    rows, dropped, dropped_sf100_only = [], [], []
    for q in common:
        t01, t1, t10 = a01[q]["best"], a1[q]["best"], a10[q]["best"]
        t100 = a100[q]["best"] if q in a100 else None
        if any(t >= FAIL_SENTINEL for t in (t01, t1, t10)):
            dropped.append(q)
            continue
        # a fail sentinel ONLY in the optional sf100 column keeps the
        # row's valid three-decade measurements (ADVICE r13: dropping the
        # whole row silently shifted per-family geomeans vs prior curves)
        if t100 is not None and t100 >= FAIL_SENTINEL:
            dropped_sf100_only.append(q)
            t100 = None
        row = {"query": q, "sf01": round(t01, 3), "sf1": round(t1, 3),
               "sf10": round(t10, 3),
               "g_01_1": round(t1 / t01, 2), "g_1_10": round(t10 / t1, 2),
               "g_01_10": round(t10 / t01, 2)}
        if t100 is not None:
            row["sf100"] = round(t100, 3)
            row["g_10_100"] = round(t100 / t10, 2)
        rows.append(row)
    if dropped:
        print(f"EXCLUDED (fail sentinel in sf0.1/sf1/sf10): {dropped}")
    if dropped_sf100_only:
        print("sf100 column omitted (fail sentinel there only; "
              f"sf0.1/sf1/sf10 kept): {dropped_sf100_only}")
    rows.sort(key=lambda r: -r["g_1_10"])
    print(f"{'query':36s} {'sf0.1':>7s} {'sf1':>7s} {'sf10':>8s} "
          f"{'x(.1->1)':>9s} {'x(1->10)':>9s} {'x(100x)':>8s} "
          f"{'sf100':>8s} {'x(10->100)':>10s}")
    for r in rows:
        third = (f"{r['sf100']:8.2f} {r['g_10_100']:10.2f}"
                 if "sf100" in r else f"{'-':>8s} {'-':>10s}")
        print(f"{r['query']:36s} {r['sf01']:7.2f} {r['sf1']:7.2f} "
              f"{r['sf10']:8.2f} {r['g_01_1']:9.2f} {r['g_1_10']:9.2f} "
              f"{r['g_01_10']:8.2f} {third}")
    by_q = {r["query"]: r for r in rows}
    fams = {}
    for fam, qs in FAMILIES.items():
        got = [by_q[q] for q in qs if q in by_q]
        if not got:
            continue
        fams[fam] = {
            "queries": [r["query"] for r in got],
            "geomean_g_01_1": round(geomean([r["g_01_1"] for r in got]), 2),
            "geomean_g_1_10": round(geomean([r["g_1_10"] for r in got]), 2),
            "geomean_g_01_10": round(geomean([r["g_01_10"] for r in got]), 2),
        }
        third = [r["g_10_100"] for r in got if "g_10_100" in r]
        if third:
            fams[fam]["geomean_g_10_100"] = round(geomean(third), 2)
            fams[fam]["queries_at_sf100"] = [
                r["query"] for r in got if "g_10_100" in r]
    unassigned = [q for q in by_q if not any(q in qs for qs in FAMILIES.values())]
    print("\nper-family geomean growth (sf0.1->sf1, sf1->sf10, 100x):")
    for fam, f in sorted(fams.items(), key=lambda kv: -kv[1]["geomean_g_1_10"]):
        print(f"  {fam:34s} {f['geomean_g_01_1']:6.2f} {f['geomean_g_1_10']:6.2f} "
              f"{f['geomean_g_01_10']:7.2f}")
    if unassigned:
        print(f"\nunassigned (reported per-query only): {unassigned}")
    tot = {k: round(sum(r[k] for r in rows), 1) for k in ("sf01", "sf1", "sf10")}
    at100 = [r for r in rows if "sf100" in r]
    if at100:
        tot["sf100_subset"] = round(sum(r["sf100"] for r in at100), 1)
        tot["sf10_of_sf100_subset"] = round(sum(r["sf10"] for r in at100), 1)
    out = {"note": "best-of-pass wall seconds per query at three (four "
                   "where measured) scale factors, 10x data per step; "
                   "subset = worst sf1 scalers + one representative per "
                   "family; sf100 columns only for the third-decade "
                   "subset run. Every growth factor g_A_B divides the "
                   "'best' fields of the two artifacts named in "
                   "'artifacts' (with their shuffle_partitions settings) "
                   "— compare bands, not bests, per SCALE.md.",
           "artifacts": artifacts,
           "queries_in_curve": len(rows),
           "queries_at_sf100": len(at100),
           "excluded_fail_sentinel": dropped,
           "excluded_fail_sentinel_sf100_only": dropped_sf100_only,
           "subset_totals_sec": tot,
           "subset_wall_growth": {
               "g_01_1": round(tot["sf1"] / tot["sf01"], 2),
               "g_1_10": round(tot["sf10"] / tot["sf1"], 2),
               "g_01_10": round(tot["sf10"] / tot["sf01"], 2),
               **({"g_10_100_subset": round(tot["sf100_subset"]
                    / tot["sf10_of_sf100_subset"], 2)} if at100 else {})},
           "per_query": rows, "per_family": fams}
    if len(sys.argv) > 4:
        json.dump(out, open(sys.argv[4], "w"), indent=1)
        print(f"\nwrote {sys.argv[4]}")


if __name__ == "__main__":
    main()
