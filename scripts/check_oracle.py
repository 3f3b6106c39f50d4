#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs DuckDB oracle.

Mimics the driver's compare: run Verify output parquet vs oracle_sql.json
executed in DuckDB over the same sf dir; sort columns by name, compare
row-by-row. Usage: check_oracle.py <sfDir> <verifyOutDir> [--skip g1,g2]
(--skip: gates whose oracle is impractical at this scale — at sf1 the
recursive-CTE tail goes through sf1_check.py's union-find oracle instead.)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
skip = set()
only = None  # dev loop: --only=substr1,substr2 checks just matching gates
for a in sys.argv[1:]:
    if a.startswith("--skip="):
        skip = set(a.split("=", 1)[1].split(","))
    if a.startswith("--only="):
        only = a.split("=", 1)[1].split(",")
sf_dir, out_dir = args[0], args[1]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad, skipped = [], [], []
for name, sql in sorted(oracle.items()):
    if name in skip:
        skipped.append(name); continue
    if only is not None and not any(p in name for p in only):
        continue
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
    if len(got) == 0:
        # an empty-vs-empty compare proves only that both sides are empty
        # (round 9 shipped q_fuzz_43 that way; round 10 found the
        # decontaminate gates empty at sf1 only) — fail it so vacuity at
        # ANY tested SF is caught by the sweep itself, not a spot-check
        bad.append((name, "VACUOUS: both sides empty at this SF")); continue
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

# ---- value checks for the gates DuckDB SQL can't express ----
# (driver records these as rows-only; this script checks actual values)

MASK64 = (1 << 64) - 1


def mmh3_hash64(data: bytes, seed: int = 0) -> int:
    """First 64-bit word of murmur3 x64_128, signed — mirrors
    graft.functions.Mmh3.hash64 (== python mmh3.hash64(v)[0])."""
    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & MASK64

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & MASK64
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & MASK64
        k ^= k >> 33
        return k

    C1, C2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & MASK64
    L = len(data)
    nblocks = L // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16:i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8:i * 16 + 16], "little")
        k1 = (k1 * C1) & MASK64; k1 = rotl(k1, 31); k1 = (k1 * C2) & MASK64; h1 ^= k1
        h1 = rotl(h1, 27); h1 = (h1 + h2) & MASK64; h1 = (h1 * 5 + 0x52DCE729) & MASK64
        k2 = (k2 * C2) & MASK64; k2 = rotl(k2, 33); k2 = (k2 * C1) & MASK64; h2 ^= k2
        h2 = rotl(h2, 31); h2 = (h2 + h1) & MASK64; h2 = (h2 * 5 + 0x38495AB5) & MASK64
    tail = data[nblocks * 16:]
    tl = len(tail)
    k1 = k2 = 0
    if tl >= 9:
        for j in range(tl - 1, 7, -1):
            k2 ^= tail[j] << ((j - 8) * 8)
        k2 = (k2 * C2) & MASK64; k2 = rotl(k2, 33); k2 = (k2 * C1) & MASK64; h2 ^= k2
    if tl > 0:
        for j in range(min(tl, 8) - 1, -1, -1):
            k1 ^= tail[j] << (j * 8)
        k1 = (k1 * C1) & MASK64; k1 = rotl(k1, 31); k1 = (k1 * C2) & MASK64; h1 ^= k1
    h1 ^= L; h2 ^= L
    h1 = (h1 + h2) & MASK64; h2 = (h2 + h1) & MASK64
    h1 = fmix(h1); h2 = fmix(h2)
    h1 = (h1 + h2) & MASK64
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


class JavaRandom:
    """java.util.Random LCG (what scala.util.Random wraps) — replicates
    the seed-deterministic draw in Sampling.sampleNWithReplacement."""
    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        r = self.seed >> (48 - bits)
        return r - (1 << 32) if bits == 32 and r >= (1 << 31) else r

    def next_long(self):
        v = ((self._next(32) << 32) + self._next(32)) & MASK64
        return v - (1 << 64) if v >= (1 << 63) else v


def check_keyhash(got):
    import pyarrow.parquet as papq
    nation = papq.read_table(f"{sf_dir}/nation.parquet").to_pydict()
    exp = sorted((k, abs(mmh3_hash64(f"{k}\t{n}".encode())))
                 for k, n in zip(nation["n_nationkey"], nation["n_name"]))
    act = sorted(zip(got["n_nationkey"].astype(int), got["key_hash"].astype(int)))
    if act != exp:
        d = [p for p in zip(act, exp) if p[0] != p[1]][:2]
        return f"VALUES: mmh3 mismatch {d}"
    return None


def bounded_long(rng, bound):
    """Replicates Sampling.sampleNWithReplacement's rejection-sampled
    uniform draw: non-negative 63-bit value, rejected beyond the largest
    exact multiple of `bound` (removes the modulo bias)."""
    m63 = (1 << 63) - 1  # Long.MaxValue
    mx = (m63 // bound) * bound
    while True:
        v = rng.next_long() & m63
        if v < mx:
            return v % bound


def check_sample_n_replace(got):
    import pyarrow.parquet as papq
    keys = papq.read_table(f"{sf_dir}/orders.parquet").column("o_orderkey").to_pylist()
    rng = JavaRandom(7)
    draws = [bounded_long(rng, len(keys)) for _ in range(100)]
    exp = sorted(keys[i] for i in draws)
    act = sorted(got["o_orderkey"].astype(int))
    if act != exp:
        return (f"VALUES: seed-7 multiset mismatch; "
                f"first diff {[p for p in zip(act, exp) if p[0] != p[1]][:2]}")
    return None


def check_ivf_topk(got):
    import numpy as np
    import pyarrow.parquet as papq
    t = papq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    vecs = np.array([list(v) for v in t["embedding"]], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    qmask = ids < 10
    truth = {}
    for qid, qv, qn in zip(ids[qmask], vecs[qmask], norms[qmask]):
        cos = (vecs @ qv) / (norms * qn)
        top = sorted(zip(-cos, ids), key=lambda p: (p[0], p[1]))[:3]
        truth[int(qid)] = {int(i) for _, i in top}
    vec_by_id = dict(zip(ids.astype(int), range(len(ids))))
    hits, total = 0, 0
    for _, r in got.iterrows():
        qid, vid, cos = int(r["query_id"]), int(r["vec_id"]), float(r["cosine"])
        total += 1
        hits += vid in truth[qid]
        qi, ci = vec_by_id[qid], vec_by_id[vid]
        true_cos = float(vecs[ci] @ vecs[qi] / (norms[ci] * norms[qi]))
        if abs(cos - true_cos) > 1e-5:
            return f"VALUES: reported cosine {cos} != recomputed {true_cos} for q{qid}/v{vid}"
    per_q = got.groupby("query_id").size()
    if len(per_q) != 10 or (per_q != 3).any():
        return f"ROWS: expected 3 rows x 10 queries, got {dict(per_q)}"
    recall = hits / total
    # honest bound for the gate config (8 cells, 4 probes, seed 42):
    # round 9 measured 1.000 at sf0.001, 0.900 at sf0.01, and 1.000 at
    # sf1 for the gate seed (the 2-probe config measured 0.667-0.767
    # under the old 0.55 bound); a mistuned index (random cells) would
    # score ~nProbes/nClusters = 0.5, comfortably below the bound.
    if recall < 0.85:
        return f"VALUES: IVF recall {recall:.2f} < 0.85 vs brute-force top-3"
    return None


def check_agg_registry_approx(got):
    """approx_uniq_count / approx_median with the sketches' own error
    bounds (the last two AggRegistry funcs, approximate by contract).

    - approx_count_distinct is HyperLogLog++ at the default rsd=0.05
      (relative standard deviation). Bound: 4 sigma = 20% relative
      (+2 absolute for tiny groups). A broken path returning e.g. the
      group ROW count instead of the distinct count is ~2x off at every
      SF (each order carries ~2-6 lineitems), far beyond the bound; an
      honest estimate essentially never trips 4 sigma.
    - percentile_approx at accuracy=10000 returns an actual dataset
      element whose RANK is within n/10000 of the true median rank.
      Bound: the exact DISCRETE quantile window
      [quantile_disc(0.495), quantile_disc(0.505)] — rank-order
      elements (quantile_cont would interpolate, which a returned
      element can legitimately straddle), a +-0.5% rank window, 50x the
      sketch's guarantee, still ~0 width vs a wrong-quantile bug.
    """
    exact = con.execute("""
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS du,
               quantile_disc(l_quantity, 0.495)      AS qlo,
               quantile_disc(l_quantity, 0.505)      AS qhi,
               quantile_disc(l_extendedprice, 0.495) AS plo,
               quantile_disc(l_extendedprice, 0.505) AS phi
        FROM lineitem GROUP BY l_returnflag""").fetchdf() \
        .set_index("l_returnflag")
    if sorted(got["l_returnflag"]) != sorted(exact.index):
        return f"ROWS: groups {sorted(got['l_returnflag'])} != {sorted(exact.index)}"
    eps = 1e-9
    for _, r in got.iterrows():
        e = exact.loc[r["l_returnflag"]]
        au = float(r["l_orderkey:approx_uniq_count"])
        if abs(au - e["du"]) > max(0.20 * e["du"], 2):
            return (f"VALUES: approx_uniq_count {au} vs exact {e['du']} "
                    f"({r['l_returnflag']}) outside the 4-sigma HLL bound")
        qm = float(r["l_quantity:approx_median"])
        if not (e["qlo"] - eps <= qm <= e["qhi"] + eps):
            return (f"VALUES: l_quantity approx_median {qm} outside exact "
                    f"rank window [{e['qlo']}, {e['qhi']}] ({r['l_returnflag']})")
        pm = float(r["l_extendedprice:approx_median"])
        if not (e["plo"] - eps <= pm <= e["phi"] + eps):
            return (f"VALUES: l_extendedprice approx_median {pm} outside exact "
                    f"rank window [{e['plo']}, {e['phi']}] ({r['l_returnflag']})")
    return None


SPECIAL = {
    "q_keyhash_mmh3": check_keyhash,
    "q_sample_n_replace": check_sample_n_replace,
    "q_sim_ivf_topk": check_ivf_topk,
    "q_agg_registry_approx": check_agg_registry_approx,
}
for name, fn in sorted(SPECIAL.items()):
    if only is not None and not any(p in name for p in only):
        continue
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        bad.append((name, "NO SPARK OUTPUT")); continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
        err = fn(got)
        bad.append((name, err)) if err else ok.append(name)
    except Exception as e:
        bad.append((name, f"CHECK ERROR: {e}"))

if skipped:
    print(f"SKIP {len(skipped)}: {' '.join(sorted(skipped))}")
print(f"PASS {len(ok)}: {' '.join(ok)}")
print(f"FAIL {len(bad)}:")
for n, msg in bad:
    print(f"  {n}: {msg[:300]}")
sys.exit(1 if bad else 0)
