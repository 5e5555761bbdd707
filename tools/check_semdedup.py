#!/usr/bin/env python3
"""Exact independent check for `semdedup` at large SFs.

The declared DuckDB oracle scores every within-cluster pair with
list_dot_product — fine at the driver's sf0.01 gate (500 vecs), but
~2.5B scored pairs at sf10 (200k clone-replicated vecs in 8 clusters),
where the SQL join grinds for tens of minutes. This checker verifies
the same contract from the raw parquet with BLAS-blocked matrix
products instead:

  fine seeds = the k = max(8, ceil(N/100)) lowest vec_ids
               (tau = 100 target cluster size)
  coarse     = the kc = max(4, ceil-cbrt(n_fine)) lowest fine seeds
               (integer cube-root ceiling: min c with c^3 >= n)
  mid        = the km = min(n_fine, kc^2) lowest fine seeds
  assignment = THREE-LEVEL (the r18 assignFrozen rule): each mid
               seed picks a coarse cell by 4dp-rounded-dot argmax
               (tie -> lowest id; a coarse seed owns its own cell);
               each non-mid fine seed picks its coarse cell the same
               way then its MID cell as the argmax over that cell's
               mid seeds (a mid seed owns its own mid cell); each
               vector routes coarse -> mid -> fine by the same
               argmaxes, its cluster being the argmax over ONLY its
               mid cell's fine seeds
  dropped    = exists a LOWER-id same-cluster vector with
               4dp-rounded dot >= 0.3

Accumulation-order note: float64 GEMM groups partial sums differently
from the engines' left-to-right fold. For 64-term dots the discrepancy
is ~1e-15, and a decision can only flip when a pair's dot sits within
that distance of a 0.00005 rounding grid line (or an argmax tie) —
~1e-10 probability per pair. Any row that disagrees with the dump is
therefore re-decided with the exact left-to-right fold before the
checker declares failure, so GEMM ordering cannot produce false
alarms (check_cc.py plays the same role for the recursive-CTE ops).

Usage: python3 tools/check_semdedup.py <sfDir> <verifyOutDir>
"""
import math
import sys

import duckdb
import numpy as np

THRESH = 0.3
BLOCK = 2048


def n_seeds(n):
    # k = max(8, ceil(N / 100)) — the engines' data-driven k
    # (tau = 100 target cluster size); IEEE-double ceil matches
    # Spark's math.* and DuckDB's CEIL bit-for-bit
    import math
    return max(8, int(math.ceil(n / 100.0)))


def r4(x):
    # HALF_UP away from zero, matching Spark round() / DuckDB ROUND()
    return np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4


def fold_dot(a, b):
    # the engines' exact accumulation: widen float32->float64, fold
    # left to right
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def int_cbrt(n):
    # smallest c with c*c*c >= n — never trust a float cube root for
    # perfect cubes (mirrors VectorOps.intCbrt / the oracle's integer
    # range search)
    c = max(1, int(round(n ** (1.0 / 3))))
    while c * c * c < n:
        c += 1
    while c > 1 and (c - 1) ** 3 >= n:
        c -= 1
    return c


def three_level_assign(V, seed_ids, S):
    """The assignFrozen mirror over GEMM scores. `seed_ids`/`S` are
    the fine seeds sorted ascending by id. The seed-side routings
    (mid->coarse, fine->mid) are computed with the EXACT left-to-
    right fold (seed-count-sized — cheap), so only the vector-side
    argmaxes carry GEMM ordering risk (re-decided by the caller on
    disagreement). Returns (assign, coarse_ids, mid_ids, m2c, f2m)."""
    n = len(seed_ids)
    kc = min(max(4, int_cbrt(n)), n)
    km = min(n, kc * kc)
    coarse_ids = seed_ids[:kc]
    mid_ids = seed_ids[:km]
    C = S[:kc]
    M = S[:km]
    coarse_set = set(int(c) for c in coarse_ids)
    mid_set = set(int(m) for m in mid_ids)

    def cell_of(v):
        return min((-r4(fold_dot(v, C[j])), int(coarse_ids[j]))
                   for j in range(kc))[1]

    m2c = {}
    for i, mid in enumerate(mid_ids):
        m2c[int(mid)] = (int(mid) if int(mid) in coarse_set
                         else cell_of(M[i]))

    def mid_of(v, cell):
        return min((-r4(fold_dot(v, M[i])), int(mid_ids[i]))
                   for i in range(km) if m2c[int(mid_ids[i])] == cell)[1]

    f2m = {}
    for i, fid in enumerate(seed_ids):
        f2m[int(fid)] = (int(fid) if int(fid) in mid_set
                         else mid_of(S[i], cell_of(S[i])))

    # vector side: GEMM per level, cells resolved row-block-wise
    v_sc = r4(V @ C.T)
    v2c = coarse_ids[np.argmax(v_sc, axis=1)]  # first occ = lowest id
    v2m = np.empty(len(V), dtype=np.int64)
    for ci in coarse_ids:
        vmask = v2c == ci
        if not vmask.any():
            continue
        mmask = np.array([m2c[int(m)] == int(ci) for m in mid_ids])
        mids = mid_ids[mmask]  # ascending
        g = r4(V[vmask] @ M[mmask].T)
        v2m[vmask] = mids[np.argmax(g, axis=1)]
    assign = np.empty(len(V), dtype=np.int64)
    for mi in np.unique(v2m[: len(V)]):
        vmask = v2m == mi
        fmask = np.array([f2m[int(f)] == int(mi) for f in seed_ids])
        fid = seed_ids[fmask]  # ascending
        g = r4(V[vmask] @ S[fmask].T)
        assign[vmask] = fid[np.argmax(g, axis=1)]
    return assign, coarse_ids, mid_ids, m2c, f2m


def fold_assign(v, seed_ids, S, coarse_ids, mid_ids, m2c, f2m):
    """One vector's cluster via the exact left-to-right fold at all
    three levels — the re-decision path for GEMM-order
    disagreements."""
    kc = len(coarse_ids)
    km = len(mid_ids)
    cell = min((-r4(fold_dot(v, S[j])), int(coarse_ids[j]))
               for j in range(kc))[1]
    mcell = min((-r4(fold_dot(v, S[i])), int(mid_ids[i]))
                for i in range(km) if m2c[int(mid_ids[i])] == cell)[1]
    return min((-r4(fold_dot(v, S[i])), int(fid))
               for i, fid in enumerate(seed_ids)
               if f2m[int(fid)] == mcell)[1]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V32 = np.array([r[1] for r in rows], dtype=np.float32)
    V = V32.astype(np.float64)
    got = dict(
        (int(v), (int(c), int(k))) for v, c, k in con.execute(
            f"SELECT vec_id, c_id, kept FROM '{out_dir}/semdedup/*.parquet'"
        ).fetchall())
    assert len(got) == len(ids), (len(got), len(ids))

    seed_mask = ids < n_seeds(len(ids))
    seed_ids = ids[seed_mask]
    S = V[seed_mask]
    assign, coarse_ids, mid_ids, m2c, f2m = three_level_assign(
        V, seed_ids, S)

    mismatches = []
    for v, c in zip(ids, assign):
        if got[int(v)][0] != int(c):
            mismatches.append(("assign", int(v)))

    dropped = np.zeros(len(ids), dtype=bool)
    for c in np.unique(assign):
        idx = np.where(assign == c)[0]  # ascending vec_id order
        Vc = V[idx]
        for a in range(1, len(idx), BLOCK):
            b = min(a + BLOCK, len(idx))
            G = r4(Vc[a:b] @ Vc[:b].T)  # rows a..b vs all cols < b
            # column j qualifies for row i only when j < i (lower id)
            for i in range(a, b):
                if (G[i - a, :i] >= THRESH).any():
                    dropped[idx[i]] = True

    for pos, v in enumerate(ids):
        kept = 0 if dropped[pos] else 1
        if got[int(v)][1] != kept:
            mismatches.append(("kept", int(v)))

    # re-decide disagreements with the exact fold before failing
    real = []
    for kind, v in mismatches:
        pos = int(np.where(ids == v)[0][0])
        exact_assign = fold_assign(V32[pos], seed_ids, S,
                                   coarse_ids, mid_ids, m2c, f2m)
        if kind == "assign":
            if got[v][0] != exact_assign:
                real.append((kind, v))
            continue
        cluster = [int(u) for u, c in zip(ids, assign)
                   if c == exact_assign and u < v]
        drop = any(
            r4(fold_dot(V32[int(np.where(ids == u)[0][0])], V32[pos]))
            >= THRESH for u in cluster)
        if got[v][1] != (0 if drop else 1):
            real.append((kind, v))

    n_drop = int(dropped.sum())
    if real:
        print(f"FAIL semdedup: {len(real)} real mismatches, e.g. "
              f"{real[:5]}")
        return 1
    print(f"PASS semdedup ({len(ids)} vecs, {n_drop} dropped, "
          f"{len(mismatches)} GEMM-order rechecks)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
