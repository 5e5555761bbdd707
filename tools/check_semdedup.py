#!/usr/bin/env python3
"""Exact independent check for `semdedup` at large SFs.

The declared DuckDB oracle scores every within-cluster pair with
list_dot_product — fine at the driver's sf0.01 gate (500 vecs), but
~2.5B scored pairs at sf10 (200k clone-replicated vecs in 8 clusters),
where the SQL join grinds for tens of minutes. This checker verifies
the same contract from the raw parquet with BLAS-blocked matrix
products instead:

  assignment = argmax over the k = max(8, ceil(sqrt(N/100)))
               lowest-vec_id seed centroids of the 4dp-rounded dot
               (tie -> lowest centroid id)
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
import sys

import duckdb
import numpy as np

THRESH = 0.3
BLOCK = 2048


def n_seeds(n):
    # k = max(8, ceil(sqrt(N / 100))) — the engines' data-driven k
    # (tau = 100 target cluster size); IEEE-double sqrt/ceil matches
    # Spark's math.* and DuckDB's SQRT/CEIL bit-for-bit
    import math
    return max(8, int(math.ceil(math.sqrt(n / 100.0))))


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
    scores = r4(V @ S.T)  # (n, k); columns already ordered by seed id
    # argmax with tie -> lowest c_id: argmax returns first occurrence
    assign = seed_ids[np.argmax(scores, axis=1)]

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
        exact_scores = r4(np.array(
            [fold_dot(V32[pos], V32[int(np.where(ids == s)[0][0])])
             for s in seed_ids]))
        exact_assign = int(seed_ids[int(np.argmax(exact_scores))])
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
