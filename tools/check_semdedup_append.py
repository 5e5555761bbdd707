#!/usr/bin/env python3
"""Exact independent check for `semdedup_append` at large SFs.

The declared DuckDB oracle scores every within-cluster pair before
filtering to batch-involving ones — fine at the driver's sf0.01 gate
(500 vecs), but ~54M scored 64-dim pairs at sf10 (50k clone-replicated
vecs in 23 clusters), where the SQL join's temp spill exceeded the
box's free disk. This checker verifies the same contract from the raw
parquet with BLAS-blocked matrix products instead (check_semdedup.py's
protocol, adapted to the incremental-index pair output):

  base       = vec_id <= max(vec_id) - 5 (the 5 newest are the batch)
  k          = max(8, ceil(N_base / 100))   (tau = 100)
  seeds      = the k lowest vec_ids (frozen, base-derived)
  assignment = the THREE-LEVEL assignFrozen rule for EVERY vector
               (kc = max(4, ceil-cbrt(n_seeds)) coarse cells,
               km = min(n_seeds, kc^2) mid cells; see
               check_semdedup.three_level_assign, imported from
               there so the rule lives in ONE checker)
  expected   = {(a, b, r4(dot)) : same cluster, a < b,
                a or b in the batch, r4(dot) >= 0.3}

GEMM accumulation-order discrepancies (~1e-15 on 64-term dots) are
resolved the same way as check_semdedup.py: any pair in the symmetric
difference between the dump and the GEMM-derived set is re-decided
with the engines' exact left-to-right fold before the checker
declares failure.

Usage: python3 tools/check_semdedup_append.py <sfDir> <verifyOutDir>
"""
import math
import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_semdedup import (fold_assign, fold_dot, r4,
                            three_level_assign)

THRESH = 0.3
BATCH = 5


def main(sf_dir, out_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V32 = np.array([r[1] for r in rows], dtype=np.float32)
    V = V32.astype(np.float64)
    pos_of = {int(v): i for i, v in enumerate(ids)}
    got = {}
    for a, b, sc in con.execute(
            f"SELECT vec_a, vec_b, score "
            f"FROM '{out_dir}/semdedup_append/*.parquet'").fetchall():
        got[(int(a), int(b))] = float(sc)

    mxv = int(ids.max())
    n_base = int((ids <= mxv - BATCH).sum())
    k = max(8, int(math.ceil(n_base / 100.0)))
    # seeds are BASE-derived (the engines' documented rule): the k
    # lowest ids restricted to the base slice
    seed_mask = (ids < k) & (ids <= mxv - BATCH)
    seed_ids = ids[seed_mask]
    S = V[seed_mask]
    assign, coarse_ids, mid_ids, m2c, f2m = three_level_assign(
        V, seed_ids, S)

    batch_pos = np.where(ids > mxv - BATCH)[0]
    expected = {}
    for bp in batch_pos:
        b_id = int(ids[bp])
        c = assign[bp]
        members = np.where(assign == c)[0]
        g = r4(V[members] @ V[bp])
        for mp, sc in zip(members, g):
            o_id = int(ids[mp])
            if o_id == b_id or sc < THRESH:
                continue
            key = (min(o_id, b_id), max(o_id, b_id))
            expected[key] = float(sc)

    def fold_decide(a_id, b_id):
        """(in_pair_set, score) via the exact left-to-right fold at
        both assignment levels."""
        pa, pb = pos_of[a_id], pos_of[b_id]
        ca = fold_assign(V32[pa], seed_ids, S, coarse_ids,
                         mid_ids, m2c, f2m)
        cb = fold_assign(V32[pb], seed_ids, S, coarse_ids,
                         mid_ids, m2c, f2m)
        sc = float(r4(fold_dot(V32[pa], V32[pb])))
        ok = (ca == cb and sc >= THRESH and
              (a_id > mxv - BATCH or b_id > mxv - BATCH))
        return ok, sc

    real = []
    for key in set(expected) ^ set(got):
        ok, sc = fold_decide(*key)
        if ok != (key in got) or (ok and abs(got.get(key, sc) - sc) > 0):
            real.append(key)
    for key in set(expected) & set(got):
        if expected[key] != got[key]:
            ok, sc = fold_decide(*key)
            if not ok or got[key] != sc:
                real.append(key)

    if real:
        print(f"FAIL semdedup_append: {len(real)} disagreements, "
              f"e.g. {sorted(real)[:5]}")
        return 1
    print(f"PASS semdedup_append ({len(got)} pairs, exact numpy check, "
          f"k={k}, batch={BATCH})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
