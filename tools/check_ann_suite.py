#!/usr/bin/env python3
"""Exact independent check for `ann_recall_suite` at large SFs.

The declared DuckDB oracle unrolls four Lloyd CTE chains (IVF k=16 and
PQ sub-codebooks k=16/64, 3 rounds each) over every (sub-)vector —
fine at the driver's sf0.01 gate, but the k=64 chain over 16M
sub-vector rows outspills DuckDB's temp (>75 GB observed) at sf10.
This checker verifies the same 10-row recall table from the raw
parquet with BLAS-blocked matrix products instead (the
check_semdedup.py pattern):

  exact      brute-force top-10 by 4dp-rounded dot (tie -> vec_id asc)
  ivf        frozen seeds vec_id<16, nprobe in {2,8}
  ivf_trained  3-round Lloyd (4dp-rounded means, empty cell keeps
               previous centroid), same probe fan
  pq / pq64  flat integer-ADC against seed codebooks (16 / 64 cells
             per subspace), argmin by the packed key
             floor(max(0, d2)*1e4 + 0.5)*65536 + code
  ivfpq      the flat-PQ scores restricted to the frozen-IVF probes
  pq(64)_trained  3-round per-subspace Lloyd codebooks, same ADC

Every recall is an exact integer hit count / 80 rounded to 4dp, so
the comparison against the Spark dump is exact equality.

Accumulation-order note (same as check_semdedup.py): float64 GEMM
groups partial sums differently from the engines' left-to-right fold;
for 8- and 64-term dots the discrepancy is ~1e-15 and can only matter
when a value sits within that distance of a 0.00005 rounding grid
line or an exact rank tie — ~1e-10 per comparison. With ~10^7
comparisons per run a false alarm is ~1e-3-rare and a MISMATCH REPORT
must therefore be read, not assumed fatal: the per-row report prints
the engine and checker hit counts so a grid-line coincidence is
auditable against the dump.

Usage: python3 tools/check_ann_suite.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb
import numpy as np

ROUNDS = 3  # VectorOps.LloydRounds
NQ = 10     # recall@10
NPANEL = 8  # query panel vec_id < 8


def r4(x):
    # HALF_UP away from zero, matching Spark round() / DuckDB ROUND()
    return np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4


def r0(x):
    # round(x, 0): half away from zero
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def top10_sets(scores, vec_ids, q_ids):
    """Per query: top-NQ vec_ids by (r4(score) desc, vec_id asc),
    self excluded. scores: (nq, N) float64 raw; returns list of sets."""
    out = []
    s = r4(scores)
    for qi, q in enumerate(q_ids):
        row = s[qi].copy()
        mask = vec_ids != q
        rv = row[mask]
        ri = vec_ids[mask]
        order = np.lexsort((ri, -rv))
        out.append(set(ri[order[:NQ]].tolist()))
    return out


def argmax_lowest(scores):
    """Row-wise argmax of 4dp-rounded scores, tie -> lowest column
    index (columns are c_id-ascending)."""
    return np.argmax(r4(scores), axis=1)


def lloyd(E, k, rounds):
    """VectorOps.lloydRefine: seeds = first k rows (float->double),
    per round MIPS-assign on 4dp-rounded dots (tie lowest c_id), new
    centroid = per-dim mean rounded 4dp, empty cluster keeps previous."""
    C = E[:k].astype(np.float64).copy()
    for _ in range(rounds):
        a = argmax_lowest(E @ C.T)
        newC = C.copy()
        for c in range(k):
            members = E[a == c]
            if len(members):
                newC[c] = r4(members.mean(axis=0))
        C = newC
    return C


def pq_codes(SV, CB, S2, C2):
    """Per (vec, s) argmin code by the packed key
    floor(max(0, s2 + c2 - 2*dot)*1e4 + 0.5)*65536 + code.
    SV: (N, 8, 8), CB: (8, k, 8), S2: (N, 8), C2: (8, k).
    Returns codes (N, 8) int64."""
    N = SV.shape[0]
    codes = np.empty((N, 8), dtype=np.int64)
    for s in range(8):
        dots = SV[:, s, :] @ CB[s].T               # (N, k)
        d2 = np.maximum(0.0, S2[:, s][:, None] + C2[s][None, :]
                        - 2.0 * dots)
        key = (np.floor(d2 * 1e4 + 0.5).astype(np.int64) * 65536
               + np.arange(CB[s].shape[0], dtype=np.int64)[None, :])
        codes[:, s] = np.argmin(key, axis=1)       # first min = min key
    return codes


def adc_scores(QSV, CB, codes):
    """Integer ADC: qdot_i[q, s, code] = r0(dot(q_sv, c_sv)*1e4);
    score[q, vec] = sum_s qdot_i[q, s, codes[vec, s]].
    Returns (nq, N) float64 (exact integers)."""
    nq = QSV.shape[0]
    N = codes.shape[0]
    out = np.zeros((nq, N), dtype=np.int64)
    for s in range(8):
        qdot = r0((QSV[:, s, :] @ CB[s].T) * 10000).astype(np.int64)
        out += qdot[:, codes[:, s]]
    return out.astype(np.float64)


def pq_lloyd(SV, S2, k, rounds):
    """VectorOps.pqLloydRefine: per-subspace codebooks seeded from the
    first k vectors' sub-slices (float->double), refined by packed-key
    argmin + 4dp-rounded per-cell means, empty cell keeps previous.
    Returns CB (8, k, 8), C2 (8, k)."""
    CB = np.stack([SV[:k, s, :].astype(np.float64) for s in range(8)])
    C2 = np.einsum('skd,skd->sk', CB, CB)
    for _ in range(rounds):
        codes = pq_codes(SV, CB, S2, C2)
        newCB = CB.copy()
        for s in range(8):
            for c in range(k):
                members = SV[codes[:, s] == c, s, :]
                if len(members):
                    newCB[s, c] = r4(members.mean(axis=0))
        CB = newCB
        C2 = np.einsum('skd,skd->sk', CB, CB)
    return CB, C2


def main(sf_dir, out_dir):
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchnumpy()
    vec_ids = emb["vec_id"].astype(np.int64)
    E = np.stack(emb["embedding"]).astype(np.float64)
    # dense-contiguous vec_id precondition: the seed slices (E[:k],
    # vec_ids < 16) and the probed-set / assignment index comparisons
    # below all index E positionally — a gap or permutation would
    # silently compare the wrong vectors (ADVICE r16: this assert was
    # a no-op `... or True`)
    assert (vec_ids == np.arange(len(vec_ids))).all(), \
        "vec_ids are not dense-contiguous from 0 — positional slices invalid"
    q_ids = vec_ids[vec_ids < NPANEL]
    Q = E[vec_ids < NPANEL]

    got = con.execute(
        f"SELECT path, nprobe, recall FROM "
        f"read_parquet('{out_dir}/ann_recall_suite/*.parquet')"
    ).fetchall()
    got = {(p, int(n)): float(r) for p, n, r in got}
    assert len(got) == 12, f"dump has {len(got)} rows, want 12"

    exact = top10_sets(Q @ E.T, vec_ids, q_ids)

    def recall(retr_sets):
        hits = sum(len(e & r) for e, r in zip(exact, retr_sets))
        return hits, round(hits / 80.0 + 1e-12, 4)

    want = {}

    # ---- frozen-centroid IVF
    centsF = E[vec_ids < 16].astype(np.float64)
    cF_ids = vec_ids[vec_ids < 16]
    aF = argmax_lowest(E @ centsF.T)
    probe_scores_F = r4(Q @ centsF.T)

    def ivf_sets(assign, probe_scores, np_):
        sets = []
        for qi, q in enumerate(q_ids):
            order = np.lexsort((cF_ids, -probe_scores[qi]))
            probed = set(order[:np_].tolist())
            cand = np.isin(assign, list(probed)) & (vec_ids != q)
            rv = r4(E[cand] @ Q[qi])
            ri = vec_ids[cand]
            o = np.lexsort((ri, -rv))
            sets.append(set(ri[o[:NQ]].tolist()))
        return sets

    for np_ in (2, 8):
        want[("ivf", np_)] = recall(ivf_sets(aF, probe_scores_F, np_))

    # ---- Lloyd-trained IVF
    centsT = lloyd(E, 16, ROUNDS)
    aT = argmax_lowest(E @ centsT.T)
    probe_scores_T = r4(Q @ centsT.T)
    for np_ in (2, 8):
        want[("ivf_trained", np_)] = recall(ivf_sets(aT, probe_scores_T, np_))

    # ---- PQ family
    SV = E.reshape(len(E), 8, 8)
    S2 = np.einsum('nsd,nsd->ns', SV, SV)
    CB16 = np.stack([SV[vec_ids < 16, s, :] for s in range(8)])
    C216 = np.einsum('skd,skd->sk', CB16, CB16)
    QSV = SV[vec_ids < NPANEL]

    def pq_sets(CB, C2):
        codes = pq_codes(SV, CB, S2, C2)
        return top10_sets(adc_scores(QSV, CB, codes), vec_ids, q_ids), codes

    pq16_sets, codes16 = pq_sets(CB16, C216)
    want[("pq", 16)] = recall(pq16_sets)

    CB64 = np.stack([SV[vec_ids < 64, s, :] for s in range(8)])
    C264 = np.einsum('skd,skd->sk', CB64, CB64)
    pq64_sets, _ = pq_sets(CB64, C264)
    want[("pq64", 64)] = recall(pq64_sets)

    # ---- IVF x PQ: flat-PQ scores restricted to the frozen probes
    scores16 = adc_scores(QSV, CB16, codes16)
    for np_ in (2, 8):
        sets = []
        for qi, q in enumerate(q_ids):
            order = np.lexsort((cF_ids, -probe_scores_F[qi]))
            probed = set(order[:np_].tolist())
            cand = np.isin(aF, list(probed)) & (vec_ids != q)
            rv = r4(scores16[qi][cand])
            ri = vec_ids[cand]
            o = np.lexsort((ri, -rv))
            sets.append(set(ri[o[:NQ]].tolist()))
        want[("ivfpq", np_)] = recall(sets)

    # ---- IVF x PQ + EXACT RERANK (r17): ADC top-100 shortlist per
    # query (adc desc, vec_id asc at the rank-100 boundary), then the
    # shortlist's raw embeddings re-scored exactly, top-10
    for np_ in (2, 8):
        sets = []
        for qi, q in enumerate(q_ids):
            order = np.lexsort((cF_ids, -probe_scores_F[qi]))
            probed = set(order[:np_].tolist())
            cand = np.isin(aF, list(probed)) & (vec_ids != q)
            rv = r4(scores16[qi][cand])
            ri = vec_ids[cand]
            o = np.lexsort((ri, -rv))
            short = ri[o[:100]]
            ev = r4(E[short] @ Q[qi])  # positional: ids are dense
            oo = np.lexsort((short, -ev))
            sets.append(set(short[oo[:NQ]].tolist()))
        want[("ivfpq_rerank", np_)] = recall(sets)

    # ---- trained PQ codebooks
    tr16, tr16c2 = pq_lloyd(SV, S2, 16, ROUNDS)
    want[("pq_trained", 16)] = recall(pq_sets(tr16, tr16c2)[0])
    tr64, tr64c2 = pq_lloyd(SV, S2, 64, ROUNDS)
    want[("pq64_trained", 64)] = recall(pq_sets(tr64, tr64c2)[0])

    n_fail = 0
    for key in sorted(got):
        hits, rec = want[key]
        ok = abs(got[key] - rec) < 5e-5
        print(f"{'PASS' if ok else 'FAIL'} {key[0]} nprobe={key[1]} "
              f"engine={got[key]:.4f} checker={rec:.4f} (hits={hits}/80)")
        if not ok:
            n_fail += 1
    print(f"\n{len(got) - n_fail} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
