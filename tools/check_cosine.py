#!/usr/bin/env python3
"""Exact independent check for `cosine_neardup` at large SFs.

The declared DuckDB oracle nested-loops every within-bucket pair with
list_dot_product — ~1.25B scored pairs at sf10 (200k clone-replicated
vectors over the 16 sign buckets), where the SQL join grinds. This
checker verifies the same contract from the raw parquet with
BLAS-blocked matrix products (the check_semdedup.py pattern):

  bucket  = sum over dims 1..4 of 2^(d-1) * [emb[d] > 0]
  pair    = (id_a < id_b), same bucket, r4(dot) >= 0.3
  score   = r4(dot)   (4dp HALF_UP, matching Spark round / DuckDB ROUND)

The expected pair multiset is materialized bucket-by-bucket in numpy
and diffed against the Spark dump inside DuckDB (EXCEPT in both
directions — exact, duplicates counted). Disagreements are re-decided
with the engines' exact left-to-right float fold before failure, so
GEMM accumulation order cannot produce false alarms.

Usage: python3 tools/check_cosine.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb
import numpy as np

THRESH = 0.3
BLOCK = 4096


def r4(x):
    return np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4


def fold_dot(a, b):
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
    bucket = ((V[:, 0] > 0).astype(np.int64)
              + 2 * (V[:, 1] > 0).astype(np.int64)
              + 4 * (V[:, 2] > 0).astype(np.int64)
              + 8 * (V[:, 3] > 0).astype(np.int64))

    pa_ = []
    pb_ = []
    sc_ = []
    for bk in np.unique(bucket):
        idx = np.where(bucket == bk)[0]  # ascending vec_id order
        Vb = V[idx]
        for a in range(1, len(idx), BLOCK):
            b = min(a + BLOCK, len(idx))
            G = r4(Vb[a:b] @ Vb[:b].T)  # rows a..b vs all cols < b
            for i in range(a, b):
                hit = np.where(G[i - a, :i] >= THRESH)[0]
                if len(hit):
                    pa_.append(ids[idx[hit]])
                    pb_.append(np.full(len(hit), ids[idx[i]]))
                    sc_.append(G[i - a, hit])
    import pyarrow as pa
    expected = pa.table({
        "id_a": np.concatenate(pa_) if pa_ else np.array([], np.int64),
        "id_b": np.concatenate(pb_) if pb_ else np.array([], np.int64),
        "score": np.concatenate(sc_) if sc_ else np.array([], np.float64)})
    con.register("expected", expected)
    con.execute(f"CREATE VIEW got AS SELECT * FROM "
                f"read_parquet('{out_dir}/cosine_neardup/*.parquet')")
    n_exp, n_got, d_eg, d_ge = con.execute("""
        SELECT (SELECT COUNT(*) FROM expected),
               (SELECT COUNT(*) FROM got),
               (SELECT COUNT(*) FROM (SELECT * FROM expected
                                      EXCEPT SELECT * FROM got)),
               (SELECT COUNT(*) FROM (SELECT * FROM got
                                      EXCEPT SELECT * FROM expected))
        """).fetchone()
    if d_eg == 0 and d_ge == 0 and n_exp == n_got:
        print(f"PASS cosine_neardup ({n_got} pairs, 0 rechecks)")
        return 0
    # GEMM-order recheck: re-decide every disagreeing pair with the
    # exact left-to-right fold
    diff = con.execute("""
        SELECT id_a, id_b FROM (SELECT id_a, id_b FROM expected
                                EXCEPT SELECT id_a, id_b FROM got)
        UNION
        SELECT id_a, id_b FROM (SELECT id_a, id_b FROM got
                                EXCEPT SELECT id_a, id_b FROM expected)
        UNION
        SELECT e.id_a, e.id_b
        FROM expected e JOIN got g
          ON e.id_a = g.id_a AND e.id_b = g.id_b AND e.score <> g.score
        """).fetchall()
    got_pairs = dict(((a, b), s) for a, b, s in con.execute(
        "SELECT id_a, id_b, score FROM got JOIN (SELECT id_a AS a2, "
        "id_b AS b2 FROM (SELECT id_a, id_b FROM expected EXCEPT "
        "SELECT id_a, id_b FROM got UNION SELECT id_a, id_b FROM got "
        "EXCEPT SELECT id_a, id_b FROM expected)) x ON id_a = a2 AND "
        "id_b = b2").fetchall()) if diff else {}
    pos = {int(v): i for i, v in enumerate(ids)}
    real = []
    for a, b in diff:
        ia, ib = pos[int(a)], pos[int(b)]
        s = float(r4(np.float64(fold_dot(V32[ia], V32[ib]))))
        in_contract = bucket[ia] == bucket[ib] and s >= THRESH
        g = got_pairs.get((a, b))
        if g is None:
            g_rows = con.execute(
                "SELECT score FROM got WHERE id_a = ? AND id_b = ?",
                [a, b]).fetchall()
            g = g_rows[0][0] if g_rows else None
        if in_contract != (g is not None) or \
           (g is not None and abs(g - s) > 0):
            real.append((int(a), int(b)))
    if real:
        print(f"FAIL cosine_neardup: {len(real)} real mismatches, "
              f"e.g. {real[:5]}")
        return 1
    print(f"PASS cosine_neardup ({n_got} pairs, "
          f"{len(diff)} GEMM-order rechecks)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
