#!/usr/bin/env python3
"""Exact check for `minhash_append` at synthetic SFs via clone algebra.

check_cloned_pairs.py's closed form for minhash_det, restricted to the
op's at-ingest discovery contract (pairs with at least one side in the
batch = the 50 newest doc_ids). make_sf.py builds sfN as K key-offset
clones of the base fixture (stride s = max base doc_id + 1, texts
byte-identical), and signatures depend only on a doc's own text, so:

  * the batch is clone K-1's base ids p >= s-50 (the 50 largest big
    ids), and a batch-involving pair's GREATEST element is in the
    batch;
  * base pair (p, q, jaccard), p < q: the discovered clone pairs are
    the (i, j) in K x K with (p >= s-50 and i = K-1) or (q >= s-50
    and j = K-1) -> count K + K - 1 when both ends are batch-eligible,
    K when one is, 0 when neither; each with the base pair's exact
    jaccard;
  * self-eligible base doc p (>= 3 tokens, identical-text clones,
    jaccard 1.0): pairs {p+i*s, p+(K-1)*s}, i < K-1, iff p >= s-50
    -> count K-1.

The base pair set comes from the op-independent `minhash_det` oracle
SQL (oracle_sql.json) run on the SMALL base fixture — DuckDB never
touches a big-SF pair join, which is what blew the disk: the declared
oracle's bands self-join materializes every clone-group combination
before the batch filter can apply.

Usage: check_minhash_append.py <baseSfDir> <bigSfDir> <verifyOutDir> \
         [oracleSqlJson]
(the 4th arg covers subset dumps whose oracle_sql.json omits
minhash_det — point it at any full dump's oracle_sql.json)
"""
import json
import sys

import duckdb

BATCH = 50


def main(base_dir, big_dir, out_dir, oracle_json=None):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{base_dir}/documents.parquet')")
    stride = con.execute(
        "SELECT MAX(doc_id) + 1 FROM documents").fetchone()[0]
    n_big = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM "
        f"read_parquet('{big_dir}/documents.parquet')").fetchone()[0]
    assert n_big % stride == 0, (n_big, stride)
    k = n_big // stride
    assert stride >= BATCH
    lo_batch_base = stride - BATCH  # base ids that are batch-eligible
    sql = json.load(open(oracle_json or
                         f"{out_dir}/oracle_sql.json"))["minhash_det"]
    con.execute(f"CREATE TABLE bp AS {sql}")
    con.execute("""
        CREATE TABLE selfdocs AS
        SELECT doc_id, 1.0 AS jaccard FROM documents
        WHERE len(string_split(text, ' ')) >= 3""")
    con.execute(f"CREATE VIEW dump AS SELECT * FROM "
                f"read_parquet('{out_dir}/minhash_append/*.parquet')")

    n, n_distinct, n_bad = con.execute(f"""
        SELECT COUNT(*), COUNT(DISTINCT (doc_a, doc_b)),
               COUNT(*) FILTER (doc_a >= doc_b OR doc_a < 0
                                OR doc_b >= {n_big}
                                OR doc_b < {n_big - BATCH})
        FROM dump""").fetchone()
    if n_bad or n != n_distinct:
        print(f"FAIL minhash_append: {n_bad} invalid rows "
              f"(order / id range / non-batch greatest), "
              f"{n - n_distinct} duplicates")
        return 1
    bad = con.execute(f"""
        WITH grouped AS (
          SELECT LEAST(doc_a % {stride}, doc_b % {stride}) AS lo,
                 GREATEST(doc_a % {stride}, doc_b % {stride}) AS hi,
                 COUNT(*) AS cnt,
                 COUNT(DISTINCT jaccard) AS nm,
                 MIN(jaccard) AS m
          FROM dump GROUP BY 1, 2),
        expected AS (
          SELECT LEAST(doc_a, doc_b) AS lo, GREATEST(doc_a, doc_b) AS hi,
                 CAST((CASE WHEN LEAST(doc_a, doc_b) >= {lo_batch_base}
                            THEN {k} ELSE 0 END)
                    + (CASE WHEN GREATEST(doc_a, doc_b) >= {lo_batch_base}
                            THEN {k} ELSE 0 END)
                    - (CASE WHEN LEAST(doc_a, doc_b) >= {lo_batch_base}
                            AND GREATEST(doc_a, doc_b) >= {lo_batch_base}
                            THEN 1 ELSE 0 END) AS BIGINT) AS want_cnt,
                 jaccard AS want_m
          FROM bp
          UNION ALL
          SELECT doc_id, doc_id,
                 CAST(CASE WHEN doc_id >= {lo_batch_base}
                           THEN {k} - 1 ELSE 0 END AS BIGINT),
                 jaccard
          FROM selfdocs)
        SELECT COUNT(*) FROM grouped g
        FULL JOIN (SELECT * FROM expected WHERE want_cnt > 0) e
          ON g.lo = e.lo AND g.hi = e.hi
        WHERE g.lo IS NULL OR e.lo IS NULL
           OR g.cnt <> e.want_cnt OR g.nm <> 1
           OR g.m <> e.want_m""").fetchone()[0]
    if bad:
        print(f"FAIL minhash_append: {bad} base-pair groups diverge "
              f"from the batch-restricted clone closed form")
        return 1
    want_total = con.execute(f"""
        SELECT COALESCE(SUM(c), 0) FROM (
          SELECT (CASE WHEN LEAST(doc_a, doc_b) >= {lo_batch_base}
                       THEN {k} ELSE 0 END)
               + (CASE WHEN GREATEST(doc_a, doc_b) >= {lo_batch_base}
                       THEN {k} ELSE 0 END)
               - (CASE WHEN LEAST(doc_a, doc_b) >= {lo_batch_base}
                       AND GREATEST(doc_a, doc_b) >= {lo_batch_base}
                       THEN 1 ELSE 0 END) AS c
          FROM bp
          UNION ALL
          SELECT CASE WHEN doc_id >= {lo_batch_base}
                      THEN {k} - 1 ELSE 0 END
          FROM selfdocs)""").fetchone()[0]
    assert n == want_total, (n, want_total)
    print(f"PASS minhash_append ({n} pairs match the batch-restricted "
          f"clone closed form; K={k}, stride={stride}, metrics exact)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:5]))
