#!/usr/bin/env python3
"""Exact check for pair ops at synthetic SFs via clone algebra.

tools/make_sf.py builds sfN as K key-offset clones of a base fixture:
doc_id gains i * stride (stride = max base doc_id + 1), every other
column is byte-identical. For a pair op whose output depends only on
the documents' TEXT (plus the id order), the large-SF result is then
fully determined by the base-SF result:

  * base pair (p, q), p < q, metric m  ->  exactly K^2 clone pairs
    (one per (i, j) in K x K; the unordered pair {p+i*s, q+j*s} is
    distinct for every combo), each with the SAME metric m;
  * every SELF-eligible base doc p     ->  exactly C(K, 2) pairs
    among its own clones, with the op's self-pair metric (identical
    texts: Jaccard 1.0).

This checker verifies the big-SF Spark dump against that closed form:
(1) all rows id-valid and doc_a < doc_b; (2) no duplicate pairs;
(3) grouped by base pair, cross groups carry count K^2 and the base
oracle's exact metric, self groups carry count C(K,2) and the self
metric; (4) the group sets match the base oracle / eligibility sets
exactly in both directions. The base oracle runs on the (small) base
fixture with the op's own oracle SQL from oracle_sql.json — DuckDB
never touches a big-SF pair join. Properties (1)-(4) together are
equivalent to a full multiset compare of the expected result.

Supported ops and their self-pair rules:
  minhash_det  — self-eligible: >= 3 tokens (has a trigram);
                 self metric: jaccard = 1.0

Usage: check_cloned_pairs.py <baseSfDir> <bigSfDir> <verifyOutDir> <op>
"""
import json
import sys

import duckdb

OPS = {
    "minhash_det": {
        "metric": "jaccard",
        "self_sql": """
            SELECT doc_id, 1.0 AS metric FROM documents
            WHERE len(string_split(text, ' ')) >= 3""",
    },
}


def main(base_dir, big_dir, out_dir, op):
    cfg = OPS[op]
    metric = cfg["metric"]
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
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[op]
    con.execute(f"CREATE TABLE bp AS {sql}")  # base pairs on base dir
    con.execute(f"CREATE TABLE selfdocs AS {cfg['self_sql']}")
    con.execute(f"CREATE VIEW dump AS SELECT * FROM "
                f"read_parquet('{out_dir}/{op}/*.parquet')")

    n, n_distinct, n_bad = con.execute(f"""
        SELECT COUNT(*), COUNT(DISTINCT (doc_a, doc_b)),
               COUNT(*) FILTER (doc_a >= doc_b OR doc_a < 0
                                OR doc_b >= {k * stride})
        FROM dump""").fetchone()
    if n_bad or n != n_distinct:
        print(f"FAIL {op}: {n_bad} invalid rows, "
              f"{n - n_distinct} duplicates")
        return 1
    bad = con.execute(f"""
        WITH grouped AS (
          SELECT LEAST(doc_a % {stride}, doc_b % {stride}) AS lo,
                 GREATEST(doc_a % {stride}, doc_b % {stride}) AS hi,
                 COUNT(*) AS cnt,
                 COUNT(DISTINCT {metric}) AS nm,
                 MIN({metric}) AS m
          FROM dump GROUP BY 1, 2),
        expected AS (
          SELECT LEAST(doc_a, doc_b) AS lo, GREATEST(doc_a, doc_b) AS hi,
                 CAST({k}::BIGINT * {k} AS BIGINT) AS want_cnt,
                 {metric} AS want_m
          FROM bp
          UNION ALL
          SELECT doc_id, doc_id,
                 CAST({k}::BIGINT * ({k} - 1) // 2 AS BIGINT), metric
          FROM selfdocs)
        SELECT COUNT(*) FROM grouped g
        FULL JOIN expected e ON g.lo = e.lo AND g.hi = e.hi
        WHERE g.lo IS NULL OR e.lo IS NULL
           OR g.cnt <> e.want_cnt OR g.nm <> 1
           OR g.m <> e.want_m""").fetchone()[0]
    if bad:
        print(f"FAIL {op}: {bad} base-pair groups diverge from the "
              f"clone closed form")
        return 1
    n_base, n_self = con.execute(
        "SELECT (SELECT COUNT(*) FROM bp), "
        "(SELECT COUNT(*) FROM selfdocs)").fetchone()
    assert n == n_base * k * k + n_self * k * (k - 1) // 2
    print(f"PASS {op} ({n} pairs = {n_base} base pairs x {k}^2 + "
          f"{n_self} self docs x C({k},2); metrics exact)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:5]))
