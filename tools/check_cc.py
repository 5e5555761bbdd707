#!/usr/bin/env python3
"""Exact union-find oracle for `neardup_cluster` at large SFs.

The declared recursive-CTE oracle is exact but materializes the full
transitive closure (sum of component-size^2 rows) — fine at the
driver's sf0.01 gate, quadratic-in-component-size at sf1 where clone
replicas merge components. This checker verifies the same contract
(cluster_id = min reachable doc_id over the jaccard>=0.2 pair graph)
with union-find over the Verify dumps instead: edges from the
ngram_jaccard result, nodes from documents, expected labels compared
exactly against the neardup_cluster result.

Usage: python3 tools/check_cc.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    edges = con.execute(
        f"SELECT doc_a, doc_b FROM "
        f"read_parquet('{out_dir}/ngram_jaccard/*.parquet')").fetchall()
    nodes = [r[0] for r in con.execute(
        f"SELECT doc_id FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchall()]
    got = dict(con.execute(
        f"SELECT doc_id, cluster_id FROM "
        f"read_parquet('{out_dir}/neardup_cluster/*.parquet')").fetchall())

    parent = {n: n for n in nodes}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # second pass: root of each component is its min id by construction
    want = {n: find(n) for n in nodes}
    assert set(got) == set(want), (
        f"node sets differ: {len(got)} vs {len(want)}")
    bad = [n for n in nodes if got[n] != want[n]]
    if bad:
        n = bad[0]
        print(f"FAIL neardup_cluster: {len(bad)} mismatched labels; "
              f"e.g. doc {n}: spark={got[n]} union-find={want[n]}")
        return 1
    n_clusters = len(set(want.values()))
    print(f"PASS neardup_cluster ({len(nodes)} docs, {len(edges)} edges, "
          f"{n_clusters} clusters)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
