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

Also verifies `dedup_keep_best` (whose declared oracle shares the
same recursive CTE) when its dump is present: expected answer =
argmax-quality member per union-find cluster (tie → min doc_id),
with quality computed by DuckDB using the exact oracle expression.

Usage: python3 tools/check_cc.py <sfDir> <verifyOutDir>
"""
import os
import sys

import duckdb


def check_keep_best(con, sf_dir, out_dir, want):
    # quality formula: hand-synced python mirror of
    # TextOps.qualityDuckExpr (src/main/scala/graft/text/TextOps.scala)
    # — the Scala side is the single source; change there first
    qual = dict(con.execute(f"""
        SELECT doc_id,
               ROUND(LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE)
                                / 60.0)
                 * (1.0 - CAST(length(list_filter(string_split(text, ' '),
                      w -> w = 'a' OR w = 'the')) AS DOUBLE)
                    / len(string_split(text, ' '))), 6) AS quality
        FROM read_parquet('{sf_dir}/documents.parquet')""").fetchall())
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        f"SELECT cluster_id, n_members, keep_id, best_quality FROM "
        f"read_parquet('{out_dir}/dedup_keep_best/*.parquet')").fetchall()}
    clusters = {}
    for n, c in want.items():
        clusters.setdefault(c, []).append(n)
    assert set(got) == set(clusters), (
        f"cluster sets differ: {len(got)} vs {len(clusters)}")
    bad = []
    for c, members in clusters.items():
        keep = min(members, key=lambda n: (-qual[n], n))
        g = got[c]
        if (g[0], g[1]) != (len(members), keep) or \
                abs(g[2] - qual[keep]) > 1e-9:
            bad.append((c, g, (len(members), keep, qual[keep])))
    if bad:
        c, g, w = bad[0]
        print(f"FAIL dedup_keep_best: {len(bad)} bad clusters; "
              f"e.g. cluster {c}: spark={g} expected={w}")
        return 1
    print(f"PASS dedup_keep_best ({len(clusters)} clusters, "
          f"argmax-quality member verified in each)")
    return 0


def check_name_clusters(con, sf_dir, out_dir):
    # same union-find contract over the part-name graph: edges are the
    # independently-verified edit_dist_pairs dump (levenshtein <= 3
    # within (brand, size) blocks), nodes all part keys; expected =
    # per-component sizes, components of size > 1 only
    edges = con.execute(
        f"SELECT k1, k2 FROM "
        f"read_parquet('{out_dir}/edit_dist_pairs/*.parquet')").fetchall()
    nodes = [r[0] for r in con.execute(
        f"SELECT p_partkey FROM "
        f"read_parquet('{sf_dir}/part.parquet')").fetchall()]
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
    sizes = {}
    for n in nodes:
        r = find(n)
        sizes[r] = sizes.get(r, 0) + 1
    want = {c: s for c, s in sizes.items() if s > 1}
    got = dict(con.execute(
        f"SELECT cluster_id, n_members FROM "
        f"read_parquet('{out_dir}/name_clusters/*.parquet')").fetchall())
    if got != want:
        extra = set(got) - set(want)
        miss = set(want) - set(got)
        diff = [c for c in set(got) & set(want) if got[c] != want[c]]
        print(f"FAIL name_clusters: {len(extra)} extra, {len(miss)} "
              f"missing, {len(diff)} wrong-size clusters")
        return 1
    print(f"PASS name_clusters ({len(nodes)} parts, {len(edges)} edges, "
          f"{len(want)} multi-member clusters)")
    return 0


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
    rc = 0
    if os.path.isdir(f"{out_dir}/dedup_keep_best"):
        rc |= check_keep_best(con, sf_dir, out_dir, want)
    if os.path.isdir(f"{out_dir}/name_clusters") and \
            os.path.isdir(f"{out_dir}/edit_dist_pairs"):
        rc |= check_name_clusters(con, sf_dir, out_dir)
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
