#!/usr/bin/env python3
"""Closed-form sf-N output size for `simhash_multiprobe` (SCALE.md).

At a synthesized SF (tools/make_sf.py: K text-identical clones per
base doc), every clone of base doc p carries p's fingerprint, so the
hamming-<=2 pair count is fully determined by the BASE fingerprint
multiset: groups of n_f docs become n_f * K, and

  total = sum over fps f:            C(n_f * K, 2)
        + sum over fp pairs f1 < f2
          with hamming(f1, f2) <= 2: (n_f1 * K) * (n_f2 * K)

The fingerprint table is computed on the base fixture with the op's
own oracle CTE chain (from a Verify dump's oracle_sql.json). This is
the committed evidence that the op's sf10 dump is infeasible BY
CONSTRUCTION (~17.5B pairs from sf0.1 x K=100), not by tooling —
and it exactly predicts the feasible SFs (e.g. sf1 = 174,977,200,
the CORRECTNESS_sf1 hash-matched row count).

Usage: count_multiprobe.py <baseSfDir> <oracleSqlJson> <K>
e.g.   python3 tools/count_multiprobe.py /root/testdata/sf0.1 \\
           /tmp/out/oracle_sql.json 100
"""
import json
import sys

import duckdb


def main(base_dir, oracle_json, k):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{base_dir}/documents.parquet')")
    sql = json.load(open(oracle_json))["simhash_pairs"]
    fps_sql = sql[:sql.rindex("SELECT")] + \
        "SELECT fp, COUNT(*) AS n FROM fps GROUP BY fp"
    groups = con.execute(fps_sql).fetchall()
    same = sum((n * k) * (n * k - 1) // 2 for _, n in groups)
    cross = 0
    for i in range(len(groups)):
        f1, n1 = groups[i]
        for j in range(i + 1, len(groups)):
            f2, n2 = groups[j]
            if bin(f1 ^ f2).count("1") <= 2:
                cross += (n1 * k) * (n2 * k)
    print(f"base fps: {len(groups)}  K: {k}")
    print(f"simhash_pairs (same fp): {same}")
    print(f"simhash_multiprobe (hamming <= 2): {same + cross}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], int(sys.argv[3])))
