#!/usr/bin/env python3
"""Exact independent check for `simhash_pairs` at large SFs.

At synthetic sf10 the same-fingerprint pair set is ~881M rows — too
large for the row-by-row Python compare, and heavy even for a full
SQL EXCEPT (both sides would re-group ~1.8B rows). This checker
proves the dump exact with three aggregate properties that together
characterize the result completely:

  1. soundness   — joining the dump to an independently recomputed
                   fingerprint table, every row satisfies
                   fp(doc_a) = fp(doc_b) = fp and doc_a < doc_b;
  2. distinctness — COUNT(DISTINCT (doc_a, doc_b)) = COUNT(*);
  3. completeness — per-fingerprint pair counts equal C(n_fp, 2)
                   exactly, for every fingerprint (and no extra fps).

(1) says every emitted pair is a true same-fp pair; (3) says the
number per fp is exactly the number of true pairs; with (2) ruling
out duplicates, the dump IS the true pair multiset. The fingerprint
table is recomputed from the raw parquet with the oracle's own fps
CTE chain (token hash -> 16 bit votes -> fingerprint), not read from
the dump.

Usage: python3 tools/check_simhash.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["simhash_pairs"]
    # reuse the oracle's own WITH chain (toks/votes/fps), replacing
    # the final pair-join SELECT with the fingerprint table itself
    fps_sql = sql[:sql.rindex("SELECT")] + "SELECT doc_id, fp FROM fps"
    con.execute(f"CREATE TABLE fps AS {fps_sql}")
    con.execute(f"CREATE VIEW dump AS SELECT * FROM "
                f"read_parquet('{out_dir}/simhash_pairs/*.parquet')")

    n, n_distinct, n_bad = con.execute("""
        SELECT COUNT(*),
               COUNT(DISTINCT (doc_a, doc_b)),
               (SELECT COUNT(*) FROM dump d
                JOIN fps a ON d.doc_a = a.doc_id
                JOIN fps b ON d.doc_b = b.doc_id
                WHERE a.fp <> d.fp OR b.fp <> d.fp
                   OR d.doc_a >= d.doc_b)
        FROM dump""").fetchone()
    if n_bad:
        print(f"FAIL simhash_pairs: {n_bad} unsound rows")
        return 1
    if n != n_distinct:
        print(f"FAIL simhash_pairs: {n - n_distinct} duplicate pairs")
        return 1
    # unmatched join keys would silently drop rows from the soundness
    # scan — every dump id must resolve in fps
    n_orphan = con.execute("""
        SELECT COUNT(*) FROM (
          SELECT doc_a AS d FROM dump UNION ALL
          SELECT doc_b FROM dump) x
        LEFT JOIN fps ON x.d = fps.doc_id
        WHERE fps.doc_id IS NULL""").fetchone()[0]
    if n_orphan:
        print(f"FAIL simhash_pairs: {n_orphan} ids without a fingerprint")
        return 1
    bad_fp = con.execute("""
        WITH expected AS (
          SELECT fp, COUNT(*) * (COUNT(*) - 1) // 2 AS want
          FROM fps GROUP BY fp),
        got AS (
          SELECT fp, COUNT(*) AS have FROM dump GROUP BY fp)
        SELECT COUNT(*) FROM expected e
        FULL JOIN got g ON e.fp = g.fp
        WHERE COALESCE(e.want, 0) <> COALESCE(g.have, 0)""").fetchone()[0]
    if bad_fp:
        print(f"FAIL simhash_pairs: {bad_fp} fingerprints with wrong "
              f"pair counts")
        return 1
    print(f"PASS simhash_pairs ({n} pairs: sound, distinct, per-fp "
          f"counts = C(n,2) for every fingerprint)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
