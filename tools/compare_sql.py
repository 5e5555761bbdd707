#!/usr/bin/env python3
"""DuckDB-side oracle compare for large pair dumps (VERDICT r8 item 3).

tools/compare.py canonicalizes rows in Python, which is exact but
materializes the full result driver-side — infeasible for the
clone-replicated pair dumps at synthetic sf10 (tens of millions of
rows: every base-doc pair multiplies by clone^2). This variant runs
the SAME multiset comparison entirely inside DuckDB: the oracle SQL
and the Spark parquet dump are each grouped by every output column,
and the two (row -> count) multisets are diffed with EXCEPT in both
directions. Exact — no hashing, no sampling, duplicates counted —
and never materialized outside the database engine.

Usage: compare_sql.py <sfDir> <verifyOutDir> name1,name2,...
       [--json OUT.json]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, names, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    report = {}
    n_pass = n_fail = 0
    for name in names:
        sql = oracle[name]
        con.execute(f"CREATE OR REPLACE VIEW __s AS SELECT * FROM "
                    f"read_parquet('{out_dir}/{name}/*.parquet')")
        con.execute(f"CREATE OR REPLACE VIEW __o AS {sql}")
        s_cols = [r[0] for r in con.execute("DESCRIBE __s").fetchall()]
        o_cols = [r[0] for r in con.execute("DESCRIBE __o").fetchall()]
        if sorted(c.lower() for c in s_cols) != \
           sorted(c.lower() for c in o_cols):
            report[name] = {"pass": False,
                            "err": f"schema {sorted(s_cols)} vs "
                                   f"{sorted(o_cols)}"}
            n_fail += 1
            print(f"FAIL {name}: schema mismatch")
            continue
        sel = ", ".join(f'"{c}"' for c in sorted(s_cols, key=str.lower))
        grouped = (f"SELECT {sel}, COUNT(*) AS __c FROM {{v}} "
                   f"GROUP BY {sel}")
        res = con.execute(f"""
            SELECT
              (SELECT COUNT(*) FROM __o) AS n_oracle,
              (SELECT COUNT(*) FROM __s) AS n_spark,
              (SELECT COUNT(*) FROM
                 (({grouped.format(v='__o')})
                  EXCEPT
                  ({grouped.format(v='__s')}))) AS only_oracle,
              (SELECT COUNT(*) FROM
                 (({grouped.format(v='__s')})
                  EXCEPT
                  ({grouped.format(v='__o')}))) AS only_spark
        """).fetchone()
        n_o, n_s, d_o, d_s = res
        ok = (n_o == n_s) and d_o == 0 and d_s == 0
        report[name] = {"pass": bool(ok), "rows": int(n_s),
                        "rows_oracle": int(n_o),
                        "groups_only_in_oracle": int(d_o),
                        "groups_only_in_spark": int(d_s)}
        if ok:
            n_pass += 1
            print(f"PASS {name} ({n_s} rows, multiset-equal in DuckDB)")
        else:
            n_fail += 1
            print(f"FAIL {name}: oracle={n_o} spark={n_s} "
                  f"diff_groups=({d_o},{d_s})")
    print(f"\n{n_pass} passed, {n_fail} failed")
    if json_out:
        json.dump({"sf_dir": sf_dir, "passed": n_pass, "failed": n_fail,
                   "queries": report}, open(json_out, "w"), indent=1)
    return n_fail


if __name__ == "__main__":
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sys.exit(1 if main(args[0], args[1],
                       [n for n in args[2].split(",") if n],
                       json_out) else 0)
