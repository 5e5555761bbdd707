#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare (SURVEY.md §5.2).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--json OUT.json]
       [--skip name1,name2]   # e.g. oracles too heavy at a given SF

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
<sfDir> parquet tables, sorts columns by name and rows by all columns,
and compares values exactly. Never declare a query that fails here.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def main(sf_dir, out_dir, json_out=None, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}")
            report[name] = {"pass": None, "err": "skipped"}
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            n_big = con.sql(
                f"SELECT COUNT(*) FROM read_parquet("
                f"'{out_dir}/{name}/*.parquet')").fetchone()[0]
            if n_big > 2_000_000:
                # Multi-million-row keys: Python canon() would
                # materialize/sort tens of GB. Exact multiset equality
                # entirely inside DuckDB instead: same column order
                # (sorted by name), EXCEPT ALL in both directions must
                # be empty. Strictly stronger than the value walk
                # (bag equality, not just pairwise) and float-exact
                # (DuckDB set ops use IS NOT DISTINCT semantics).
                cols = ", ".join(f'"{c}"' for c in sorted(spark_rel.columns))
                o_probe = con.sql(sql)
                if sorted(o_probe.columns) != sorted(spark_rel.columns):
                    print(f"FAIL {name}: columns "
                          f"{sorted(spark_rel.columns)} != "
                          f"{sorted(o_probe.columns)}")
                    report[name] = {"pass": False, "err": "columns"}
                    n_fail += 1
                    continue
                n_oracle = con.sql(
                    f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
                if n_oracle != n_big:
                    print(f"FAIL {name}: rows {n_big} != {n_oracle}")
                    report[name] = {"pass": False, "err": "rows"}
                    n_fail += 1
                    continue
                n_diff = con.sql(f"""
                    SELECT COUNT(*) FROM (
                      (SELECT {cols} FROM read_parquet(
                         '{out_dir}/{name}/*.parquet')
                       EXCEPT ALL SELECT {cols} FROM ({sql}))
                      UNION ALL
                      (SELECT {cols} FROM ({sql})
                       EXCEPT ALL SELECT {cols} FROM read_parquet(
                         '{out_dir}/{name}/*.parquet')))""").fetchone()[0]
                if n_diff:
                    print(f"FAIL {name}: {n_diff} multiset-diff rows "
                          f"of {n_big}")
                    report[name] = {"pass": False, "err": "values"}
                    n_fail += 1
                else:
                    print(f"PASS {name} ({n_big} rows, in-db multiset)")
                    report[name] = {"pass": True, "rows": n_big}
                    n_pass += 1
                continue
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
            o_rel = con.sql(sql)
            # HUGEINT survives fetchall() as a plain int (so the value
            # compare below passes) but the driver's pandas/arrow path
            # widens it to float64/object and hash-mismatches — flag it.
            # substring match: a HUGEINT nested in LIST/STRUCT (str like
            # "HUGEINT[]") breaks the driver's arrow path just the same
            wide = [c for c, t in zip(o_rel.columns, o_rel.types)
                    if "HUGEINT" in str(t)]
            if wide:
                print(f"FAIL {name}: oracle outputs HUGEINT column(s) "
                      f"{wide} — CAST them (outside the aggregate)")
                n_fail += 1
                continue
            o_cols, o_rows = canon(o_rel.fetchall(), o_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e).splitlines()[0]}")
            report[name] = {"pass": False, "err": str(e).splitlines()[0]}
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns {s_cols} != {o_cols}")
            report[name] = {"pass": False, "err": "columns"}
            n_fail += 1
        elif len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows {len(s_rows)} != {len(o_rows)}")
            report[name] = {"pass": False, "err": "rows"}
            n_fail += 1
        elif s_rows != o_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows))
                       if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {s_rows[bad]}")
            print(f"  duckdb: {o_rows[bad]}")
            report[name] = {"pass": False, "err": "values"}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            report[name] = {"pass": True, "rows": len(s_rows)}
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if json_out:
        json.dump({"sf_dir": sf_dir, "passed": n_pass, "failed": n_fail,
                   "queries": report}, open(json_out, "w"), indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    jo = None
    sk = ()
    argv = sys.argv[1:]
    for flag in ("--json", "--skip"):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                sys.exit(f"usage: {flag} requires a value")
            if flag == "--json":
                jo = argv[i + 1]
            else:
                sk = tuple(argv[i + 1].split(","))
            argv = argv[:i] + argv[i + 2:]
    if len(argv) < 2:
        sys.exit(__doc__)
    sys.exit(main(argv[0], argv[1], jo, sk))
