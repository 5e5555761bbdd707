#!/usr/bin/env python3
"""Exact checker for `interval_overlaps` at synthetic SFs.

The key's DuckDB oracle is the NAIVE inequality join, whose pair count
grows quadratically in SF (actives-per-day and windows-per-day both
scale with N over a fixed calendar) — fine at the sf0.01 gate, hours
at sf1+. This checker recomputes the per-order overlap count with the
same rank decomposition n = S(d+3) - E(d-1) but via numpy sorted
searchsorted over the raw parquet (an independent implementation of
the sweep: no Spark, no SQL, no day grid), and compares against the
dumped Spark result exactly.

Usage: check_interval.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb
import numpy as np


def main(sf_dir, out_dir):
    con = duckdb.connect()
    t = con.sql(f"""
        SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT),
               CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01'
                    + 1 + l_suppkey % 14 AS BIGINT)
        FROM read_parquet('{sf_dir}/lineitem.parquet')""").fetchnumpy()
    s = np.sort(list(t.values())[0])
    e = np.sort(list(t.values())[1])
    o = con.sql(f"""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
        FROM read_parquet('{sf_dir}/orders.parquet')
        WHERE o_orderpriority LIKE '1%'""").fetchnumpy()
    keys = list(o.values())[0]
    d = list(o.values())[1]
    expect = (np.searchsorted(s, d + 3, side="right")
              - np.searchsorted(e, d - 1, side="right"))
    want = dict(zip(keys.tolist(), expect.tolist()))
    got_rows = con.sql(
        f"SELECT o_orderkey, n_overlap FROM "
        f"read_parquet('{out_dir}/interval_overlaps/*.parquet')").fetchall()
    got = dict(got_rows)
    assert len(got_rows) == len(got), "duplicate order keys in output"
    assert got.keys() == want.keys(), (
        f"key sets differ: {len(got)} vs {len(want)}")
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not bad, f"{len(bad)} mismatching counts, first: {bad[:3]}"
    print(f"PASS interval_overlaps ({len(want)} rows, sweep-checked)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
