#!/usr/bin/env python3
"""Exact independent check for `range_join_time` at large SFs.

The declared DuckDB oracle is a non-equi self-join (BETWEEN + OR
tie-break) that DuckDB nested-loops for 35+ minutes at sf1 — the
documented skip class. This checker computes the identical contract
in O(n) with a sliding-window sweep instead of any pair join:

  pairs (a, b): 0 <= us_b - us_a <= 30s, (us_a < us_b or
                (us_a = us_b and id_a < id_b)), user_a != user_b
  output      : per (type_a, type_b): n_pairs,
                ROUND(AVG(us_b - us_a), 2)

Exactness: window counts/sums are maintained incrementally as Python
integers (arbitrary precision), so the per-group n_pairs and dt sums
are exact; the final avg reproduces the engines' arithmetic — an
IEEE-double division of the (integer-valued, hence exactly
representable) dt sum by the count, then HALF_UP rounding to 2dp.
Same-user exclusions are handled with per-user sliding windows and
equal-timestamp groups with an id-ordered in-group sweep.

Usage: python3 tools/check_range.py <sfDir> <verifyOutDir>
"""
import math
import sys
from collections import defaultdict

import duckdb

W = 30_000_000  # 30 s in µs


def r2(x):
    # HALF_UP to 2dp on the IEEE double, matching Spark round / DuckDB
    return math.floor(x * 100 + 0.5) / 100 if x >= 0 else \
        -math.floor(-x * 100 + 0.5) / 100


def main(sf_dir, out_dir):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_id, user_id, event_type, "
        "epoch_us(CAST(ts AS TIMESTAMP)) AS us "
        f"FROM '{sf_dir}/events.parquet' ORDER BY us, event_id"
    ).fetchall()
    n = len(rows)
    ids = [r[0] for r in rows]
    users = [r[1] for r in rows]
    types = [r[2] for r in rows]
    us = [r[3] for r in rows]
    tset = sorted(set(types))
    tix = {t: i for i, t in enumerate(tset)}
    T = len(tset)
    ty = [tix[t] for t in types]

    n_pairs = defaultdict(int)
    sum_dt = defaultdict(int)

    # global window [L, E): us_a in [us_b - W, us_b)
    win_cnt = [0] * T
    win_sum = [0] * T
    # per-user window state: (L pointer into the user's event list,
    # per-type count, per-type us sum); user lists in global us order
    user_events = defaultdict(list)  # user -> [(us, type, pos)]
    for i in range(n):
        user_events[users[i]].append(i)
    user_state = {}

    L = 0
    E = 0
    i = 0
    while i < n:
        # equal-us group [i, j)
        j = i
        while j < n and us[j] == us[i]:
            j += 1
        t_b = us[i]
        # advance E to first pos with us == t_b (all strictly-before)
        while E < i:
            win_cnt[ty[E]] += 1
            win_sum[ty[E]] += us[E]
            E += 1
        # retire events with us_a < t_b - W
        while L < E and us[L] < t_b - W:
            win_cnt[ty[L]] -= 1
            win_sum[ty[L]] -= us[L]
            L += 1
        # in-group sweep state: per-type counts of group members with
        # lower id (dt = 0 contributions), and per-user per-type
        for b in range(i, j):
            u = users[b]
            # same-user correction from this user's sliding window:
            # state = [remPtr, addPtr, cnt per type, us-sum per type],
            # holding exactly this user's events with us in
            # [t_b - W, t_b). t_b is non-decreasing, so both pointers
            # only move forward.
            st = user_state.get(u)
            if st is None:
                st = [0, 0, [0] * T, [0] * T]
                user_state[u] = st
            ev = user_events[u]
            while st[1] < len(ev) and us[ev[st[1]]] < t_b:
                p = ev[st[1]]
                st[2][ty[p]] += 1
                st[3][ty[p]] += us[p]
                st[1] += 1
            while st[0] < st[1] and us[ev[st[0]]] < t_b - W:
                p = ev[st[0]]
                st[2][ty[p]] -= 1
                st[3][ty[p]] -= us[p]
                st[0] += 1
            for t in range(T):
                cnt = win_cnt[t] - st[2][t]
                if cnt:
                    key = (tset[t], types[b])
                    n_pairs[key] += cnt
                    sum_dt[key] += cnt * t_b - (win_sum[t] - st[3][t])
        # equal-us ties within the group: id_a < id_b, user differs,
        # dt = 0 (group already sorted by id — global sort key)
        g_cnt = [0] * T
        gu_cnt = defaultdict(lambda: [0] * T)
        for k in range(i, j):
            for t in range(T):
                cnt = g_cnt[t] - gu_cnt[users[k]][t]
                if cnt:
                    n_pairs[(tset[t], types[k])] += cnt
            g_cnt[ty[k]] += 1
            gu_cnt[users[k]][ty[k]] += 1
        i = j

    got = {}
    for ta, tb, np_, avg in con.execute(
            "SELECT type_a, type_b, n_pairs, avg_dt_us FROM "
            f"read_parquet('{out_dir}/range_join_time/*.parquet')"
    ).fetchall():
        got[(ta, tb)] = (np_, avg)
    exp = {}
    for key, cnt in n_pairs.items():
        exp[key] = (cnt, r2(float(sum_dt[key]) / cnt))
    bad = []
    for key in set(exp) | set(got):
        if exp.get(key) != got.get(key):
            bad.append((key, exp.get(key), got.get(key)))
    if bad:
        print(f"FAIL range_join_time: {len(bad)} mismatches, e.g. "
              f"{sorted(bad)[:5]}")
        return 1
    total = sum(c for c, _ in exp.values())
    print(f"PASS range_join_time ({len(exp)} type pairs, "
          f"{total} event pairs)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
