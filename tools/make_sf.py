#!/usr/bin/env python3
"""Synthesize a larger scale factor as a K-fold key-offset union of an
existing fixture dir (VERDICT r2 item 2: scale-up evidence).

Each replica i shifts every synthetic key column by i * (max_key + 1),
so joins stay consistent (lineitem.l_orderkey still finds its order,
orders.o_custkey its customer) and key uniqueness is preserved.
Dimension tables (nation, region) are fixed-cardinality and copied
as-is; non-key attributes (timestamps, text, vectors) are left
untouched so the value distributions match the source SF exactly.

Usage: python3 tools/make_sf.py SRC_DIR DST_DIR K
e.g.   python3 tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10

pyarrow round-trips the physical parquet types (notably events.ts
TIMESTAMP(NANOS)) byte-for-byte; the script asserts schema equality.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns that carry entity identity and must be offset
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # nation / region: fixed dims, copied verbatim
    "nation": [],
    "region": [],
}

# strides are shared across tables per key family so FKs stay aligned
KEY_FAMILY = {
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "order", "l_orderkey": "order",
    "p_partkey": "part", "l_partkey": "part",
    "s_suppkey": "supp", "l_suppkey": "supp",
    "event_id": "event", "user_id": "user",
    "doc_id": "doc", "vec_id": "vec",
}


def main(src: str, dst: str, k: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)

    # pass 1: stride per key family = max over all tables carrying it
    strides = {}
    tables = {}
    for name, keys in OFFSET_COLS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        tables[name] = t
        for c in keys:
            fam = KEY_FAMILY[c]
            m = pc.max(t.column(c)).as_py()
            strides[fam] = max(strides.get(fam, 0), m + 1)

    for name, keys in OFFSET_COLS.items():
        t = tables[name]
        if not keys:  # fixed dims
            pq.write_table(t, f"{dst}/{name}.parquet")
            continue
        replicas = []
        for i in range(k):
            r = t
            if i > 0:
                for c in keys:
                    off = i * strides[KEY_FAMILY[c]]
                    col = pc.add(r.column(c),
                                 pa.scalar(off, type=r.schema.field(c).type))
                    r = r.set_column(r.schema.get_field_index(c), c, col)
            replicas.append(r)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{name}.parquet")
        back = pq.read_schema(f"{dst}/{name}.parquet")
        orig = pq.read_schema(f"{src}/{name}.parquet")
        assert back.equals(orig), f"{name}: schema drift\n{back}\nvs\n{orig}"
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
