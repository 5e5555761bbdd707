#!/usr/bin/env python3
"""Synthesize a larger scale factor as a K-fold key-offset union of an
existing fixture dir (VERDICT r2 item 2: scale-up evidence).

Each replica i shifts every synthetic key column by i * (max_key + 1),
so joins stay consistent (lineitem.l_orderkey still finds its order,
orders.o_custkey its customer) and key uniqueness is preserved.
Dimension tables (nation, region) are fixed-cardinality and copied
as-is; non-key attributes (timestamps, text, vectors) are left
untouched so the value distributions match the source SF exactly.

Usage: python3 tools/make_sf.py SRC_DIR DST_DIR K [--mutate RATE]
e.g.   python3 tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10
       python3 tools/make_sf.py /root/testdata/sf0.1 /tmp/sf10m 100 --mutate 0.05

pyarrow round-trips the physical parquet types (notably events.ts
TIMESTAMP(NANOS)) byte-for-byte; the script asserts schema equality.

--mutate RATE (VERDICT r14 task 8 — fixture realism for the dedup
family): in document replicas i > 0, each token is substituted with
probability RATE by a deterministic draw from the source corpus
vocabulary (numpy RNG seeded per replica, so the fixture is
reproducible). The plain clone union makes every replicated text
byte-identical — every gram duplicated, every clone pair Jaccard 1.0,
the dedup ops' declared worst case — whereas real crawl near-dups
live on a Jaccard spectrum; at RATE=0.05 a trigram survives with
p≈0.86, putting clone pairs around Jaccard ~0.7–0.8 with variance,
the regime banded LSH + exact verify is actually tuned for. Replica 0
stays byte-identical so exact-dedup still has real work.
`documents.text` mutates as above; `embeddings.embedding` mutates in
the same switch (VERDICT r15 task 3 — the semantic family's fixture
realism): replica i > 0 vectors are perturbed v' = (v + eps*u) /
sqrt(1 + eps^2) with u a per-replica-seeded gaussian direction
orthogonalized against v (unit norm preserved EXACTLY, clone-pair
cosine vs replica 0 exactly 1/sqrt(1+eps^2)), eps drawn per vector
from U(0.10, 0.75) so clone cosines span ~[0.80, 0.995] — a realistic
near-dup spectrum instead of the degenerate all-1.0 byte clones.
Keys, counts, and every other table are the standard clone union
(n_chars is re-derived so text-derived stats stay consistent).
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


def mutate_texts(t: pa.Table, replica: int, rate: float,
                 vocab: list) -> pa.Table:
    """Deterministically substitute tokens in replica > 0 documents:
    per-replica-seeded numpy RNG, replacement drawn uniformly from
    the source vocabulary; n_chars re-derived from the mutated text
    (the fixture invariant n_chars == len(text), asserted in main)."""
    import numpy as np
    rng = np.random.default_rng(1_000_003 * replica)
    out = []
    for txt in t.column("text").to_pylist():
        toks = txt.split(" ")
        mask = rng.random(len(toks)) < rate
        hits = np.nonzero(mask)[0]
        if hits.size:
            repl = rng.integers(0, len(vocab), hits.size)
            for j, pos in enumerate(hits):
                toks[pos] = vocab[repl[j]]
            txt = " ".join(toks)
        out.append(txt)
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     pa.array(out, type=t.schema.field("text").type))
    ncf = t.schema.field("n_chars")
    return t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                        pa.array([len(s) for s in out], type=ncf.type))


def mutate_embeddings(t: pa.Table, replica: int) -> pa.Table:
    """Perturb replica > 0 unit vectors at a controlled cosine:
    v' = (v + eps*u)/sqrt(1+eps^2), u a seeded gaussian direction
    orthogonalized against v and normalized, eps ~ U(0.10, 0.75) per
    vector — so cos(v, v') = 1/sqrt(1+eps^2) EXACTLY (u ⊥ v), the
    clone-pair spectrum spans ~[0.80, 0.995], and ||v'|| = 1 to
    float32 round-off. Deterministic per replica (seed family
    disjoint from mutate_texts')."""
    import numpy as np
    rng = np.random.default_rng(2_000_029 * replica + 7)
    field = t.schema.field("embedding")
    E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n, d = E.shape
    eps = rng.uniform(0.10, 0.75, size=(n, 1))
    g = rng.standard_normal((n, d))
    # orthogonalize against v (rows of E are unit-norm), then unit-norm u
    g -= (g * E).sum(axis=1, keepdims=True) * E
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    V = (E + eps * g) / np.sqrt(1.0 + eps * eps)
    out = pa.array([row for row in V.astype(np.float32)], type=field.type)
    return t.set_column(t.schema.get_field_index("embedding"),
                        "embedding", out)


def main(src: str, dst: str, k: int, mutate: float = 0.0) -> None:
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

    vocab = None
    if mutate > 0:
        docs = tables["documents"]
        nc = docs.column("n_chars").to_pylist()
        for row, txt in enumerate(docs.column("text").to_pylist()[:50]):
            assert nc[row] == len(txt), \
                f"n_chars invariant broken at row {row}: {nc[row]} != {len(txt)}"
        vocab = sorted({w for txt in docs.column("text").to_pylist()
                        for w in txt.split(" ")})
        print(f"mutate rate {mutate}: vocab {len(vocab)} types")

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
                if name == "documents" and mutate > 0:
                    r = mutate_texts(r, i, mutate, vocab)
                if name == "embeddings" and mutate > 0:
                    r = mutate_embeddings(r, i)
            replicas.append(r)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{name}.parquet")
        back = pq.read_schema(f"{dst}/{name}.parquet")
        orig = pq.read_schema(f"{src}/{name}.parquet")
        assert back.equals(orig), f"{name}: schema drift\n{back}\nvs\n{orig}"
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    rate = 0.0
    args = list(sys.argv[1:])
    if "--mutate" in args:
        mi = args.index("--mutate")
        rate = float(args[mi + 1])
        del args[mi:mi + 2]
    main(args[0], args[1], int(args[2]), rate)
