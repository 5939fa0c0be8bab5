"""Build a 10x scale replica of an sf dir for PERFORMANCE MEASUREMENT ONLY.

The driver's round-end bench may run at sf1.0 (BENCH_r05.json: sf_escalated_from
0.1 -> 1.0) but only sf{0.001,0.01,0.1} live under /root/testdata and the
driver's generator is not available.  This tool fabricates a statistically
faithful stand-in by replicating sf0.1 K times with:

- fact/dim tables: all key columns offset by copy*100_000_000 so the K copies
  are FK-consistent and join-disjoint (each copy behaves like the original);
- documents: per-copy deterministic word shuffle (unigram distribution, doc
  lengths, langs, sources preserved; shingle/near-dup structure replicates
  per copy instead of creating K exact duplicates of every doc);
- embeddings: per-copy signed dimension permutation (an orthogonal transform:
  within-copy pairwise similarities and cluster geometry preserved exactly,
  cross-copy similarities decorrelated).

Row-count scaling matches the observed driver law (documents 5000->50000,
embeddings 2000->20000 at 10x).  Output goes OUTSIDE /root/testdata (which is
read-only by contract).  Never used by bench.py or any query path.

Usage: python tools/gen_scale_replica.py [src_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OFFSET = 100_000_000

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _offset_copy(tbl: pa.Table, name: str, c: int) -> pa.Table:
    if c == 0:
        return tbl
    for col in KEY_COLS.get(name, []):
        i = tbl.schema.get_field_index(col)
        arr = tbl.column(i)
        typ = arr.type
        shifted = pa.compute.add(arr, pa.scalar(c * OFFSET, type=typ))
        tbl = tbl.set_column(i, tbl.schema.field(i), shifted)
    return tbl


def _shuffle_documents(tbl: pa.Table, c: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    ids = tbl.column("doc_id").to_pylist()
    out = []
    for did, t in zip(ids, texts):
        words = t.split(" ")
        rng = np.random.RandomState((did * 131 + c * 7919) % (2**31))
        rng.shuffle(words)
        out.append(" ".join(words))
    i = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(i, tbl.schema.field(i), pa.array(out, type=pa.string()))
    return tbl


def _transform_embeddings(tbl: pa.Table, c: int) -> pa.Table:
    vecs = tbl.column("embedding").to_pylist()
    dim = len(vecs[0])
    rng = np.random.RandomState(1000 + c)
    perm = rng.permutation(dim)
    signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
    m = np.array(vecs, dtype=np.float32)
    m = m[:, perm] * signs[None, :]
    i = tbl.schema.get_field_index("embedding")
    typ = tbl.schema.field(i).type
    arr = pa.array([row for row in m.tolist()], type=typ)
    return tbl.set_column(i, tbl.schema.field(i), arr)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/scratch/sfm1.0"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        tbl = pq.read_table(f"{src}/{name}.parquet")
        if name in ("region", "nation"):
            pq.write_table(tbl, f"{dst}/{name}.parquet")
            print(name, tbl.num_rows, "(dim, copied)")
            continue
        copies = []
        for c in range(k):
            t = tbl
            if c > 0 and name == "documents":
                t = _shuffle_documents(t, c)
            if c > 0 and name == "embeddings":
                t = _transform_embeddings(t, c)
            copies.append(_offset_copy(t, name, c))
        big = pa.concat_tables(copies)
        pq.write_table(big, f"{dst}/{name}.parquet")
        print(name, tbl.num_rows, "->", big.num_rows)


if __name__ == "__main__":
    main()
