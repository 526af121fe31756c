#!/usr/bin/env python3
"""Generate a larger-SF copy of the driver's testdata by key-offset
replication -- the scale-proof dataset for bench.py --sf N.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md, read-only), but
the scale claims ("linear to 100 TB") need at least one measured 10x
step. This tool replicates a source SF ``factor`` times with disjoint
key spaces so the result is a THROUGHPUT-scaling clone: row counts,
join fan-outs, group cardinalities and per-key distributions all scale
linearly, exactly like adding more days/users/orders to a production
lake. It is NOT a statistical re-draw (string payloads repeat across
copies); that is the right shape for measuring engine throughput, and
deliberately conservative for dedup/similarity: document word order is
PERMUTED per copy by an md5-keyed shuffle so copies are not
near-duplicates of each other -- otherwise every doc would gain
factor-1 planted near-dups and the LSH candidate count would measure
the planted duplicates, not the engine. (A plain rotation is NOT
enough: rotating a word list preserves almost every 3-word shingle --
only the ~2 boundary shingles change -- so rotated copies sit at
shingle-jaccard ~0.96 and minhash clusters them; measured exactly that
on the first sf1 cut, where dedup_minhash_lsh ran 6.5x instead of
~2x.)

Key remapping (offset = copy * 10_000_000, far above any sf0.1 key):
  customer.c_custkey / supplier.s_suppkey / part.p_partkey /
  orders.{o_orderkey,o_custkey} /
  lineitem.{l_orderkey,l_partkey,l_suppkey} /
  events.{event_id,user_id} / documents.doc_id / embeddings.vec_id
region/nation are dimension constants (25/5 rows) and copy unchanged,
like TPC-H. Timestamps copy unchanged so date-window selectivities and
event-time windows hold. Embedding vectors rotate by copy index (norms
preserved, directions decorrelated).

Deterministic (no RNG), pure pyarrow, row-group size 128k so Spark
parallelizes single-file scans.

Usage: python scripts/gen_sf.py [--src /root/testdata/sf0.1]
           [--dst <repo>/.localdata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# Per-copy key stride. 10M is the historical value (safe for the
# driver's sf0.1, whose keys all sit far below it) and is kept as the
# MINIMUM so earlier rounds' sf1/sf10 artifacts stay byte-identical.
# main() RAISES it to the next power of 10 above the source's actual
# max key, so chaining gen_sf output into gen_sf again (sf1 -> sf10)
# keeps copies key-disjoint -- with the fixed stride, sf1's ids (up to
# copy*10M + 100k) COLLIDE with the next run's shifted copies, the key
# column silently stops being unique, and every keyed-merge downstream
# legitimately collapses the duplicates (caught by the round-11 sf10
# DML sweep: 10M rows, only 1.9M distinct event_ids).
OFFSET = 10_000_000
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ("region", "nation")


_PERM_KEYS: dict = {"k": None, "keys": []}
_PERM_ORDERS: dict = {}


def _perm_order(k: int, n: int) -> list:
    """Permutation of range(n) for copy k. The md5 sort key depends only
    on (k, position), so docs sharing a word count share the order --
    cache per (k, n) and grow one shared key list per k, instead of
    hashing every word of every doc of every copy (factor 1000 would
    otherwise be ~1e9 md5 calls)."""
    import hashlib

    got = _PERM_ORDERS.get((k, n))
    if got is not None:
        return got
    if _PERM_KEYS["k"] != k:
        _PERM_KEYS["k"] = k
        _PERM_KEYS["keys"] = []
        _PERM_ORDERS.clear()
    keys = _PERM_KEYS["keys"]
    while len(keys) < n:
        keys.append(hashlib.md5(f"{k}:{len(keys)}".encode()).digest())
    order = sorted(range(n), key=keys.__getitem__)
    _PERM_ORDERS[(k, n)] = order
    return order


def _permute_words(text: str, k: int) -> str:
    """Deterministic per-copy word shuffle (md5-keyed order): destroys
    word ADJACENCY, so shingle sets decorrelate across copies, while
    word counts, char counts and whitespace structure stay identical
    (split/join on single spaces is length-preserving)."""
    w = text.split(" ")
    order = _perm_order(k, len(w))
    return " ".join(w[i] for i in order)


def _flip_signs(k_hi: int, dim: int):
    """Norm-preserving +-1 pattern for copies past one rotation period.
    Rotation alone has period dim (64): without this, copies k and k+64
    carry IDENTICAL vectors under different vec_ids -- factor 1000 would
    plant ~15 exact duplicates per vector and dedup/similarity rows
    would measure the planted dups, not the engine (same trap the
    docstring calls out for rotated documents). md5-keyed, no RNG;
    k_hi == 0 (first 64 copies) stays identity so factor<=64 outputs
    are byte-identical to earlier rounds' sf1/sf10 artifacts."""
    import hashlib

    import numpy as np

    if k_hi == 0:
        return np.ones(dim, dtype=np.float32)
    return np.array(
        [1.0 if hashlib.md5(f"flip:{k_hi}:{i}".encode()).digest()[0] & 1
         else -1.0 for i in range(dim)],
        dtype=np.float32,
    )


def _copy(table: pa.Table, name: str, k: int) -> pa.Table:
    if k == 0:
        return table
    out = table
    for col in KEYED.get(name, []):
        i = out.schema.get_field_index(col)
        shifted = pc.add(out.column(i), pa.scalar(k * OFFSET, out.schema.field(i).type))
        out = out.set_column(i, out.schema.field(i), shifted)
    if name == "documents":
        i = out.schema.get_field_index("text")
        shuffled = pa.array(
            [_permute_words(t, k) if t is not None else None
             for t in out.column(i).to_pylist()],
            type=out.schema.field(i).type,
        )
        out = out.set_column(i, out.schema.field(i), shuffled)
    if name == "embeddings":
        import numpy as np

        i = out.schema.get_field_index("embedding")
        col = out.column(i).combine_chunks()
        n = len(col)
        flat = np.asarray(col.flatten(), dtype=np.float32)
        # dim from the first non-empty vector, NOT flat.size // n:
        # ragged or null lists can divide evenly and mis-reshape
        # silently (e.g. one empty + one oversize vector)
        lens = np.diff(np.asarray(col.offsets))
        nonzero = lens[lens > 0]
        dim = int(nonzero[0]) if len(nonzero) else 0
        if flat.size != n * dim or (len(nonzero) and not (lens == dim).all()):
            raise ValueError(
                f"embeddings are ragged (n={n}, dim={dim}, "
                f"flat={flat.size}); factor-copy requires uniform vectors"
            )
        # left-rotate by k % dim (v[r:] + v[:r]), then sign-flip past
        # one full rotation period so no two copies repeat a vector
        arr = np.roll(flat.reshape(n, dim), -(k % dim), axis=1)
        arr = arr * _flip_signs(k // dim, dim)
        offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
        rotated = pa.ListArray.from_arrays(
            offsets, pa.array(arr.ravel(), type=pa.float32()))
        out = out.set_column(i, out.schema.field(i), rotated)
    return out


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(here, ".localdata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset to generate (e.g. 'events' for a "
             "DML-sweep-only scale step); default: all tables",
    )
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    names = COPY_ONCE + tuple(KEYED)
    if args.tables:
        wanted = set(args.tables.split(","))
        unknown = wanted - set(names)
        if unknown:
            raise SystemExit(f"unknown tables: {sorted(unknown)}")
        names = tuple(n for n in names if n in wanted)
    # key-disjointness guarantee: stride strictly above EVERY source
    # key, rounded to a power of 10 (>= the historical 10M so driver
    # sf0.1 sources reproduce earlier artifacts byte-identically)
    global OFFSET
    max_key = 0
    for name, cols in KEYED.items():
        src = os.path.join(args.src, f"{name}.parquet")
        if not os.path.exists(src):  # partial source (--tables chain)
            continue
        t = pq.read_table(src, columns=cols)
        for col in cols:
            m = pc.max(t.column(col)).as_py()
            if m is not None:
                max_key = max(max_key, int(m))
    while OFFSET <= max_key:
        OFFSET *= 10
    print(f"# copy stride {OFFSET} (source max key {max_key})",
          flush=True)
    for name in names:
        src = os.path.join(args.src, f"{name}.parquet")
        base = pq.read_table(src)
        dst = os.path.join(args.dst, f"{name}.parquet")
        if name in COPY_ONCE:
            pq.write_table(base, dst, row_group_size=131_072)
            print(f"{name}: {len(base)} -> {len(base)} rows")
            continue
        # stream one copy at a time: factor 1000 of lineitem is 600M
        # rows -- the old concat-everything path needed O(factor) of
        # the base table in RAM at once
        total = 0
        writer = pq.ParquetWriter(dst, base.schema)
        try:
            for k in range(args.factor):
                out = _copy(base, name, k)
                writer.write_table(out, row_group_size=131_072)
                total += len(out)
        finally:
            writer.close()
        print(f"{name}: {len(base)} -> {total} rows", flush=True)


if __name__ == "__main__":
    main()
