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


def _permute_words(text: str, k: int) -> str:
    """Deterministic per-copy word shuffle (md5-keyed order): destroys
    word ADJACENCY, so shingle sets decorrelate across copies, while
    word counts, char counts and whitespace structure stay identical
    (split/join on single spaces is length-preserving)."""
    import hashlib

    w = text.split(" ")
    order = sorted(
        range(len(w)),
        key=lambda i: hashlib.md5(f"{k}:{i}".encode()).digest(),
    )
    return " ".join(w[i] for i in order)


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
        i = out.schema.get_field_index("embedding")
        rotated = pa.array(
            [v[k % len(v):] + v[: k % len(v)] if v else v
             for v in out.column(i).to_pylist()],
            type=out.schema.field(i).type,
        )
        out = out.set_column(i, out.schema.field(i), rotated)
    return out


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(here, ".localdata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    names = COPY_ONCE + tuple(KEYED)
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
