"""Synthesize a larger SF from an existing testdata directory by
deterministic key-shifted replication (VERDICT r10 next-round #2).

    PYTHONPATH=. python scripts/make_scale.py \
        [--src /root/testdata/sf0.1] [--out testdata_sf1] [--factor 10]

Replica 0 is byte-identical to the source; replica i shifts every key
domain by i * a fixed stride far above the source's max key, so every
foreign-key relationship (orders->customer, lineitem->orders/part/
supplier, events->user) survives intact and join fan-outs stay the
source's fan-outs.  Fixed dimensions (region, nation) copy as-is, the
TPC-H rule.  Timestamps are NOT shifted: a 10x corpus over the same
window is the realistic scale-up (10x rows per date/session group,
same group count), and it keeps window/retention queries meaningful.

Two columns get a deterministic PER-REPLICA perturbation so the scaled
corpus models "10x more documents", not "10 exact copies of each":

- documents.text: every third token (by a fixed hash of doc_id, token
  index and replica) is salted with the replica id.  Exact-dup and
  near-dup cluster SIZES stay what the source had; cluster COUNT
  scales 10x.  Without this, every MinHash/SimHash bucket would hold
  10 identical twins and pair-generation would blow up quadratically
  in the replication factor - a workload artifact, not a plan
  property.  n_chars is recomputed to match.
- embeddings.embedding: replica i rotates the vector by i positions
  (np.roll).  Norms and the coordinate distribution are preserved;
  cosine between a vector and its rotation is ~random, so ANN top-k
  does not degenerate to finding replicas.

No RNG anywhere - reruns are byte-stable (the driver's seed=42 data
plus pure arithmetic).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key-domain strides: far above the source max of each domain at any
# SF this script is pointed at (sf0.1 maxes: orderkey 149_999,
# custkey 14_999, suppkey 999, partkey 19_999, event_id 99_999,
# user_id 1_499, doc_id 4_999, vec_id 1_999)
STRIDES = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "event": 10_000_000,
    "user": 1_000_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
}

# table -> {column: key domain}
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_AS_IS = ["region", "nation"]


def _salt_texts(
    texts: list[str | None], doc_ids: np.ndarray, rep: int
) -> list[str | None]:
    out: list[str | None] = []
    for did, t in zip(doc_ids.tolist(), texts):
        if t is None:
            out.append(None)
            continue
        toks = t.split(" ")
        for j in range(len(toks)):
            # fixed multiplicative hash; ~1/3 of tokens salted, a
            # DIFFERENT third per replica so replicas are near-dups
            # of nothing (Jaccard vs any other replica ~0.5/1.5=0.33)
            if (j * 2654435761 + did * 40503 + rep * 69069) % 3 == 0:
                toks[j] = f"{toks[j]}r{rep}"
        out.append(" ".join(toks))
    return out


def _replicate(name: str, src: pa.Table, factor: int) -> pa.Table:
    reps = []
    for i in range(factor):
        t = src
        if i > 0:
            for col, dom in SHIFTS.get(name, {}).items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t.column(col), i * STRIDES[dom])
                shifted = shifted.cast(t.schema.field(col).type)
                t = t.set_column(idx, t.schema.field(col), shifted)
            if name == "documents":
                ids = src.column("doc_id").to_numpy()
                texts = _salt_texts(
                    src.column("text").to_pylist(), ids, i)
                idx = t.schema.get_field_index("text")
                t = t.set_column(
                    idx, t.schema.field("text"),
                    pa.array(texts, type=t.schema.field("text").type))
                idx = t.schema.get_field_index("n_chars")
                n = pa.array(
                    [None if x is None else len(x) for x in texts],
                    type=t.schema.field("n_chars").type)
                t = t.set_column(idx, t.schema.field("n_chars"), n)
            if name == "embeddings":
                col = src.column("embedding").combine_chunks()
                if isinstance(col, pa.ChunkedArray):
                    col = col.chunk(0)
                flat = col.flatten().to_numpy(zero_copy_only=False)
                offs = col.offsets.to_numpy(zero_copy_only=False)
                rolled = np.concatenate([
                    np.roll(flat[offs[k]:offs[k + 1]], i)
                    for k in range(len(offs) - 1)
                ]) if len(offs) > 1 else flat
                arr = pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()),
                    pa.array(rolled,
                             type=col.type.value_type))
                idx = t.schema.get_field_index("embedding")
                t = t.set_column(
                    idx, t.schema.field("embedding"),
                    arr.cast(t.schema.field("embedding").type))
        reps.append(t)
    return pa.concat_tables(reps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="testdata_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in COPY_AS_IS + list(SHIFTS):
        src = pq.read_table(f"{args.src}/{name}.parquet")
        out = (src if name in COPY_AS_IS
               else _replicate(name, src, args.factor))
        # drop pandas metadata; row groups sized so Spark still gets
        # parallel splits (64k rows per group)
        out = out.replace_schema_metadata(None)
        pq.write_table(
            out, f"{args.out}/{name}.parquet", row_group_size=65536)
        print(name, src.num_rows, "->", out.num_rows)


if __name__ == "__main__":
    main()
