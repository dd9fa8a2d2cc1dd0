#!/usr/bin/env python3
"""Synthesize an sf1-scale tier (~10x sf0.1) for the scale soak.

The driver ships sf0.001/0.01/0.1 only; the soak wants one tier up. Each
fact table is replicated 10x with a consistent key offset so FK joins
stay coherent (copy k adds k*OFF to every BIGINT key column); the tiny
dims (region, nation) are copied once, like real dims. Documents get a
per-copy text marker and embeddings a deterministic per-copy jitter so
the replicas are near-dups rather than exact ties (exact 10-way ties
would make top-k tie-breaking diverge between engines). events keeps its
TIMESTAMP(NANOS) physical type via pyarrow (Spark reads it through
nanosAsLong; DuckDB as TIMESTAMP) — parity with the driver-generated
originals.

The duplication knob (third arg, percent, default 100) controls what
fraction of each replica copy's documents remain near-dups of copy 0:
the rest get a marker interleaved every 20 characters, which breaks
every 25-char gram they shared with the original — so the suffix-dedup
soak can separate STRUCTURAL scaling from the by-construction ~90%
duplicate density of the default replica corpus (round-9 verdict #5).

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir] [dup_pct]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1, dup_pct=100
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
DUP_PCT = int(sys.argv[3]) if len(sys.argv) > 3 else 100
# 4th arg: replica count (default 10 = the sf1 tier; 100 = the r17
# 10x-up tier). 5th arg: comma-list of tables to emit (default all) --
# the 10x family-store tier needs documents only, not 60M lineitem rows.
COPIES = int(sys.argv[4]) if len(sys.argv) > 4 else 10
ONLY = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
OFF = 100_000_000

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
SINGLE = ["region", "nation"]


def shift(table, keys, k):
    off = k * OFF
    cols = {}
    for name in table.column_names:
        col = table.column(name)
        if name in keys and off:
            col = pc.add(col, off)
        cols[name] = col
    return pa.table(cols)


def perturb_documents(table, k):
    if k == 0:
        return table
    text = pc.binary_join_element_wise(
        pc.cast(table.column("text"), pa.string()), f" c{k}", "")
    if DUP_PCT < 100:
        # uniquify the (100-DUP_PCT)% tail: a per-(copy, doc) marker
        # every 20 chars leaves no 25-char window of original text
        ids = table.column("doc_id").to_pylist()
        txts = text.to_pylist()
        out = []
        for did, t in zip(ids, txts):
            if t is None or (did % 100) < DUP_PCT:
                out.append(t)
            else:
                m = f"~{k}.{did % 997}~"
                out.append(m.join(t[i:i + 20]
                                  for i in range(0, max(len(t), 1), 20)))
        text = pa.array(out, type=pa.string())
    return table.set_column(table.column_names.index("text"), "text", text)


def perturb_embeddings(table, k):
    if k == 0:
        return table
    vids = table.column("vec_id").to_pylist()
    embs = table.column("embedding").to_pylist()
    out = []
    for vid, e in zip(vids, embs):
        out.append([
            x + ((vid * 31 + j * 17 + k * 7) % 1009 - 504) * 1e-5
            for j, x in enumerate(e)])
    col = pa.array(out, type=table.schema.field("embedding").type)
    return table.set_column(
        table.column_names.index("embedding"), "embedding", col)


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    for t in SINGLE:
        if ONLY is not None and t not in ONLY:
            continue
        src = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(src, f"{DST}/{t}.parquet")
        print(t, src.num_rows)
    for t, keys in KEYED.items():
        if ONLY is not None and t not in ONLY:
            continue
        src = pq.read_table(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(COPIES):
            p = shift(src, keys, k)
            if t == "documents":
                p = perturb_documents(p, k)
            if t == "embeddings":
                p = perturb_embeddings(p, k)
            parts.append(p)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(t, src.num_rows, "->", out.num_rows)


if __name__ == "__main__":
    main()
