#!/usr/bin/env python3
"""Replicate a testdata SF dir N-fold for scale verification.

Usage: python3 tools/make_sfbig.py <srcDir> <dstDir> <n>
       python3 tools/make_sfbig.py /root/testdata/sf0.1 /tmp/sfbig10 10

Copy i (i = 0..n-1) offsets every entity key by i * 10_000_000 so keys
stay unique and 8-digit-wide (exercises magnitude-sensitive code:
decimal sums past 2^53-adjacent territory, multi-row-group scans,
wide hash keys). The nation/region dims are shared across copies
(their keys are NOT offset, so every copy's customers still join).

Document texts in copies i > 0 get every token suffixed with "~i",
which makes their 3-gram shingle sets disjoint from every other copy:
near-dup structure replicates WITHIN each copy without manufacturing
quadratic cross-copy duplicate families. n_chars is recomputed so the
column stays consistent with the rewritten text.

events.parquet is rewritten preserving the TIMESTAMP(NANOS) physical
type (the replica must keep exercising the nanos read branch in
graft.Tables.events).
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000

# key columns to offset per copy; tables absent here are either shared
# dims (region, nation) or handled specially (documents)
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}


def offset_col(tbl, name, delta):
    i = tbl.schema.get_field_index(name)
    col = pc.add(tbl.column(name), pa.scalar(delta, type=tbl.schema.field(i).type))
    return tbl.set_column(i, name, col)


def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
        print(f"{t}: shared single copy")
    for t, keys in OFFSET_KEYS.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        copies = []
        for i in range(n):
            c = base
            for k in keys:
                c = offset_col(c, k, i * OFF)
            copies.append(c)
        out = pa.concat_tables(copies)
        # store_schema+coerce defaults preserve ns timestamps with parquet
        # writer version 2.6 (pyarrow default); assert rather than assume
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {out.num_rows} rows ({n}x)")
    got = pq.read_schema(f"{dst}/events.parquet").field("ts").type
    want = pq.read_schema(f"{src}/events.parquet").field("ts").type
    assert got == want, f"events ts type changed: {want} -> {got}"
    base = pq.read_table(f"{src}/documents.parquet")
    texts = base.column("text").to_pylist()
    copies = []
    for i in range(n):
        c = offset_col(base, "doc_id", i * OFF)
        if i > 0:
            newt = [
                None if t is None
                else " ".join(tok + f"~{i}" for tok in t.split(" "))
                for t in texts
            ]
            ti = c.schema.get_field_index("text")
            c = c.set_column(ti, "text", pa.array(newt, type=pa.string()))
            ni = c.schema.get_field_index("n_chars")
            c = c.set_column(ni, "n_chars", pa.array(
                [None if t is None else len(t) for t in newt], type=pa.int64()))
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/documents.parquet")
    print(f"documents: {out.num_rows} rows ({n}x, shingle-disjoint copies)")


if __name__ == "__main__":
    main()
