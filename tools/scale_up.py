#!/usr/bin/env python3
"""Build a K-fold scaled replica of a testdata SF dir for scale stress
runs (dev tool — the driver's testdata is read-only and tops out at
sf0.1, so scale-dependent ties/skew are flushed on a synthetic K x
replica instead).

Usage: python3 tools/scale_up.py <srcDir> <dstDir> <K>

Every fact table is unioned K times with copy i's key columns shifted
by i * (domain max + 1) so primary keys stay unique and foreign keys
stay consistent WITHIN a copy (the join graph becomes K disjoint
replicas of the original — same per-key densities, K x volume).
Dimension tables (region, nation) and all non-key payloads (texts,
embeddings, timestamps) are kept verbatim: duplicated texts/vectors are
a deliberately harsh dedup/ANN stress, and the DuckDB oracle replays on
the same scaled files, so the correctness compare stays exact.
pyarrow preserves the physical parquet types verbatim — whatever
encoding events.ts ships in (NANOS through round 5, MICROS since
round 6), the replica keeps it and the engine's adaptive read
(Tables.tsUsCol) handles it."""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src, dst, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)

DIMS = ["region", "nation"]
SHIFT = {  # table -> {column: domain whose (max+1) is the copy stride}
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {"o_orderkey": "orders.o_orderkey",
               "o_custkey": "customer.c_custkey"},
    "lineitem": {"l_orderkey": "orders.o_orderkey",
                 "l_partkey": "part.p_partkey",
                 "l_suppkey": "supplier.s_suppkey"},
    "events": {"event_id": "events.event_id", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}

stride = {}
for ref in sorted({r for m in SHIFT.values() for r in m.values()}):
    t, c = ref.split(".")
    stride[ref] = pc.max(pq.read_table(f"{src}/{t}.parquet", columns=[c])[c]).as_py() + 1

for t in DIMS:
    pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
    print(f"{t}: copied verbatim")

for t, m in SHIFT.items():
    base = pq.read_table(f"{src}/{t}.parquet")
    copies = []
    for i in range(K):
        tab = base
        if i > 0:
            for name, ref in m.items():
                idx = tab.column_names.index(name)
                shifted = pc.add(tab[name], i * stride[ref])
                tab = tab.set_column(idx, tab.schema.field(idx), shifted)
        copies.append(tab)
    out = pa.concat_tables(copies)
    # Realistic row-group layout: pyarrow's default (1M rows/group) packs a
    # 500k-row text table into ONE row group, and a row group is the atomic
    # parquet read unit — every Spark byte-range split but one comes back
    # empty and the whole corpus streams through a single task (the round-16
    # serial-scan find). Target ~32 groups (the local core count) with a
    # 2k-row floor so fat tables split natively while narrow fact tables
    # keep pyarrow-default-sized groups.
    rg = min(1 << 20, max(2000, out.num_rows // 32))
    pq.write_table(out, f"{dst}/{t}.parquet", row_group_size=rg)
    print(f"{t}: {base.num_rows} -> {out.num_rows} (row_group_size={rg})")
