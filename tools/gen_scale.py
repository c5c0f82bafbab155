"""Generate a scaled-up replica of the sf0.1 corpus for scale probing.

Key-shifted replication: each copy offsets every key column (orderkey,
custkey, partkey, suppkey, event_id, user_id, doc_id, vec_id) by
copy_index * stride, so FK relationships hold within each copy and
result cardinalities scale linearly — every query stays semantically
valid, just N× bigger. Dimension tables (region/nation) are shared;
customer/supplier/part are replicated with shifted keys so fact FKs
resolve.

Usage: python tools/gen_scale.py [N] [outdir]   (default 16 /tmp/nipd_scale16)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000

# table -> columns to offset per copy
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/nipd_scale{n}"
    os.makedirs(out, exist_ok=True)
    for t in SHARED:
        src = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(src, f"{out}/{t}.parquet")
        print(f"{t}: {src.num_rows} (shared)")
    for t, keys in SHIFT.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(n):
            c = src
            for k in keys:
                col = c.column(k)
                shifted = pc.add(col, pa.scalar(i * STRIDE, type=col.type))
                c = c.set_column(c.schema.get_field_index(k), k, shifted)
            copies.append(c)
        big = pa.concat_tables(copies)
        # Byte-targeted row groups instead of a fixed 1M rows: a Spark
        # scan task can split a file only at row-group boundaries, and
        # the old fixed-row sizing left e.g. the 100x documents table as
        # ONE 57 MB row group — every downstream text query scanned (and
        # tokenized) on a single thread regardless of maxPartitionBytes
        # (r12 optimization round; guide §6 file layout). The r12 flat
        # ~8 MB target still capped the SMALLER replicated tables: 100x
        # documents came out as 8 row groups / 58 MB, so every
        # tokenize-heavy text query ran its scan stages at ≤8-way
        # parallelism on 32 cores (r13 measurement: l67's scan stages ran
        # 5 tasks). Per-table target = clamp(replica_bytes/32, 1 MB, 8 MB):
        # big tables keep the 8 MB groups, small-but-hot ones (documents,
        # embeddings, events) become ≥~32-way splittable. DuckDB
        # parallelizes over row groups the same way, so the twin baseline
        # benefits identically — the layout is neutral.
        src_bytes = os.path.getsize(f"{SRC}/{t}.parquet")
        bpr = max(1, src_bytes // src.num_rows)
        rg_bytes = min(max((src_bytes * n) // 32, 1 << 20), 8 << 20)
        rows_per_rg = max(5_000, rg_bytes // bpr)
        pq.write_table(big, f"{out}/{t}.parquet", row_group_size=rows_per_rg)
        print(f"{t}: {src.num_rows} -> {big.num_rows} (rg={rows_per_rg})")


if __name__ == "__main__":
    main()
