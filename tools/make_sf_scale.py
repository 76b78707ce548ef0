"""Deterministically replicate a testdata SF directory K× (default 10×).

Produces the "one scale up" input for the BASELINE.md scale window: each
replica r offsets every key column by r·(max_key+1), keeps FK consistency
(orders.o_custkey shifts with customer.c_custkey, lineitem.l_orderkey with
orders.o_orderkey, ...), shifts timestamps by r hours, and suffixes document
text with a per-replica token (replicas become near-duplicates — the
realistic shape of a bigger crawl — rather than exact clones). Dimension
tables (nation, region) copy once.

Usage: python tools/make_sf_scale.py /root/testdata/sf0.1 /tmp/takco_sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns that shift by r·stride per table; stride derives from the
# table that OWNS the key so FKs stay consistent
KEY_OWNERS = {
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
DIMENSIONS = {"nation", "region"}
HOUR_US = 3_600_000_000


def main(src: str, dst: str, k: int = 10):
    os.makedirs(dst, exist_ok=True)
    tables = {
        os.path.splitext(f)[0]: pq.read_table(os.path.join(src, f))
        for f in sorted(os.listdir(src))
        if f.endswith(".parquet")
    }
    strides = {}
    for col, (tab, owner_col) in KEY_OWNERS.items():
        if tab in tables:
            strides[col] = int(pc.max(tables[tab].column(owner_col)).as_py()) + 1

    for name, t in tables.items():
        if name in DIMENSIONS:
            pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
            continue
        parts = []
        for r in range(k):
            cols = {}
            for c in t.column_names:
                col = t.column(c)
                if c in strides and r:
                    col = pc.add(col, pa.scalar(r * strides[c], type=pa.int64())).cast(
                        col.type
                    )
                elif pa.types.is_timestamp(col.type) and r:
                    shifted = pc.add(col.cast(pa.int64()),
                                     pa.scalar(r * HOUR_US, type=pa.int64()))
                    col = shifted.cast(col.type)
                elif c == "text" and r:
                    col = pc.binary_join_element_wise(
                        col, pa.scalar(f" replica{r}"), ""
                    )
                cols[c] = col
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/takco_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, k)
