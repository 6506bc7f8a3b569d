"""Build a K×-scaled copy of an sf dir by key-shifted concatenation —
the decade-scaling evidence harness (VERDICT r4 item 4). No external
data: every row comes from the source tables; keys are shifted by
copy-index × (max_key + 1) so uniqueness/FD structure is preserved
and per-key group sizes stay realistic rather than exploding.

Usage: python tools/make_sf_scale.py SRC_DIR DST_DIR [K=10]

Big tables (customer/part/orders/lineitem/events/documents/
embeddings) are concatenated K times with shifted keys; the small
dimensions (supplier/nation/region) copy as-is so FK joins still
resolve. Timestamps/text/embeddings repeat verbatim — wall-time
scaling of the engine depends on row counts and key cardinalities,
both of which scale exactly K×.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table: columns to shift (column -> stride source column giving
# the key space being multiplied). A stride of None means "this
# table's own primary key stride".
SHIFT = {
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["supplier", "nation", "region"]


def scale_dir(src: str, dst: str, k: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    # strides come from the SOURCE key spaces so cross-table FKs shift
    # consistently (o_custkey shifts by the CUSTOMER stride, l_partkey
    # by the PART stride, ...)
    strides: dict[str, int] = {}
    for tbl, cols in SHIFT.items():
        t = pq.read_table(f"{src}/{tbl}.parquet", columns=[cols[0]])
        strides[cols[0]] = int(pc.max(t.column(cols[0])).as_py()) + 1
    stride_of = {
        "c_custkey": strides["c_custkey"],
        "p_partkey": strides["p_partkey"],
        "o_orderkey": strides["o_orderkey"],
        "o_custkey": strides["c_custkey"],
        "l_orderkey": strides["o_orderkey"],
        "l_partkey": strides["p_partkey"],
        "event_id": strides["event_id"],
        "user_id": None,  # filled below from events.user_id
        "doc_id": strides["doc_id"],
        "vec_id": strides["vec_id"],
    }
    ev = pq.read_table(f"{src}/events.parquet", columns=["user_id"])
    stride_of["user_id"] = int(pc.max(ev.column("user_id")).as_py()) + 1

    for tbl, cols in SHIFT.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        parts = []
        for i in range(k):
            if i == 0:
                parts.append(t)
                continue
            arrays = []
            for name in t.column_names:
                col = t.column(name)
                if name in cols:
                    shifted = pc.add(
                        col, pa.scalar(i * stride_of[name], type=col.type)
                    )
                    arrays.append(shifted)
                else:
                    arrays.append(col)
            parts.append(pa.table(dict(zip(t.column_names, arrays))))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{tbl}.parquet")
        print(f"{tbl}: {t.num_rows} -> {out.num_rows}")
    for tbl in COPY:
        shutil.copy(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")
        print(f"{tbl}: copied")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_dir(src, dst, k)
