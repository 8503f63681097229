"""Tile the driver testdata to a larger scale for out-of-band smoke runs.

Replicates each table K times with per-copy KEY OFFSETS, so join structure
and id contiguity are preserved exactly (new custkeys = old + i·max_key,
lineitems follow their order's offset, doc/vec ids stay 0..K·N−1). The
result is a valid input dir for every `queries()` entry AND for the DuckDB
oracles — which is the point: the same hash-exact comparison the driver
runs at sf0.01 can run at 20× sf0.1 (12M lineitem rows), where int64
accumulator overflows, block-split sensitivity and quadratic blowups
actually show. (This smoke caught the Σprice² int64 overflow in
lineitem_qty_price_corr that sf0.1 missed by 20%.)

Usage:  python tools/tile_testdata.py [K] [SRC] [DST]
        defaults: K=20, SRC=/root/testdata/sf0.1, DST=/tmp/sf_x{K}
Then:   python /tmp/hashcheck.py /tmp/sf_x20 <query names...>
(Skip the deliberately quadratic oracles — pair-emitting near-dup SQL and
recursive closures — whose DuckDB side is O(n²) by design.)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _rep(src_path: str, dst_path: str, shifts: dict, k: int, rg: int = 500_000):
    t = pq.read_table(src_path)
    parts = []
    for i in range(k):
        cols = {}
        for c in t.column_names:
            if c in shifts:
                cols[c] = pa.array(
                    t[c].to_numpy(zero_copy_only=False).astype(np.int64)
                    + i * shifts[c],
                    pa.int64(),
                )
            else:
                cols[c] = t[c].combine_chunks()
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst_path, row_group_size=rg)
    return out.num_rows


def tile(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in ("nation", "region", "part", "supplier"):
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    def max_plus_1(table: str, col: str) -> int:
        t = pq.read_table(f"{src}/{table}.parquet", columns=[col])
        return int(pa.compute.max(t[col]).as_py()) + 1

    ck = max_plus_1("customer", "c_custkey")
    ok = max_plus_1("orders", "o_orderkey")
    eid = max_plus_1("events", "event_id")
    uid = max_plus_1("events", "user_id")
    n_docs = pq.ParquetFile(f"{src}/documents.parquet").metadata.num_rows
    n_vecs = pq.ParquetFile(f"{src}/embeddings.parquet").metadata.num_rows

    for name, shifts in [
        ("customer", {"c_custkey": ck}),
        ("orders", {"o_orderkey": ok, "o_custkey": ck}),
        ("lineitem", {"l_orderkey": ok}),
        ("events", {"event_id": eid, "user_id": uid}),
        ("documents", {"doc_id": n_docs}),
        ("embeddings", {"vec_id": n_vecs}),
    ]:
        n = _rep(f"{src}/{name}.parquet", f"{dst}/{name}.parquet", shifts, k)
        print(f"{name}: {n} rows")
    with open(f"{dst}/_DONE", "w") as f:
        f.write("ok")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_x{k}"
    tile(src, dst, k)
