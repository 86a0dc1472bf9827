"""Scale up an sf dir by key-shifted replication (default 10x: sf0.1 ->
'sf1'-scale) for larger-input per-query benchmarking.

The driver only ships sf{0.001,0.01,0.1}; at sf0.1 most bench queries sit
on 1-3 s fixed-overhead floors, so round-over-round regressions in REAL
work are invisible (VERDICT r2 next-round #6). Each replica copy shifts
every synthetic key (custkey/orderkey/doc_id/vec_id/...) by copy_i *
stride, so joins fan out exactly like genuinely larger data; foreign keys
stay consistent because parent and child shift together. nation/region are
dimension tables and are not replicated.

Usage: python tools/make_sf_replica.py [src_dir] [dst_dir] [factor]
Default: /root/testdata/sf0.1 /tmp/kr_sf1 10 (DuckDB does the work — no
Spark session, so it can run next to a live measurement).
"""

from __future__ import annotations

import os
import sys

import duckdb

# per-table key columns that must shift per copy (dimension keys like
# nationkey/partkey/suppkey reference non-replicated tables and stay put)
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": None,  # discovered from schema at runtime
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_ONLY = ["region", "nation"]
STRIDE = 10_000_000


def replicate(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFT.items():
        path = os.path.join(src, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{path}')"
            ).fetchall()
        ]
        if keys is None:
            keys = [c for c in cols if c.endswith("_id") or c.endswith("key")]
        parts = []
        for i in range(factor):
            sel = ", ".join(
                f"{c} + {i * STRIDE} AS {c}" if c in keys else c for c in cols
            )
            parts.append(f"SELECT {sel} FROM read_parquet('{path}')")
        union = " UNION ALL ".join(parts)
        out = os.path.join(dst, f"{table}.parquet")
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows")
    for table in COPY_ONLY:
        path = os.path.join(src, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        out = os.path.join(dst, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{path}')) TO '{out}' (FORMAT PARQUET)"
        )
    print(f"replica at {dst}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kr_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    replicate(src, dst, factor)
