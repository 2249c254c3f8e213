#!/usr/bin/env python3
"""Generate a bench-only sf1 decade (driver-side tooling, never on the
engine classpath; output is gitignored under target/).

/root/testdata is read-only and the driver generates no sf1, so the
SCALING.md sweep's next decade is built by SELF-SIMILAR TILING of the
committed sf0.1 tables: 10 replicas of every scaling table with all
entity keys offset per replica (orderkey/custkey/partkey/suppkey move
together, so FK joins stay exactly as selective; doc_id/vec_id/
event_id/user_id likewise; event ts shifts by replica*180 days so the
time axis grows with the data instead of densifying). Dimension
tables (nation, region) stay fixed, as TPC-H scaling does.

This preserves per-replica value distributions exactly (each replica
is byte-identical modulo keys), multiplies group/key cardinalities by
10, and keeps skew shape — the properties a wall-clock scaling probe
needs. It is NOT driver data: sf1 numbers feed SCALING.md only, never
correctness oracles.

Usage: python3 tools/make_sf1.py [outdir=/root/repo/target/sf1]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"

# table -> (key offsets applied per replica r as col + r * step)
# steps are the sf0.1 cardinalities rounded up to a clean power of 10
# so replica key ranges can never collide.
OFFSETS = {
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "events": {"event_id": 1_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}
COPY_ONLY = ["nation", "region"]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, offs in OFFSETS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.r * {offs[c]} AS {c}" if c in offs else
            (f"{c} + INTERVAL (r.r * 180) DAY AS {c}"
             if t == "events" and c == "ts" else c)
            for c in cols)
        con.execute(f"""
            COPY (SELECT {sel}
                  FROM '{SRC}/{t}.parquet', (SELECT unnest(range(10)) AS r) r
                  ORDER BY {cols[0]})
            TO '{OUT}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(t, n)
    for t in COPY_ONLY:
        con.execute(f"""COPY (SELECT * FROM '{SRC}/{t}.parquet')
                        TO '{OUT}/{t}.parquet' (FORMAT PARQUET)""")
        print(t, "copied")


if __name__ == "__main__":
    main()
