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

CONTENT tables are additionally made replica-DISJOINT so the dedup /
near-dup / ANN families measure real 10x candidate volume instead of
collapsing 10 byte-identical copies back to sf0.1 after their first
exact-dedup stage (the caveat the first sf1 cut had to disclose):

- documents.text: each replica applies its own PERMUTATION of the
  (closed, 31-word) vocabulary, remapped simultaneously per token.
  A bijective token map preserves every within-replica property the
  dedup family measures — exact-dup groups, shingle-set Jaccard
  (shingles map bijectively), token counts, doc lengths — while two
  replicas of the same document share only the corpus-baseline
  similarity of two random docs (near-uniform word frequencies keep
  corpus-level term stats in distribution).
- embeddings.embedding: each replica applies its own SIGNED
  COORDINATE PERMUTATION (an orthogonal transform): within-replica
  norms, dot products, and cosine structure are preserved EXACTLY,
  while cross-replica copies of a vector decorrelate to ~random
  cosine — so kNN graphs, LSH bucket loads, and top-k candidate
  volume genuinely grow 10x instead of degenerating into clone
  clusters at distance 0.

Replica 0 is the identity for both (byte-identical to sf0.1 modulo
keys). All permutations are seeded from fixed strings — rerunning the
script reproduces the same sf1 bit-for-bit.

This preserves per-replica value distributions exactly, multiplies
group/key cardinalities by 10, and keeps skew shape — the properties
a wall-clock scaling probe needs. It is NOT driver data: sf1 numbers
feed SCALING.md only, never correctness oracles.

A second decade (sf10) is the same construction with 100 replicas:
`python3 tools/make_sf1.py /root/repo/target/sf10 100`. Replica seeds
are keyed by ABSOLUTE replica index, so sf1 is a strict prefix of
sf10's replica set and the sf1 output stays bit-for-bit unchanged.
The key-offset steps (powers of 10 well above each sf0.1 cardinality)
keep replica key ranges disjoint up to 1,000+ replicas.

Usage: python3 tools/make_sf1.py [outdir=/root/repo/target/sf1] [replicas=10]
"""
import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
EMB_DIM = 64

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


def vocab(con):
    """The closed vocabulary of documents.text (space-separated)."""
    return [w for (w,) in con.execute(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM '{SRC}/documents.parquet' ORDER BY 1").fetchall()]


def text_expr(words, r):
    """Per-replica simultaneous vocab permutation of `text`.

    CASE inside list_transform remaps every token in one pass (nested
    replace() would chain substitutions and break bijectivity).
    """
    if r == 0:
        return "text"
    perm = list(words)
    random.Random(f"sf1vocab:{r}").shuffle(perm)
    arms = " ".join(f"WHEN '{a}' THEN '{b}'"
                    for a, b in zip(words, perm) if a != b)
    return ("array_to_string(list_transform(string_split(text, ' '), "
            f"w -> CASE w {arms} ELSE w END), ' ')")


def emb_expr(r):
    """Per-replica signed coordinate permutation of `embedding`."""
    if r == 0:
        return "embedding"
    rng = random.Random(f"sf1emb:{r}")
    perm = list(range(EMB_DIM))
    rng.shuffle(perm)
    signs = [rng.choice((-1, 1)) for _ in range(EMB_DIM)]
    terms = ", ".join(f"embedding[{p + 1}]*({s})"
                      for p, s in zip(perm, signs))
    return f"[{terms}]::FLOAT[]"


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    words = vocab(con)
    for t, offs in OFFSETS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]

        def sel(c, r):
            if c in offs:
                return f"{c} + {r * offs[c]} AS {c}"
            if t == "events" and c == "ts":
                return f"ts + INTERVAL {r * 180} DAY AS ts"
            if t == "documents" and c == "text":
                return f"{text_expr(words, r)} AS text"
            if t == "embeddings" and c == "embedding":
                return f"{emb_expr(r)} AS embedding"
            return c

        parts = " UNION ALL ".join(
            "SELECT " + ", ".join(sel(c, r) for c in cols)
            + f" FROM '{SRC}/{t}.parquet'"
            for r in range(REPLICAS))
        con.execute(f"""
            COPY (SELECT * FROM ({parts}) ORDER BY {cols[0]})
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
