"""Replicate a testdata SF directory N-fold with referential integrity,
for scaling-curve measurements (SCALE.md).

Each replica r (0..N-1; r=0 is the identity copy) offsets every
table-local key by r * 10_000_000, so joins resolve within a replica
exactly as they do in the source data — the bounded dims (region,
nation) stay single-copy, as they would at any real scale.  Documents
get one prepended replica token, which makes cross-replica copies
*near*-duplicates (Jaccard ~0.95): the dedup tier then faces the
realistic mirrored-crawl shape instead of a 10x exact-dup degenerate.

Usage:
    python tools/make_scaled_corpus.py SRC_DIR OUT_DIR N_REPLICAS

The output is bench-compatible: SPARK_GRAFT_SF_DIR=OUT_DIR python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10_000_000

# table -> columns to offset per replica
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
SINGLE = ["region", "nation"]


def main(src: str, out: str, n: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT range AS r FROM range({n})")
    for t in SINGLE:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet'"
        )
    for t, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r * {OFF} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' CROSS JOIN reps) "
            f"TO '{out}/{t}.parquet'"
        )
    # documents: offset the id, prepend a replica token (near-dup, not
    # exact-dup), keep n_chars consistent with the mutated text
    con.execute(
        f"""
        COPY (
          SELECT doc_id + r * {OFF} AS doc_id,
                 CASE WHEN r = 0 THEN text
                      ELSE 'replica' || CAST(r AS VARCHAR) || ' ' || text
                 END AS text,
                 lang, source,
                 CAST(len(CASE WHEN r = 0 THEN text
                      ELSE 'replica' || CAST(r AS VARCHAR) || ' ' || text
                 END) AS BIGINT) AS n_chars
          FROM '{src}/documents.parquet' CROSS JOIN reps
        ) TO '{out}/documents.parquet'
        """
    )


if __name__ == "__main__":
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    main(src, out, n)
    print(f"wrote {out} = {n}x {src}")
