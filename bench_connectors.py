#!/usr/bin/env python
"""Connector bench: K7 store-build (global range-sort + class index) and
the S13 SQLite rowid-range scan, measured at bench scale so the two
connectors carry numbers, not just unit tests (SCALE.md 'Measured').

K7 input: sf0.1 lineitem (~600k rows) dressed as merged records — yuid =
uuid-formatted md5 of the row key (uniform keys, the store's real
distribution), payload = a small JSON body.  S13 input: a generated
multi-MB SQLite fixture (geojson-table shape).

Prints one JSON line:
  {"k7_rows": N, "k7_sort_sec": s, "k7_index_sec": s,
   "k7_shard_rows": {min,max},
   "s13_rows": N, "s13_mb": M, "s13_scan_sec": s}
"""

from __future__ import annotations

import json
import os
import sqlite3
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_spark.session import get_spark  # noqa: E402
from data_pipeline_spark.sinks.kv_store import (  # noqa: E402
    class_index_batches, kv_records, prepare_kv_dataset,
)
from data_pipeline_spark.sources.wof import load_sqlite_table  # noqa: E402


def _uuid_hex(col):
    h = F.md5(col)
    return F.concat_ws(
        "-", h.substr(1, 8), h.substr(9, 4), h.substr(13, 4), h.substr(17, 4),
        h.substr(21, 12),
    )


def bench_k7(spark, sf_dir: str, out_dir: str) -> dict:
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    key = F.concat_ws("|", "l_orderkey", "l_linenumber")
    merged = li.select(
        F.concat(F.lit("https://x.test/data/"), _uuid_hex(key)).alias("yuid"),
        F.concat(F.lit("Class"), (F.crc32(key) % 8).cast("string")).alias("rectype"),
        F.to_json(F.struct("l_orderkey", "l_partkey", "l_quantity",
                           "l_extendedprice", "l_shipdate")).alias("data"),
    )
    recs = kv_records(merged)
    runs = os.path.join(out_dir, "kvruns")
    t0 = time.perf_counter()
    prepare_kv_dataset(recs, runs, n_shards=24)
    sort_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    idx = class_index_batches(spark.read.parquet(runs))
    n_batches = idx.count()
    index_sec = round(time.perf_counter() - t0, 3)

    import glob

    import pyarrow.parquet as pq

    per_shard = [pq.read_metadata(p).num_rows
                 for p in sorted(glob.glob(f"{runs}/part-*"))]
    return {
        "k7_rows": sum(per_shard),
        "k7_sort_sec": sort_sec,
        "k7_index_sec": index_sec,
        "k7_index_batches": n_batches,
        "k7_shard_rows": {"min": min(per_shard), "max": max(per_shard),
                          "n": len(per_shard)},
    }


def bench_s13(spark, out_dir: str, n_rows: int = 200_000) -> dict:
    db = os.path.join(out_dir, "wof_bench.sqlite")
    body = json.dumps({
        "type": "Feature",
        "properties": {"wof:name": "Somewhere", "wof:placetype": "locality",
                       "pad": "x" * 200},
        "geometry": {"type": "Point", "coordinates": [2.5, 48.25]},
    })
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE geojson (id INTEGER, body TEXT)")
    conn.executemany(
        "INSERT INTO geojson VALUES (?, ?)",
        ((i, body) for i in range(n_rows)),
    )
    conn.commit()
    conn.close()
    mb = round(os.path.getsize(db) / 1e6, 1)

    t0 = time.perf_counter()
    n = load_sqlite_table(spark, db, n_partitions=32).count()
    scan_sec = round(time.perf_counter() - t0, 3)
    return {"s13_rows": n, "s13_mb": mb, "s13_scan_sec": scan_sec}


def _spin_canary(iters: int = 2_000_000) -> float:
    """Same host-contention canary as bench.py — compare before
    comparing connector numbers across runs."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    canary = _spin_canary()
    spark = get_spark("bench-connectors")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()  # warm
    with tempfile.TemporaryDirectory() as tmp:
        out = {"canary_spin_sec": canary}
        out.update(bench_k7(spark, sf_dir, tmp))
        out.update(bench_s13(spark, tmp))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
