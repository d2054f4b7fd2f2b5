"""Scaled-corpus measurement of the dedup scale tiers (SCALE.md rounds
6-7): times the named dedup queries at a scaled SF directory with the
bench spin canary at both ends, clearing the session tier cache between
queries so each one pays its own tier builds (fair comparison — in
production the tiers are persisted tables, but a timing that silently
reuses another query's checkpoint measures nothing).

Also reports the bucket-concentration statistics the 100x posture is
judged on: largest MinHash (band, band_hash) bucket and largest
SimHash64 (segment, value) bucket, as shares of their relations.

Usage:
    python tools/measure_dedup_tiers.py /tmp/sf1x30 d33 d34 d32 d13 d36
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def main(sf_dir: str, names: list[str]) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.queries import QUERIES
    from data_pipeline_spark.queries.dedup import (
        bands_df,
        clear_tier_cache,
        minhash_signatures,
        shingles_df,
        simhash64_df,
    )

    canary_start = _spin()
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()  # warms footers too

    timings: dict[str, dict] = {}
    prefix = {n.split("_", 1)[0]: n for n in QUERIES}
    for short in names:
        name = prefix.get(short, short)
        clear_tier_cache()
        t0 = time.perf_counter()
        n = QUERIES[name].spark_fn(spark, sf_dir).count()
        timings[name] = {"sec": round(time.perf_counter() - t0, 1), "rows": n}

    # bucket concentrations (built fresh, not from the tier cache)
    clear_tier_cache()
    bands = bands_df(minhash_signatures(shingles_df(docs)))
    mh = (
        bands.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.sum("n").alias("tot")).collect()[0]
    )
    sims64 = simhash64_df(docs)
    seg_bits = 16
    segs = sims64.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("seg"),
                    F.shiftrightunsigned(F.col("simhash"), seg_bits * s)
                    .bitwiseAND(F.lit((1 << seg_bits) - 1)).alias("segval"),
                )
                for s in range(4)
            ])
        ).alias("sv")
    ).select("sv.seg", "sv.segval")
    sh = (
        segs.groupBy("seg", "segval").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx")).collect()[0]
    )

    canary_end = _spin()
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "timings": timings,
        "minhash_max_band_bucket": mh.mx,
        "minhash_max_band_bucket_share": round(mh.mx / mh.tot, 5),
        "simhash64_max_segment_bucket": sh.mx,
        "simhash64_max_segment_bucket_share": round(sh.mx / n_docs, 4),
        "canary_spin_sec": {"start": canary_start, "end": canary_end},
    }))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
