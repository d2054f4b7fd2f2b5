"""Scaled-corpus measurement of the sketch profiling family
(queries/sketches.py — d42 HLL, d43 CMS, d44 histogram quantiles), with
the bench spin canary at both ends.

Also reports the size of each sketch relation AFTER the map-side partial
aggregation (HLL registers, CMS cells, histogram bins): the scale claim
is that exchange volume is O(sketch), fixed as the corpus grows, so
these counts must be flat from 30x to 100x while the scan time grows
linearly.

Usage:
    python tools/measure_sketches.py /tmp/sf1x30
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


def main(sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.queries import QUERIES
    from data_pipeline_spark.queries.sketches import (
        _CMS_DEPTHS,
        _CMS_WIDTH,
        _tokens,
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
    n_docs = docs.count()  # warms footers

    timings: dict[str, dict] = {}
    for name in (
        "d42_hll_cardinality",
        "d43_cms_heavy_hitters",
        "d44_token_histogram_quantiles",
        "d45_theta_sketch_overlap",
    ):
        t0 = time.perf_counter()
        n = QUERIES[name].spark_fn(spark, sf_dir).count()
        timings[name] = {"sec": round(time.perf_counter() - t0, 1), "rows": n}

    # sketch relation sizes (post partial-agg exchange volume)
    toks = _tokens(docs.select("source", "text"))
    n_sources = docs.select("source").distinct().count()
    hll_regs = (
        toks.select(
            "source",
            F.conv(F.substring(F.md5(F.col("tok")), 1, 2), 16, 10)
            .cast("long")
            .alias("reg"),
        )
        .groupBy("source", "reg")
        .count()
        .count()
    )
    from data_pipeline_spark.queries.sketches import slots_of_md5

    cms_cells = (
        toks.select(F.explode(slots_of_md5(F.col("tok"))).alias("ds"))
        .select("ds.depth", "ds.slot")
        .groupBy("depth", "slot")
        .count()
        .count()
    )
    hist_bins = (
        docs.select(
            "source",
            F.length(
                F.bin(F.size(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+")).cast("long"))
            ).alias("bin"),
        )
        .groupBy("source", "bin")
        .count()
        .count()
    )

    # theta-sketch relation size: the exchange volume of d45's sample
    # dedup — bounded by vocab/16 per source, NOT by corpus size
    from data_pipeline_spark.queries.sketches import theta_sample

    theta_rows = theta_sample(docs.select("source", "text")).count()

    canary_end = _spin()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_sources": n_sources,
                "timings": timings,
                "hll_register_rows": hll_regs,
                "cms_cell_rows": cms_cells,
                "histogram_bin_rows": hist_bins,
                "theta_sample_rows": theta_rows,
                "canary_spin_sec": {"start": canary_start, "end": canary_end},
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1])
