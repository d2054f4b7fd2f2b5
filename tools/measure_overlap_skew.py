"""Measure overlap_join's bin-skew under a heavy-tailed interval-length
distribution, and the effect of the max_bins long-interval cap
(SCALE.md round 7; r6 verdict item 6).

Intervals derive from the events table: every event opens a 300 s
window; events with event_id % 997 == 0 (~0.1%) open a 30-DAY window —
the pseudo-Pareto outlier tail that a crawl/session log exhibits.  At
5-minute bins the outliers explode to 8640 bin-rows each, so ~0.1% of
the intervals contribute ~90% of the exploded relation — exactly the
pathology the cap routes to the broadcast tier instead.

Prints one JSON line: explode-volume and max-bin statistics for the
uncapped shape, plus timed uncapped vs capped runs (result counts must
match — the cap is a plan change, not a semantics change).

Usage: python tools/measure_overlap_skew.py /tmp/sf1x30
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

BIN_SECONDS = 300
MAX_BINS = 24  # intervals longer than 2 h leave the bin path
OUTLIER_MOD = 997
OUTLIER_LEN = 30 * 86400
BASE_LEN = 300


def main(sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.operators.range_join import overlap_join

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    length = F.when(F.col("event_id") % OUTLIER_MOD == 0, OUTLIER_LEN).otherwise(
        BASE_LEN
    )
    iv = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("s"),
        F.timestamp_seconds(F.unix_timestamp(F.col("ts").cast("timestamp")) + length).alias("e"),
    )

    # --- uncapped explode-volume statistics (the skew being measured) ---
    lo = F.floor(F.col("s").cast("double") / BIN_SECONDS)
    hi = F.ceil(F.col("e").cast("double") / BIN_SECONDS) - 1
    binned = iv.select(
        "event_id", F.explode(F.sequence(lo, F.greatest(lo, hi))).alias("bin")
    )
    per_bin = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    stats = per_bin.agg(
        F.sum("n").alias("exploded_rows"),
        F.max("n").alias("max_bin_rows"),
        F.count(F.lit(1)).alias("n_bins"),
    ).collect()[0]
    n_outliers = iv.filter(F.col("event_id") % OUTLIER_MOD == 0).count()
    n_intervals = iv.count()
    outlier_rows = n_outliers * (OUTLIER_LEN // BIN_SECONDS + 1)

    a = iv.select(
        F.col("event_id").alias("a_id"), "user_id",
        F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = iv.select(
        F.col("event_id").alias("b_id"), "user_id",
        F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )

    def run(max_bins):
        t0 = time.monotonic()
        n = (
            overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e",
                bin_seconds=BIN_SECONDS, keys=("user_id",), max_bins=max_bins,
            )
            .filter(F.col("a_id") < F.col("b_id"))
            .count()
        )
        return n, round(time.monotonic() - t0, 1)

    # interleave capped/uncapped and keep the SECOND timing of each so
    # neither order absorbs the JVM/shuffle/file-cache warm-up alone
    # (the r7 single-pass form biased sec_capped upward — ADVICE r7)
    run(MAX_BINS)
    run(None)
    n_capped, t_capped = run(MAX_BINS)
    n_uncapped, t_uncapped = run(None)

    print(json.dumps({
        "sf_dir": sf_dir,
        "n_intervals": n_intervals,
        "n_outliers": n_outliers,
        "exploded_rows": stats.exploded_rows,
        "outlier_share_of_explode": round(outlier_rows / stats.exploded_rows, 4),
        "max_bin_rows": stats.max_bin_rows,
        "max_bin_share": round(stats.max_bin_rows / stats.exploded_rows, 6),
        "n_bins": stats.n_bins,
        "pairs": n_uncapped,
        "pairs_capped": n_capped,
        "results_equal": n_uncapped == n_capped,
        "sec_uncapped": t_uncapped,
        "sec_capped": t_capped,
        "bin_seconds": BIN_SECONDS,
        "max_bins": MAX_BINS,
    }))


if __name__ == "__main__":
    main(sys.argv[1])
