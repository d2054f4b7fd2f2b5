"""A/B: blanket ``salted_join`` vs ``hot_key_salted_join`` on the J1
name-probe shape as the AUTHORITY INDEX grows (ADVICE r10 #4's claim,
measured): blanket salting replicates the whole index n_salts(=16)x, so
its cost scales with the index; the hot/cold split replicates only the
hot keys' slice, so the index side stays ~1x and cost tracks the probe.

Corpus: names-probe relation from the scaled SF customer table (40%
celebrity plant on ONE hot (name, rectype) key — the r10 adversarial
shape), index: n_idx synthetic entries including the hot key.  Both
variants produce identical results (asserted by count parity with the
plain shuffle join).

Usage:
    python tools/measure_hot_cold_join.py /tmp/sf1x30 500000
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


def main(sf_dir: str, n_idx: int) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.operators.skew import hot_key_salted_join, salted_join

    canary_start = _spin()
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    k = F.col("c_custkey")
    probes = cust.select(
        k.cast("string").alias("uri"),
        F.when(k % 5 < 2, F.lit("celebrity q smith"))
        .otherwise(F.concat(F.lit("unique "), k.cast("string")))
        .alias("name_clean"),
        F.lit("Person").alias("rectype"),
    ).localCheckpoint()

    # synthetic authority index: n_idx entries, one of them the hot key;
    # disable auto-broadcast so the shuffle-join path under test runs
    idx = spark.range(n_idx).select(
        F.when(F.col("id") == 0, F.lit("celebrity q smith"))
        .otherwise(F.concat(F.lit("authority "), F.col("id").cast("string")))
        .alias("name_clean"),
        F.lit("Person").alias("rectype"),
        F.concat(F.lit("T"), F.col("id").cast("string")).alias("target_identifier"),
    ).localCheckpoint()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    n_probe = probes.count()
    want = probes.join(idx, ["name_clean", "rectype"]).count()

    results: dict[str, dict] = {}
    for label, fn in (
        ("blanket_salted", lambda: salted_join(
            probes, idx, ["name_clean", "rectype"], spread_cols=["uri"])),
        ("hot_cold_split", lambda: hot_key_salted_join(
            probes, idx, ["name_clean", "rectype"], spread_cols=["uri"],
            hot_threshold=100)),
    ):
        reps = []
        n = None
        for _ in range(3):
            t0 = time.perf_counter()
            n = fn().count()
            reps.append(round(time.perf_counter() - t0, 2))
        assert n == want, (label, n, want)
        results[label] = {"reps_sec": reps, "best_sec": min(reps)}

    canary_end = _spin()
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_probe_rows": n_probe,
        "n_index_rows": n_idx,
        "n_join_rows": want,
        "results": results,
        "blanket_over_split": round(
            results["blanket_salted"]["best_sec"]
            / results["hot_cold_split"]["best_sec"], 2),
        "canary_spin_sec": {"start": canary_start, "end": canary_end},
    }))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 500_000)
