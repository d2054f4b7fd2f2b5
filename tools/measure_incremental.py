"""Scaled measurement of the d48 incremental-refresh contract: with a
FIXED delta (replica 0 of the scaled corpus, 5k docs), the per-refresh
cost must stay ~flat as the previous corpus grows (replicas 1..N-1,
150k-500k docs), because the refresh touches only the delta text plus two
fingerprint-sized indexes — while the full-rebuild comparator (the same
dedup + quality semantics over prev+delta in one batch) grows with the
corpus.

Phases, reported separately because they amortize differently:
- **index build** (once per build; in production it is itself incremental
  — admitted docs append): refresh_features over the prev corpus +
  distinct fp / distinct simhash, materialized via localCheckpoint;
- **refresh** (every crawl): refresh_features over the delta +
  refresh_verdicts against the prebuilt indexes — the number that must
  not grow with corpus age;
- **full rebuild** (the no-incrementality comparator): exact-fingerprint
  first-of-class + SimHash64 keeper election + quality gate over
  prev+delta in one batch — what every crawl would pay without the
  indexes.

Same protocol as the other measurement tools: spin canary at both ends,
warm-up pass first, interleaved repeats.

Usage:
    python tools/measure_incremental.py /tmp/sf1x30 [n_repeats]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

_REPLICA_OFF = 10_000_000  # make_scaled_corpus key offset


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def main(sf_dir: str, n_repeats: int = 2) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.queries.dedup import (
        refresh_features,
        refresh_verdicts,
        simhash64_df,
    )
    from data_pipeline_spark.queries.text3 import _WS_SPLIT

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
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).repartition(32, "doc_id")
    delta = docs.filter(F.col("doc_id") < _REPLICA_OFF)
    prev = docs.filter(F.col("doc_id") >= _REPLICA_OFF)
    n_delta, n_prev = delta.count(), prev.count()

    # warm-up (not recorded)
    refresh_verdicts(
        refresh_features(delta.limit(500)),
        spark.createDataFrame([("x",)], "fp string"),
        spark.createDataFrame([(0,)], "simhash bigint"),
    ).count()

    # phase 1: prev-index build, once (in production: incremental append)
    t0 = time.perf_counter()
    prev_feat = refresh_features(prev)
    prev_fp = prev_feat.select("fp").distinct().localCheckpoint()
    prev_sim = prev_feat.select("simhash").distinct().localCheckpoint()
    sec_index = round(time.perf_counter() - t0, 1)

    def run_refresh():
        return refresh_verdicts(refresh_features(delta), prev_fp, prev_sim).count()

    def run_rebuild():
        # the no-incrementality comparator: same semantics over prev+delta
        both = prev.unionByName(delta)
        feat = refresh_features(both)
        w_fp = Window.partitionBy("fp").orderBy("doc_id")
        first = feat.withColumn("rn", F.row_number().over(w_fp)).filter(
            F.col("rn") == 1
        )
        quality = first.filter(
            (F.col("n_tokens") >= 20)
            & ((F.col("n_stop").cast("double") / F.col("n_tokens")) < 0.5)
        )
        keep = quality.withColumn(
            "keeper", F.min("doc_id").over(Window.partitionBy("simhash"))
        ).filter(F.col("doc_id") == F.col("keeper"))
        return keep.count()

    runs: dict[str, list[float]] = {"refresh": [], "rebuild": []}
    counts: dict[str, int] = {}
    for _ in range(n_repeats):
        for name, fn in (("refresh", run_refresh), ("rebuild", run_rebuild)):
            t0 = time.perf_counter()
            counts[name] = fn()
            runs[name].append(round(time.perf_counter() - t0, 1))

    canary_end = _spin()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_prev_docs": n_prev,
                "n_delta_docs": n_delta,
                "sec_index_build": sec_index,
                "runs_sec": runs,
                "out_rows": counts,
                "canary_spin_sec": {"start": canary_start, "end": canary_end},
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2)
