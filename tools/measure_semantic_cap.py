"""Same-session A/B of semantic_dedup's max_cluster_size lever (SCALE.md
round 8): the r7 k-sweep proved k alone underdelivers (k=16->k=64 bought
1.36x because the largest clusters dominate sum(C(n_i,2))); the cap
hash-splits over-cap clusters into balanced sub-clusters so the pair
stage is HARD-bounded at ~n*cap/2 cosines — linear in n at fixed cap.

Protocol (per SCALE.md "Bench measurement protocol"): idle spin canary
at both ends, a small warm-up pass that absorbs JVM/codegen start-up,
then the runs interleaved capped-first (the r7 ADVICE ordering lesson).
Reports wall time, keeper counts (the cap's recall trade is REPORTED,
not hidden: on an exact-copy synthetic corpus a hash split scatters
copies across sub-clusters, so keepers ~ distinct * min(family,
n_splits)), and the largest pair-join group on each side.

Usage:
    python tools/measure_semantic_cap.py /tmp/sf1x30 512 capped uncapped
    python tools/measure_semantic_cap.py /tmp/sf1x100 512 capped
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


def main(sf_dir: str, cap: int, modes: list[str]) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.operators.similarity import (
        capped_assignment,
        ivf_centroids,
        semantic_dedup,
        _assign,
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
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("nemb"),
    )
    n_vecs = emb.count()

    # warm-up: the full code path on a small slice (JVM/codegen/arrow)
    warm = emb.filter(F.col("neighbor_id") % 37 == 0)
    semantic_dedup(warm, k=16, max_cluster_size=cap).groupBy("kept").count().collect()

    def run(max_cluster_size):
        t0 = time.perf_counter()
        out = semantic_dedup(emb, k=16, max_cluster_size=max_cluster_size)
        kept = out.filter(F.col("kept")).count()
        return {"sec": round(time.perf_counter() - t0, 1), "kept": kept}

    results: dict[str, dict] = {}
    for mode in modes:
        results[mode] = run(cap if mode == "capped" else None)

    # pair-group bound evidence: largest (cluster) vs (cluster, sub) group
    cents = ivf_centroids(emb, k=16, iters=2)
    assigned = _assign(emb, cents).localCheckpoint()
    mx_cluster = (
        assigned.groupBy("cluster_id").count().agg(F.max("count")).collect()[0][0]
    )
    mx_sub = (
        capped_assignment(assigned, cap)
        .groupBy("cluster_id", "sub_id").count().agg(F.max("count")).collect()[0][0]
    )

    canary_end = _spin()
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_vecs": n_vecs,
        "cap": cap,
        "results": results,
        "max_cluster_size_observed": mx_cluster,
        "max_subcluster_size_observed": mx_sub,
        "canary_spin_sec": {"start": canary_start, "end": canary_end},
    }))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3:])
