#!/usr/bin/env python
"""Isolate and time individual declared queries with the noop sink
(guide §1.4: eagerly computes every column, discards the result) —
the optimization round's measurement bench, separate from bench.py
(whose .count() timing stays the cross-round artifact methodology).

Usage:
    python tools/time_queries.py q01_pricing_summary b01_entity_build ...
    SPARK_GRAFT_TIME_REPS=5 python tools/time_queries.py d07_minhash_lsh_pairs

Prints per-query rep lists + medians.  Clears the dedup tier memo
between reps, same as bench.py, so semantics match the artifact.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark.queries import QUERIES  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    reps_n = int(os.environ.get("SPARK_GRAFT_TIME_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    # same steady-state warm-up as bench.py
    wu = spark.range(500_000).selectExpr("id", "id % 97 AS k", "id % 13 AS g")
    (
        wu.groupBy("k").agg({"id": "sum"})
        .join(wu.groupBy("g").count().withColumnRenamed("g", "k"), "k", "left")
        .selectExpr("k", "count", "row_number() OVER (ORDER BY k) AS rn")
        .count()
    )
    if any(n.startswith("dsl_") for n in names):
        from data_pipeline_spark.plans.model import build_planner, serving_planner

        planner = build_planner(spark, sf_dir)
        planner.entities.count()
        planner.edges.count()
        serving_planner(spark, sf_dir)
    # action: "noop" (guide §1.4 — computes every column) or "count"
    # (bench.py's artifact methodology, for apples-to-apples deltas)
    action = os.environ.get("SPARK_GRAFT_TIME_ACTION", "noop")

    def spin() -> float:  # host-contention canary (SCALE.md protocol)
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i
        _ = acc
        return round(time.perf_counter() - t0, 3)

    for name in names:
        samples = []
        canaries = []
        for rep in range(reps_n):
            from data_pipeline_spark.queries.dedup import clear_tier_cache

            clear_tier_cache()
            group = f"time:{name}:rep{rep}"
            spark.sparkContext.setJobGroup(group, group)
            q = QUERIES[name]
            canaries.append(spin())
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            if action == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            n_jobs = len(
                spark.sparkContext.statusTracker().getJobIdsForGroup(group)
            )
            spark.sparkContext.setJobGroup(None, None)
            if rep == 0:
                print(f"  {name}: jobs_per_run={n_jobs}", flush=True)
        print(
            f"{name}: median={statistics.median(samples):.3f} reps={samples} "
            f"spin={canaries}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
