"""Scaled measurement of the search-DSL serving path (SCALE.md round 11):
materialize the entity/edge model from a scaled SF directory, then serve
the grammar's query shapes through load_planner — leaf equality, word
query, traversal chains, inverse traversal, the `*` wildcard, and BOOST
scoring.  The claim under test: every DSL plan is a chain of semi-joins
over two persistent relations, so serving cost tracks the relations
scanned (and the leaf's selectivity), not query complexity — and nothing
in the planner collects, explodes, or cross-joins at corpus scale.

Usage:
    python tools/measure_dsl_scale.py /tmp/sf1x30 /tmp/dsl_model_30x
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


QUERIES = {
    "leaf_equality": 'AND(type=nation, name="NATION_7")',
    "word_query": "AND(type=part, name~small)",
    "traversal_1hop": 'AND(type=customer, number>5000, in_nation(name="NATION_7"))',
    "traversal_2hop": 'AND(type=order, placed_by(in_nation(name="NATION_7")))',
    "inverse": 'AND(type=part, ^contains(AND(type=order, date>="1995-06-01", date<="1995-06-30")))',
    "wildcard_any": '*(name="NATION_7")',
    "near": "AND(type=part, NEAR(name~small, name~brushed, 3))",
}
BOOST = ("AND(type=part, name~small)", "AND(type=part, name~gizmo)")


def main(sf_dir: str, model_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.plans.model import load_planner, materialize_model

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
    t0 = time.perf_counter()
    materialize_model(spark, sf_dir, model_dir)
    t_model = round(time.perf_counter() - t0, 1)
    planner = load_planner(spark, model_dir)
    n_entities = planner.entities.count()
    n_edges = planner.edges.count()

    results: dict[str, dict] = {}
    for name, q in QUERIES.items():
        reps = []
        n = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = planner.search(q).count()
            reps.append(round(time.perf_counter() - t0, 2))
        results[name] = {"rows": n, "reps_sec": reps, "best_sec": min(reps)}
    t0 = time.perf_counter()
    n = planner.search_scored(BOOST[0], BOOST[1]).count()
    results["boost_scored"] = {
        "rows": n, "best_sec": round(time.perf_counter() - t0, 2),
    }

    canary_end = _spin()
    print(json.dumps({
        "sf_dir": sf_dir,
        "model_materialize_sec": t_model,
        "n_entities": n_entities,
        "n_edges": n_edges,
        "queries": results,
        "canary_spin_sec": {"start": canary_start, "end": canary_end},
    }))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "/tmp/dsl_model")
