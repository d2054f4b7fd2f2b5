"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query DataFrame on sf0.001
queries()      -> {name: fn(spark, sf_dir) -> DataFrame} for SURVEY §2 ops
                  (len(queries()) declared queries — the registry is the
                  count of record — spanning scans, joins, aggregations,
                  windows/pivot/rollup/cube/grouping-sets, set ops, scalar
                  fns incl. the F1 date parser and geometry family, graph
                  closure/BFS, search DSL, CDC/sessionization, as-of and
                  range joins, dedup/MinHash/SimHash/winnowing/corpus-clean,
                  ANN, multimodal features + frame sampling, text analysis,
                  the record-merge fold and reidentification — see
                  README.md's coverage matrix)
oracle_sql()   -> {name: DuckDB SQL} correctness oracles (same column names)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q04_local_supplier_volume: 6-way broadcast-dim join + exact-decimal
    aggregation (TPC-H Q5 shape) — exercises scan pushdown, join planning
    and the order-independent aggregation contract in one plan.
    """
    return QUERIES["q04_local_supplier_volume"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys omitted for non-SQL-expressible ops."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
