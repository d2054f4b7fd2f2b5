"""Tests proving the 100TB scale-path claims that can't be oracle-checked:

- sketches (approx_count_distinct / approx_percentile) track their exact
  twins within bounded error — the cheap substitutes for A14-family
  aggregates at scale;
- bucketed tables co-locate equi-joins: the bucketed join plan contains
  NO shuffle exchange, the plain-parquet join does (the SCALE.md bucketing
  strategy, verified on the physical plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_sketches_track_exact(spark):
    ev = load_table(spark, SF, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.expr("percentile(value, 0.9)").alias("exact_p90"),
        F.expr("approx_percentile(value, 0.9, 1000)").alias("approx_p90"),
    ).first()
    assert abs(row.approx_users - row.exact_users) / row.exact_users < 0.05
    assert abs(row.approx_p90 - row.exact_p90) / abs(row.exact_p90) < 0.05


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    # warehouse.dir is a static conf — park the tables in a tmp database
    spark.sql(f"CREATE DATABASE IF NOT EXISTS tmpdb LOCATION '{tmp_path / 'wh'}'")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    for df, name, key in ((li, "tmpdb.b_lineitem", "l_orderkey"), (orders, "tmpdb.b_orders", "o_orderkey")):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    # force SMJ so the comparison is exchange-vs-no-exchange, not join type
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bl, bo = spark.table("tmpdb.b_lineitem"), spark.table("tmpdb.b_orders")
        bucketed = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        bucketed_plan = bucketed._jdf.queryExecution().executedPlan().toString()
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        n_bucketed, n_plain = bucketed.count(), plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP DATABASE IF EXISTS tmpdb CASCADE")
    assert "Exchange hashpartitioning" not in bucketed_plan  # co-located
    assert "Exchange hashpartitioning" in plain_plan  # the shuffle it saves
    # same results either way
    assert n_bucketed == n_plain


def test_hll_sketches_merge_across_partitions(spark):
    """The 100TB re-aggregation property: per-day HLL sketches UNION into
    a global distinct estimate without rescanning the raw data — the
    pattern that lets daily ingest jobs pre-aggregate and monthly rollups
    merge sketches instead of recomputing distinct over the corpus.
    Plain countDistinct has no such merge."""
    ev = load_table(spark, SF, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("day_exact"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    ).first()
    exact = ev.agg(F.countDistinct("user_id")).first()[0]
    assert abs(merged.est - exact) / exact < 0.05
    # sanity: the daily tier really is pre-aggregated (many days, each
    # with its own sketch)
    assert daily.count() > 5
