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


def _family_docs(spark, n_family: int, n_background: int = 50):
    """A planted near-dup mega-family (same base text + tiny unique tail,
    so every member is near-dup with every other and lands in the same
    LSH buckets) over a background of unrelated docs."""
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the band plays on through the long summer evening " * 3
    )
    fam = spark.range(n_family).select(
        F.concat(F.lit("fam"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("doc_id"),
        F.concat(F.lit(base), F.lit("tail "), F.col("id").cast("string")).alias("text"),
    )
    bg = spark.range(n_background).select(
        F.concat(F.lit("bg"), F.col("id").cast("string")).alias("doc_id"),
        F.concat(
            F.lit("unrelated document number "),
            F.col("id").cast("string"),
            F.lit(" with its own words entirely "),
            F.md5(F.col("id").cast("string")),
            F.lit(" "),
            F.md5((F.col("id") + 1000).cast("string")),
        ).alias("text"),
    )
    return fam.unionByName(bg)


def test_capped_lsh_bounds_bucket_pairs(spark):
    """The capped candidate path (VERDICT r9 #5): per-(band,bh,sub) group
    size is hard-bounded by the cap, candidate volume is LINEAR in the
    family size (vs quadratic uncapped), and the pair set is a subset of
    uncapped-candidates + spine."""
    from data_pipeline_spark.queries.dedup import (
        lsh_candidates,
        lsh_candidates_capped,
        minhash_signatures,
        shingle_arrays_df,
    )

    docs = _family_docs(spark, 200)
    da = shingle_arrays_df(docs)
    sigs = minhash_signatures(
        da.select("id", F.explode("sh").alias("shingle"))
    ).localCheckpoint()

    cap = 16
    capped = lsh_candidates_capped(sigs, bucket_cap=cap).localCheckpoint()
    uncapped = lsh_candidates(sigs).localCheckpoint()

    # subset: every capped pair is an uncapped candidate pair (the spine
    # links sub-minima of the SAME bucket, so they co-occur uncapped too)
    only_capped = capped.exceptAll(uncapped.select("id_a", "id_b")).count()
    assert only_capped == 0
    # linear bound: a 200-member family at cap=16 must emit far fewer
    # pairs than the quadratic 200*199/2; bound = n_buckets * (splits *
    # cap^2/2 + splits spine edges) -- just assert the big gap
    n_capped, n_uncapped = capped.count(), uncapped.count()
    assert n_uncapped >= 200 * 199 / 2  # family shares all bands
    assert n_capped < n_uncapped / 3


def test_capped_tier_preserves_family_components(spark):
    """CC over capped+verified pairs equals CC over uncapped+verified
    pairs on a genuine near-dup family: the spine keeps the split bucket
    connected because its edges pass verification like any family pair."""
    from data_pipeline_spark.pipeline.closure import connected_components
    from data_pipeline_spark.queries.dedup import (
        shingle_arrays_df,
        minhash_signatures,
        lsh_candidates,
        signature_estimate_pairs,
        tiered_pairs_from,
        tiered_pairs_capped,
    )

    docs = _family_docs(spark, 120)
    capped = tiered_pairs_capped(docs, bucket_cap=16)

    da = shingle_arrays_df(docs)
    sigs = minhash_signatures(da.select("id", F.explode("sh").alias("shingle")))
    uncapped = tiered_pairs_from(
        da, signature_estimate_pairs(sigs, lsh_candidates(sigs))
    )

    def comps(pairs):
        cc = connected_components(pairs, src="id_a", dst="id_b")
        return {
            (r["node"], r["component"]) for r in cc.collect()
        }

    assert comps(capped) == comps(uncapped)
    # and the family actually formed one component
    fam_comps = {
        c for (n, c) in comps(capped) if n.startswith("fam")
    }
    assert len(fam_comps) == 1
