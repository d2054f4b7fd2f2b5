"""Scaled measurement of the ENTITY-chain incremental rebuild (r11 /
pipeline/incremental.py): with a FIXED change feed (1,000 changes), the
incremental cost must scale with the delta while the full-rebuild
comparator grows with the corpus — the d48 300x-pattern applied to the
reconcile -> closure -> mint -> reidentify -> merge chain (VERDICT r9 #4).

Three timed phases:
- **prev build** (the full-rebuild comparator): run_build over the whole
  pair corpus — what every crawl would pay without incrementality;
- **slice rebuild**: incremental_build's blast-radius rebuild, forced
  through its rebuilt ``merged`` tier — the per-crawl cost that must stay
  ~flat as the corpus grows (the blast radius is delta-sized: pair
  components, so ~2 URIs per changed record);
- **splice**: the merged_full anti-join union — the write-side pass that
  touches prev_merged once (O(corpus) scan, delta-sized broadcast
  anti-join; in production this is a partition-overwrite write, reported
  separately so the scan isn't billed to the rebuild).

Usage:
    python tools/measure_incremental_entity.py /tmp/sf1x30
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_CHANGES = 1_000  # fixed delta regardless of corpus scale


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def _pair_records(spark, sf_dir: str):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    key = F.col("c_custkey").cast("string")
    a = cust.select(
        F.lit("srcA").alias("source"),
        key.alias("identifier"),
        F.lit("Person").alias("rectype"),
        F.lit("2026-01-01T00:00:00").alias("record_time"),
        F.lit("create").alias("change"),
        F.to_json(
            F.struct(
                F.concat(F.lit("https://fixture.test/srcA/"), key).alias("id"),
                F.lit("Person").alias("type"),
                F.col("c_name").alias("_label"),
                F.array(
                    F.struct(
                        F.concat(F.lit("https://fixture.test/srcB/"), key).alias("id"),
                        F.lit("Person").alias("type"),
                    )
                ).alias("equivalent"),
            )
        ).alias("data"),
    )
    b = cust.select(
        F.lit("srcB").alias("source"),
        key.alias("identifier"),
        F.lit("Person").alias("rectype"),
        F.lit("2026-01-01T00:00:00").alias("record_time"),
        F.lit("create").alias("change"),
        F.to_json(
            F.struct(
                F.concat(F.lit("https://fixture.test/srcB/"), key).alias("id"),
                F.lit("Person").alias("type"),
                F.concat(F.col("c_name"), F.lit(" (b)")).alias("_label"),
            )
        ).alias("data"),
    )
    return a.unionByName(b)


def main(sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.pipeline.build import run_build
    from data_pipeline_spark.pipeline.incremental import incremental_build

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
    e = spark.createDataFrame
    indexes = {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }
    order = {"srcA": 0, "srcB": 1, "srcN": 2}

    records = _pair_records(spark, sf_dir).localCheckpoint()
    n_records = records.count()

    t0 = time.perf_counter()
    prev = run_build(spark, records, indexes, merge_order=order)
    prev_merged = prev["merged"].localCheckpoint()
    prev_idmap = prev["idmap"].localCheckpoint()
    n_prev = prev_merged.count()
    full_sec = round(time.perf_counter() - t0, 1)
    # second full-build rep (same session): run-to-run JVM variance at
    # these absolute times is large — report both, compare the mins
    t0 = time.perf_counter()
    run_build(spark, records, indexes, merge_order=order)["merged"].count()
    full_sec2 = round(time.perf_counter() - t0, 1)

    # fixed delta: N_CHANGES changes over the lowest custkeys (present at
    # every scale): half updates, quarter deletes, quarter creates
    k = F.col("c_custkey")
    ks = k.cast("string")
    a_uri = F.concat(F.lit("https://fixture.test/srcA/"), ks)
    n_uri = F.concat(F.lit("https://fixture.test/srcN/"), ks)
    m = k % 4
    upd_payload = F.to_json(
        F.struct(
            a_uri.alias("id"),
            F.lit("Person").alias("type"),
            F.concat(F.lit("Updated "), ks).alias("_label"),
            F.array(
                F.struct(
                    F.concat(F.lit("https://fixture.test/srcB/"), ks).alias("id"),
                    F.lit("Person").alias("type"),
                )
            ).alias("equivalent"),
        )
    )
    new_payload = F.to_json(
        F.struct(
            n_uri.alias("id"),
            F.lit("Person").alias("type"),
            F.concat(F.lit("New "), ks).alias("_label"),
            F.array(
                F.struct(a_uri.alias("id"), F.lit("Person").alias("type"))
            ).alias("equivalent"),
        )
    )
    changes = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey")
        .filter(k <= N_CHANGES)
        .select(
            k.alias("seq"),
            F.lit("2026-02-01T00:00:00").cast("timestamp").alias("end_time"),
            F.when(m == 2, F.lit("delete"))
            .when(m == 3, F.lit("create"))
            .otherwise(F.lit("update"))
            .alias("change"),
            F.when(m == 3, n_uri).otherwise(a_uri).alias("object_uri"),
            F.when(m == 3, new_payload)
            .when(m == 2, F.lit(None).cast("string"))
            .otherwise(upd_payload)
            .alias("payload"),
        )
        .localCheckpoint()
    )
    n_changes = changes.count()

    slice_secs, splice_secs = [], []
    n_slice = n_full_out = 0
    for _ in range(2):  # interleaved reps, same session
        t0 = time.perf_counter()
        inc = incremental_build(
            spark, records, changes, indexes,
            idmap_prev=prev_idmap, prev_merged=prev_merged, merge_order=order,
        )
        slice_merged = inc["merged"].localCheckpoint()
        n_slice = slice_merged.count()
        slice_secs.append(round(time.perf_counter() - t0, 1))

        # the real splice (incremental_build's own merged_full); its lazy
        # plan re-derives the slice, so splice ≈ splice + one slice
        # recompute — an upper bound on the write-side pass
        t0 = time.perf_counter()
        n_full_out = inc["merged_full"].count()
        splice_secs.append(round(time.perf_counter() - t0, 1))
    slice_sec, splice_sec = min(slice_secs), min(splice_secs)

    canary_end = _spin()
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_records": n_records,
        "n_prev_entities": n_prev,
        "n_changes": n_changes,
        "n_slice_entities": n_slice,
        "n_final_entities": n_full_out,
        "full_build_sec": min(full_sec, full_sec2),
        "full_build_reps": [full_sec, full_sec2],
        "slice_rebuild_sec": slice_sec,
        "slice_rebuild_reps": slice_secs,
        "splice_sec": splice_sec,
        "splice_reps": splice_secs,
        "full_over_slice": round(full_sec / max(slice_sec, 0.1), 1),
        "canary_spin_sec": {"start": canary_start, "end": canary_end},
    }))


if __name__ == "__main__":
    main(sys.argv[1])
