"""Pathological near-dup mega-family through the tiered dedup path
(VERDICT r9 #5): B documents that are all near-dups of each other land in
the same LSH band buckets, so the plain band join emits B(B-1)/2
candidates from one bucket — the quadratic the capped path
(queries/dedup.lsh_candidates_capped) exists to bound.

Protocol: plant families of growing size over a fixed 5k-doc background
(the sf0.1 documents table), run BOTH candidate paths where the uncapped
one is still feasible, capped-only beyond that.  Reports candidate/pair
counts and wall seconds; the capped path must grow LINEARLY in family
size and produce the same connected components (spine contract,
property-tested in tests/test_scale_paths.py).

Usage:
    python tools/measure_dedup_skew.py /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FAMILY_SIZES = [1_000, 2_000, 4_000]      # uncapped + capped
CAPPED_ONLY_SIZES = [20_000, 100_000]     # quadratic path infeasible
BUCKET_CAP = 64


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def _corpus(spark, sf_dir: str, n_family: int):
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the band plays on through the long summer evening " * 3
    )
    fam = spark.range(n_family).select(
        F.concat(F.lit("fam"), F.lpad(F.col("id").cast("string"), 8, "0")).alias(
            "doc_id"
        ),
        F.concat(F.lit(base), F.lit("tail "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    bg = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(5_000)
        .select(F.concat(F.lit("bg"), F.col("doc_id").cast("string")).alias("doc_id"), "text")
    )
    return fam.unionByName(bg)


def main(sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.queries.dedup import (
        lsh_candidates,
        lsh_candidates_capped,
        minhash_signatures,
        shingle_arrays_df,
        signature_estimate_pairs,
        tiered_pairs_from,
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

    rows = []
    for n_fam in FAMILY_SIZES + CAPPED_ONLY_SIZES:
        docs = _corpus(spark, sf_dir, n_fam)
        da = shingle_arrays_df(docs).localCheckpoint()
        sigs = minhash_signatures(
            da.select("id", F.explode("sh").alias("shingle"))
        ).localCheckpoint()

        row: dict = {"n_family": n_fam}
        t0 = time.perf_counter()
        cands_c = lsh_candidates_capped(sigs, BUCKET_CAP).localCheckpoint()
        row["capped_candidates"] = cands_c.count()
        pairs_c = tiered_pairs_from(da, signature_estimate_pairs(sigs, cands_c))
        row["capped_pairs"] = pairs_c.count()
        row["capped_sec"] = round(time.perf_counter() - t0, 1)

        if n_fam in FAMILY_SIZES:
            t0 = time.perf_counter()
            cands_u = lsh_candidates(sigs).localCheckpoint()
            row["uncapped_candidates"] = cands_u.count()
            pairs_u = tiered_pairs_from(
                da, signature_estimate_pairs(sigs, cands_u)
            )
            row["uncapped_pairs"] = pairs_u.count()
            row["uncapped_sec"] = round(time.perf_counter() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    canary_end = _spin()
    print(json.dumps({
        "sf_dir": sf_dir,
        "bucket_cap": BUCKET_CAP,
        "rows": rows,
        "canary_spin_sec": {"start": canary_start, "end": canary_end},
    }))


if __name__ == "__main__":
    main(sys.argv[1])
