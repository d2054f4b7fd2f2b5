"""Scaled measurement of d51's prefix filter vs d06's plain inverted-index
join — same exact-Jaccard(>=0.6) result, different candidate volume.

Both arms share the shingle tier (built once, localCheckpointed) so the
measurement isolates the JOIN strategies: d06-style joins every posting
list against itself; d51-style joins only the rare-first prefix relation
and verifies candidates exactly.  The scaled corpus is the mirrored-crawl
shape (every doc has N-1 near-copies at Jaccard ~0.95), so the TRUE pair
volume is itself large — the interesting number is candidates/true-pairs
per arm, and the wall-clock of candidate generation + verification.

Same protocol as the other tools: spin canary at both ends, warm-up
first, interleaved repeats.

Usage:
    python tools/measure_prefix_join.py /tmp/sf1x10 [n_repeats]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

_T_NUM, _T_DEN = 3, 5  # Jaccard 0.6


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def main(sf_dir: str, n_repeats: int = 2) -> None:
    sys.path.insert(0, "/root/repo")

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
    n_docs = docs.count()

    toks = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\f\r]+")
    with_toks = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    shingles = (
        with_toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                )
            ).alias("shingle"),
        )
        .distinct()
        .localCheckpoint()  # shared tier: both arms read the same relation
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).localCheckpoint()

    def verify(cands):
        inter = (
            cands.join(shingles.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
            .join(
                shingles.select(F.col("doc_id").alias("doc_b"), "shingle"),
                ["doc_b", "shingle"],
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_both"))
        )
        sa, sb = sizes.alias("sa"), sizes.alias("sb")
        jac = F.col("n_both").cast("double") / (
            F.col("sa.n") + F.col("sb.n") - F.col("n_both")
        )
        return (
            inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= _T_NUM / _T_DEN)
        )

    def run_invidx():
        cands = (
            shingles.alias("a")
            .join(
                shingles.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        return verify(cands).count(), cands.count()

    def run_prefix():
        dfreq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfreq"))
        ordered = (
            shingles.join(dfreq, "shingle")
            .withColumn(
                "pos",
                F.row_number().over(W.partitionBy("doc_id").orderBy("dfreq", "shingle")),
            )
            .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
        )
        plen = F.col("n") - F.floor(
            (_T_NUM * F.col("n") + (_T_DEN - 1)) / _T_DEN
        ) + 1
        prefix = ordered.filter(F.col("pos") <= plen).select("doc_id", "shingle")
        cands = (
            prefix.alias("pa")
            .join(
                prefix.alias("pb"),
                (F.col("pa.shingle") == F.col("pb.shingle"))
                & (F.col("pa.doc_id") < F.col("pb.doc_id")),
            )
            .select(F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b"))
            .distinct()
        )
        return verify(cands).count(), cands.count()

    # warm-up (not recorded)
    run_prefix()

    runs: dict[str, list[float]] = {"invidx": [], "prefix": []}
    out: dict[str, tuple[int, int]] = {}
    for _ in range(n_repeats):
        for name, fn in (("invidx", run_invidx), ("prefix", run_prefix)):
            t0 = time.perf_counter()
            out[name] = fn()
            runs[name].append(round(time.perf_counter() - t0, 1))

    canary_end = _spin()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "runs_sec": runs,
                "true_pairs": {k: v[0] for k, v in out.items()},
                "cand_pairs": {k: v[1] for k, v in out.items()},
                "canary_spin_sec": {"start": canary_start, "end": canary_end},
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2)
