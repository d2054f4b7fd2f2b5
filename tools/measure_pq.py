"""Scaled measurement of the v06 PQ-ADC ANN path vs the brute-force
baseline (operators/similarity.py), phase-split the way production runs
it, with the bench spin canary at both ends and interleaved repeats
(warm-up pass first, then alternating A/B — the r7 ADVICE lesson: never
let one arm absorb all the JVM warm-up).

Phases, reported separately because they amortize differently:
- **index build** (once per corpus build): pq_index train + encode +
  vector_norms, materialized via localCheckpoint — the persisted-index
  stand-in (the same convention as the dedup tier memo);
- **serve** (every query batch): knn_pq_adc with the prebuilt index —
  LUT build + ADC rank over codes + top-`_RERANK` exact re-rank;
- **brute force** (the exact baseline): every query reads every full
  vector (knn_bruteforce), timed on the same interleave;
- recall@5 of the served PQ result vs the brute-force truth;
- the static memory fact that is the actual 100 TB story: bytes/vector
  of the relation the candidate ranking scans (m codes + norm) vs the
  raw vector relation — the ADC rank never touches an embedding array.

Two discarded measurement runs, recorded here so neither mistake is
retried:
- The first end-to-end form of this tool (self-training knn_pq_adc vs
  brute force, no phase split, no repartition) measured 30x PQ
  [546.8, 324.2] s vs brute [234.9, 354.5] s: re-training the index
  inside every repeat swamps the serving cost, and the un-repartitioned
  4-file corpus made every stage a 4-task straggler (brute force is
  9-27 s once spread over the cores).
- A later run overlapped the FIRST run's JVM still draining stages:
  SIGKILL on the Python driver orphans the child JVM, which keeps
  executing its current job.  The end spin canary (0.13 vs 0.07 idle)
  flagged it; the clean A/B re-run measured index build at 20.1 s where
  the contaminated run said 374.4 s.  Kill the JVM (or wait for it),
  never just the Python wrapper.

Usage:
    python tools/measure_pq.py /tmp/sf1x30 [n_repeats]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_N_QUERIES = 200
_K = 5
_RERANK = 50


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def main(sf_dir: str, n_repeats: int = 2) -> None:
    sys.path.insert(0, "/root/repo")
    from data_pipeline_spark.operators.similarity import (
        knn_bruteforce,
        knn_pq_adc,
        pq_index,
        vector_norms,
    )

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
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    n_vecs = emb.count()
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    # the scaled parquet lands in 4 files; spread the corpus over the 32
    # cores so per-stage stragglers don't measure the file layout
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("nemb")
    ).repartition(32, "neighbor_id")

    # warm-up (not recorded)
    knn_pq_adc(
        queries.limit(5), corpus.limit(2000), k=_K, rerank=_RERANK
    ).count()

    # phase 1: index build, once — train + encode + norms, materialized
    t0 = time.perf_counter()
    cb, codes = pq_index(corpus)
    index = (
        cb.localCheckpoint(),
        codes.localCheckpoint(),
        vector_norms(corpus, "neighbor_id", "nemb").localCheckpoint(),
    )
    sec_index = round(time.perf_counter() - t0, 1)

    def run_bf():
        return knn_bruteforce(queries, corpus, k=_K).collect()

    def run_pq():
        return knn_pq_adc(queries, corpus, k=_K, rerank=_RERANK, index=index).collect()

    # phase 2: interleaved serve repeats
    runs: dict[str, list[float]] = {"bruteforce": [], "pq_serve": []}
    results: dict[str, list] = {}
    for _ in range(n_repeats):
        for name, fn in (("bruteforce", run_bf), ("pq_serve", run_pq)):
            t0 = time.perf_counter()
            rows = fn()
            runs[name].append(round(time.perf_counter() - t0, 1))
            results[name] = rows

    truth = {(r.query_id, r.neighbor_id) for r in results["bruteforce"]}
    got = {(r.query_id, r.neighbor_id) for r in results["pq_serve"]}
    recall = round(len(truth & got) / len(truth), 3)

    # the static memory fact: what the ADC rank scans per vector
    # (m uint8 codes + one float64 norm) vs the raw vector
    dim = len(emb.select("emb").first().emb)
    raw_bytes = dim * 8
    code_bytes = 8 * 1 + 8

    canary_end = _spin()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vecs": n_vecs,
                "n_queries": _N_QUERIES,
                "k": _K,
                "rerank": _RERANK,
                "sec_index_build": sec_index,
                "runs_sec": runs,
                "recall_at_5": recall,
                "scan_bytes_per_vector": {
                    "raw": raw_bytes,
                    "pq_codes_plus_norm": code_bytes,
                },
                "canary_spin_sec": {"start": canary_start, "end": canary_end},
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2)
