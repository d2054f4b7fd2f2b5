"""LM-quality stage scale protocol (round 15): the d56/CCNet pipeline
measured at corpus scale.

The stage has two cost classes, measured separately:

- **train (init-shaped)**: ``index_lm`` — LM relations + tercile
  cutoffs from the trusted reference slice.  Bounded by the REFERENCE
  corpus, not the crawl: at production scale this is the wiki-sized
  one-off, re-run only when the reference set changes.
- **score (crawl-shaped)**: ``lm_bucket_batch`` against the persisted
  model.  Stateless per document — the claim under measurement is that
  a crawl's scoring cost is ∝ the crawl, not the corpus: a one-replica
  crawl (1/N of the corpus) must cost ~1/N of the full-corpus pass,
  because the only non-scan work is broadcast joins against the
  (static) LM relations.

Usage:
    python tools/measure_lm_stage.py /tmp/sf1x30
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPLICA_OFF = 10_000_000  # make_scaled_corpus key offset


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def main(sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")

    from data_pipeline_spark.queries.text5 import _LM_REF
    from data_pipeline_spark.streaming.curation_stream import (
        index_lm,
        lm_bucket_batch,
        load_lm,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .appName("measure_lm_stage")
        .getOrCreate()
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang", "source", "text"
    )
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="lm_stage_")
    report = {"sf_dir": sf_dir, "n_docs": n_docs, "spin_sec": _spin()}
    try:
        index_dir = os.path.join(work, "lm_index")
        ref = docs.filter(F.col("source").isin(*_LM_REF)).select(
            "doc_id", "lang", "text"
        )
        report["n_ref_docs"] = ref.count()

        t0 = time.time()
        index_lm(spark, ref, index_dir)
        report["train_sec"] = round(time.time() - t0, 1)

        lm = load_lm(spark, index_dir)
        report["lm_rows"] = {
            name: lm[name].count() for name in ("uni", "stats", "big", "cuts")
        }

        t0 = time.time()
        full = lm_bucket_batch(docs.select("doc_id", "lang", "text"), lm)
        hist = {
            r["lm_bucket"]: r["n"]
            for r in full.groupBy("lm_bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        report["score_full_sec"] = round(time.time() - t0, 1)
        report["bucket_hist"] = hist
        assert sum(hist.values()) == n_docs

        crawl = docs.filter(F.col("doc_id") < REPLICA_OFF).select(
            "doc_id", "lang", "text"
        )
        report["n_crawl_docs"] = crawl.count()
        t0 = time.time()
        crawl_hist = {
            r["lm_bucket"]: r["n"]
            for r in lm_bucket_batch(crawl, lm)
            .groupBy("lm_bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        report["score_crawl_sec"] = round(time.time() - t0, 1)
        report["crawl_bucket_hist"] = crawl_hist
        assert sum(crawl_hist.values()) == report["n_crawl_docs"]
        report["spin_sec_end"] = _spin()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x30")
