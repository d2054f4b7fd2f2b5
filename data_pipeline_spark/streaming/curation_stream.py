"""Streaming corpus curation: incoming documents pass the SAME quality,
PII and contamination checks as the batch operators, per micro-batch.

The batch curation stages (queries/text3.py, text4.py) run over a static
corpus; continuous ingestion needs the identical checks incrementally.
Each micro-batch of new documents:

1. computes the Gopher quality metrics + verdict (`gopher_metrics`,
   the d21 expressions — per-row, stream-safe),
2. counts and redacts PII (`pii_counts`/`scrub_pii`, the d18 chains),
3. probes the PERSISTED benchmark n-gram index for contamination
   (`doc_gram_hashes` vs the index built by `index_benchmark` — the
   d19 join, with the bounded index side broadcast),

and writes one curated row per document (metrics + flags + scrubbed
text).  All heavy work is the existing batch builders inside
``foreachBatch`` — the streaming layer only sequences micro-batches, so
batch and streaming curation CANNOT diverge (same contract as
dedup_stream.py).

At scale the benchmark index is bounded (eval suites, not the corpus),
so every probe is a broadcast join; quality and PII are scan-side
expressions; no state store is needed at all — the stage is
embarrassingly parallel per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.text3 import doc_gram_hashes, pii_counts, scrub_pii
from ..queries.text4 import gopher_metrics


def index_benchmark(bench_docs: DataFrame, index_dir: str) -> None:
    """Persist the benchmark n-gram hash set (the decontamination
    reference).  Bounded: eval suites are small relative to any corpus."""
    doc_gram_hashes(bench_docs).select("gh").distinct().write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "bench_grams"))


def curate_batch(
    spark: SparkSession, batch: DataFrame, bench: DataFrame
) -> DataFrame:
    """One micro-batch: quality metrics + verdict, PII counts + scrubbed
    text, contamination gram-hit count vs the benchmark gram set.  Pure
    function of (batch, bench) — the test and the stream share it; the
    stream loads ``bench`` ONCE (it is static for the stream's lifetime)
    rather than re-reading parquet per micro-batch."""
    contam = (
        doc_gram_hashes(batch)
        .join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated"))
    )
    scored = gopher_metrics(batch).withColumns(
        dict(
            zip(
                ("n_emails", "n_phones", "n_ips"),
                pii_counts(F.col("text")),
            )
        )
    )
    return (
        scored.select(
            "doc_id", "n_words", "mean_word_len", "alpha_frac",
            "symbol_ratio", "stopword_hits", "verdict",
            "n_emails", "n_phones", "n_ips",
            scrub_pii(F.col("text")).alias("scrubbed_text"),
        )
        .join(contam, "doc_id", "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn(
            "kept",
            (F.col("verdict") == "keep") & (F.col("n_contaminated") == 0),
        )
    )


def stream_curate(
    spark: SparkSession,
    feed_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> "object":
    """Curate a JSONL document feed continuously; returns the started
    query (availableNow trigger: drains what is present, then stops —
    the test/replay mode; a production deployment drops the trigger).
    ``max_files_per_trigger`` bounds a micro-batch to N feed files
    (one-file-per-crawl deployments pass 1, the entity stream's shape)."""
    reader = spark.readStream.schema("doc_id bigint, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(feed_dir)
    bench = spark.read.parquet(os.path.join(index_dir, "bench_grams"))

    def _process(batch: DataFrame, epoch: int) -> None:
        # epoch-keyed overwrite: foreachBatch is at-least-once, so a
        # retried micro-batch REPLACES its own partition instead of
        # appending duplicate rows
        curate_batch(spark, batch, bench).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch}")
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
