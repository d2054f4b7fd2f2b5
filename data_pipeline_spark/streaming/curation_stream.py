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
from pyspark.sql.window import Window

from ..queries.text3 import doc_gram_hashes, pii_counts, scrub_pii
from ..queries.text4 import gopher_metrics
from ..queries.text5 import lm_score, lm_train


def index_benchmark(bench_docs: DataFrame, index_dir: str) -> None:
    """Persist the benchmark n-gram hash set (the decontamination
    reference).  Bounded: eval suites are small relative to any corpus."""
    doc_gram_hashes(bench_docs).select("gh").distinct().write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "bench_grams"))


def index_lm(spark: SparkSession, ref_docs: DataFrame, index_dir: str) -> None:
    """Persist the CCNet-style reference LM (d56's bigram model) plus
    the per-language head/middle tercile CUTOFFS — the trained model a
    streaming deployment scores against.  ``ref_docs``: the trusted
    slice, columns (doc_id, lang, text).

    The cutoffs make the d56 docstring's 100 TB path executable: the
    batch query's per-language tercile WINDOW becomes a scan-side
    comparison against two broadcast numbers per language.  They are
    computed by scoring the reference slice itself and taking the
    minimum score of its top and top-two ntile(3) groups — integer
    values, so the streaming buckets replay exactly in the oracle.
    Everything here is bounded by the reference corpus (wiki-sized)."""
    lm = lm_train(ref_docs.select("lang", "text"))
    lmdir = os.path.join(index_dir, "lm")
    for name in ("uni", "stats", "big"):
        lm[name].write.mode("overwrite").parquet(os.path.join(lmdir, name))
    scored = lm_score(ref_docs, lm)
    w = Window.partitionBy("lang").orderBy(F.desc("fluency_fp"), "doc_id")
    nt = scored.withColumn("nt", F.ntile(3).over(w))
    cuts = nt.groupBy("lang").agg(
        F.min(F.when(F.col("nt") == 1, F.col("fluency_fp")))
        .alias("head_min"),
        F.min(F.when(F.col("nt") <= 2, F.col("fluency_fp")))
        .alias("mid_min"),
    )
    cuts.write.mode("overwrite").parquet(os.path.join(lmdir, "cuts"))


def load_lm(spark: SparkSession, index_dir: str) -> dict[str, DataFrame]:
    """Load a persisted LM index (the stream loads it ONCE — the model
    is static for the stream's lifetime)."""
    lmdir = os.path.join(index_dir, "lm")
    return {
        name: spark.read.parquet(os.path.join(lmdir, name))
        for name in ("uni", "stats", "big", "cuts")
    }


def lm_bucket_batch(batch: DataFrame, lm: dict[str, DataFrame]) -> DataFrame:
    """One micro-batch of (doc_id, lang, text) -> LM fluency score +
    head/middle/tail bucket via the persisted cutoffs.  Pure function
    of (batch, lm), shared by the stream and the gate's oracle twin.
    Docs with < 2 tokens can't be scored (no bigrams) -> 'unscored',
    fluency −1; a language absent from the reference LM scores 0 and
    has no cutoffs -> 'tail' (maximally surprising), matching d56."""
    scored = lm_score(batch, {k: lm[k] for k in ("uni", "stats", "big")})
    j = (
        batch.select("doc_id", "lang")
        .join(scored.select("doc_id", "n_bigrams", "fluency_fp"),
              "doc_id", "left")
        .join(F.broadcast(lm["cuts"]), "lang", "left")
    )
    bucket = (
        F.when(F.col("fluency_fp").isNull(), F.lit("unscored"))
        .when(
            F.col("head_min").isNotNull()
            & (F.col("fluency_fp") >= F.col("head_min")),
            F.lit("head"),
        )
        .when(
            F.col("mid_min").isNotNull()
            & (F.col("fluency_fp") >= F.col("mid_min")),
            F.lit("middle"),
        )
        .otherwise(F.lit("tail"))
    )
    return j.select(
        "doc_id", "lang",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("fluency_fp", F.lit(-1)).cast("bigint")
        .alias("fluency_fp"),
        bucket.alias("lm_bucket"),
    )


def stream_lm_bucket(
    spark: SparkSession,
    feed_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> "object":
    """The streaming LM-quality stage: score each micro-batch of new
    documents against the PERSISTED reference LM and bucket by the
    persisted cutoffs — how CCNet actually deploys (the LM is trained
    once on the trusted corpus; the crawl is scored incrementally).
    Same sequencing contract as stream_curate: epoch-keyed overwrite,
    availableNow trigger for the test/replay mode.  No state store —
    the LM relations are static broadcasts, so the stage is
    embarrassingly parallel per micro-batch."""
    reader = spark.readStream.schema("doc_id bigint, lang string, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(feed_dir)
    lm = load_lm(spark, index_dir)

    def _process(batch: DataFrame, epoch: int) -> None:
        lm_bucket_batch(batch, lm).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={epoch}")
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


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
