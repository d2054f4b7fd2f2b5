"""Streaming near-duplicate detection: incoming documents vs the indexed
corpus, per micro-batch.

The batch MinHash/LSH pipeline (queries/dedup.py) indexes a static corpus;
continuous ingestion needs the same check incrementally: each micro-batch
of new documents computes signatures, probes the PERSISTED band index for
candidates, verifies with exact Jaccard, emits (new_doc, matched_doc,
jaccard), and appends its own bands/shingles to the index so later batches
see it. All heavy work is the existing batch builders inside
``foreachBatch`` — the streaming layer only sequences micro-batches, so
batch and streaming dedup CANNOT diverge.

At scale the index tables are bucketed by (band, bh) and (id): each probe
is a co-located join, and the append is an ordinary partitioned write.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.dedup import (
    JACCARD_T,
    bands_df as _bands,  # ONE band construction batch + streaming share
    minhash_signatures,
    shingles_df,
)


def index_corpus(docs: DataFrame, index_dir: str) -> None:
    """Build the persisted LSH index (bands + shingles) for a corpus."""
    sh = shingles_df(docs)
    _bands(minhash_signatures(sh)).write.mode("overwrite").parquet(
        os.path.join(index_dir, "bands")
    )
    sh.write.mode("overwrite").parquet(os.path.join(index_dir, "shingles"))


def match_batch(
    spark: SparkSession, batch: DataFrame, index_dir: str, append: bool = True
) -> DataFrame:
    """One micro-batch: probe the index, verify candidates exactly, then
    (optionally) append the batch to the index. Returns matches
    (new_id, corpus_id, jaccard)."""
    new_sh = shingles_df(batch)
    new_bands = _bands(minhash_signatures(new_sh))
    idx_bands = spark.read.parquet(os.path.join(index_dir, "bands"))
    idx_sh = spark.read.parquet(os.path.join(index_dir, "shingles"))

    cands = (
        new_bands.alias("n")
        .join(
            idx_bands.alias("i"),
            (F.col("n.band") == F.col("i.band")) & (F.col("n.bh") == F.col("i.bh")),
        )
        .select(F.col("n.id").alias("new_id"), F.col("i.id").alias("corpus_id"))
        .filter(F.col("new_id") != F.col("corpus_id"))
        .distinct()
    )
    n_sizes = new_sh.groupBy("id").agg(F.count(F.lit(1)).alias("nn"))
    i_sizes = idx_sh.groupBy("id").agg(F.count(F.lit(1)).alias("ni"))
    inter = (
        cands.join(new_sh.alias("a"), F.col("new_id") == F.col("a.id"))
        .join(
            idx_sh.alias("b"),
            (F.col("corpus_id") == F.col("b.id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    jac = F.col("n_both").cast("double") / (F.col("nn") + F.col("ni") - F.col("n_both"))
    matches = (
        inter.join(n_sizes, F.col("new_id") == F.col("id")).drop("id")
        .join(i_sizes, F.col("corpus_id") == F.col("id")).drop("id")
        .select("new_id", "corpus_id", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
    )
    result = matches.localCheckpoint()  # materialize BEFORE the index grows
    if append:
        new_bands.write.mode("append").parquet(os.path.join(index_dir, "bands"))
        new_sh.write.mode("append").parquet(os.path.join(index_dir, "shingles"))
    return result


def stream_dedup(
    spark: SparkSession,
    feed_path: str,
    index_dir: str,
    matches_dir: str,
    checkpoint: str,
):
    """Structured-Streaming wrapper: each micro-batch of documents
    (doc_id bigint, text string) is matched and folded into the index;
    matches append to ``matches_dir``."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        out = match_batch(spark, batch, index_dir)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            matches_dir
        )

    feed = spark.readStream.schema("doc_id bigint, text string").json(feed_path)
    return (
        feed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
