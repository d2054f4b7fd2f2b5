"""Streaming embedding similarity: incoming vectors vs the indexed
corpus, per micro-batch — the continuous-ingestion twin of the batch
sign-LSH near-dup path (queries/dedup.py d09), the same way
dedup_stream.py twins the MinHash pipeline.

Each micro-batch of new vectors computes its sign-LSH signatures with
THE SAME deterministic md5-derived planes as the batch path
(queries.dedup.embedding_signatures — batch and streaming buckets cannot
drift), probes the PERSISTED signature index with Hamming-1 multiprobe,
exact-cosine-verifies the candidates, emits (new vector, corpus
neighbor, cos_sim >= threshold), and appends its own signatures +
vectors to the index so later batches see it.

At scale the index tables are partitioned by (t, sig) and (id): each
probe is a partition-pruned read, and the append is an ordinary
partitioned write.  All heavy work is the existing batch builders inside
``foreachBatch`` — the streaming layer only sequences micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.dedup import (
    COS_T,
    EMB_PLANES,
    embedding_signatures,  # ONE signature construction batch + streaming share
)
from ..queries.vector import cosine_expr


def index_corpus(emb: DataFrame, index_dir: str) -> None:
    """Build the persisted sign-LSH index (signatures + vectors) for a
    corpus.  ``emb`` is (id, emb array<double>)."""
    embedding_signatures(emb).write.mode("overwrite").parquet(
        os.path.join(index_dir, "sigs")
    )
    emb.write.mode("overwrite").parquet(os.path.join(index_dir, "vecs"))


def match_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    append: bool = True,
    threshold: float = COS_T,
) -> DataFrame:
    """One micro-batch: probe the index with Hamming-1 multiprobe,
    exact-cosine verify, then (optionally) append the batch to the
    index.  Returns matches (new_id, corpus_id, cos_sim)."""
    new_sigs = embedding_signatures(batch)
    idx_sigs = spark.read.parquet(os.path.join(index_dir, "sigs"))
    idx_vecs = spark.read.parquet(os.path.join(index_dir, "vecs"))

    flips = F.array(
        F.col("sig"),
        *[
            F.concat(
                F.substring(F.col("sig"), 1, j),
                F.when(F.substring(F.col("sig"), j + 1, 1) == "1", "0").otherwise("1"),
                F.substring(F.col("sig"), j + 2, EMB_PLANES - j - 1),
            )
            for j in range(EMB_PLANES)
        ],
    )
    probe = new_sigs.select("id", "t", F.explode(flips).alias("sig"))
    cands = (
        probe.alias("n")
        .join(
            idx_sigs.alias("i"),
            (F.col("n.t") == F.col("i.t")) & (F.col("n.sig") == F.col("i.sig")),
        )
        .select(F.col("n.id").alias("new_id"), F.col("i.id").alias("corpus_id"))
        .filter(F.col("new_id") != F.col("corpus_id"))
        .distinct()
    )
    a = batch.select(F.col("id").alias("new_id"), F.col("emb").alias("qemb"))
    b = idx_vecs.select(F.col("id").alias("corpus_id"), F.col("emb").alias("nemb"))
    matches = (
        cands.join(a, "new_id")
        .join(b, "corpus_id")
        .select(
            "new_id", "corpus_id",
            F.round(cosine_expr("qemb", "nemb"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    result = matches.localCheckpoint()  # materialize BEFORE the index grows
    if append:
        new_sigs.write.mode("append").parquet(os.path.join(index_dir, "sigs"))
        batch.write.mode("append").parquet(os.path.join(index_dir, "vecs"))
    return result


def stream_similarity(
    spark: SparkSession,
    feed_path: str,
    index_dir: str,
    matches_dir: str,
    checkpoint: str,
):
    """Structured-Streaming wrapper: each micro-batch of vectors
    (vec_id bigint, embedding array<double>) is matched against — and
    folded into — the index; matches append to ``matches_dir``."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        emb = batch.select(
            F.col("vec_id").alias("id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
        )
        out = match_batch(spark, emb, index_dir)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            matches_dir
        )

    feed = spark.readStream.schema("vec_id bigint, embedding array<double>").json(
        feed_path
    )
    return (
        feed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
