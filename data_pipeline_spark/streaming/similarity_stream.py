"""Streaming embedding similarity: incoming vectors vs the indexed
corpus, per micro-batch — the continuous-ingestion twin of the batch
sign-LSH near-dup path (queries/dedup.py d09), the same way
dedup_stream.py twins the MinHash pipeline.

Each micro-batch of new vectors computes its sign-LSH signatures with
THE SAME deterministic md5-derived planes as the batch path
(queries.dedup.embedding_signatures — batch and streaming buckets cannot
drift), probes the PERSISTED signature index with Hamming-1 multiprobe,
exact-cosine-verifies the candidates, emits (new vector, corpus
neighbor, cos_sim >= threshold), and folds its own signatures + vectors
into the index so later batches see it.  The probe construction is the
pure functions ``probe_candidates``/``probe_matches``, which the
declared batch gate (queries/dedup.py v05_stream_similarity_gate)
hash-oracles against DuckDB — the streaming path's expressions are
driver-verified through their batch twin.

At-least-once idempotency: Structured Streaming may RETRY a micro-batch
after a partial failure, so nothing here may blindly append.  Every
index fold and every matches write goes to a batch-keyed partition
directory (checkpoint-scoped keys, see streaming/index_util.py) with
overwrite — a retried batch overwrites its own directory instead of
duplicating rows, and a fresh-checkpoint restart folds alongside the old
run's partitions instead of over them.  Readers use plain
``spark.read.parquet(dir)``: the key directories are ordinary partition
columns.

At scale (round 14) the index base is hash-bucketed on the vector id —
one parquet file per bucket inside ``batch=base`` (index_util.write_base)
— so compact_index rewrites only the buckets a crawl's vectors hash to
instead of the whole tier.  All heavy work is the existing batch
builders inside ``foreachBatch`` — the streaming layer only sequences
micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.dedup import (
    COS_T,
    embedding_signatures,  # ONE signature construction batch + streaming share
    hamming1_flips,  # ONE multiprobe construction batch + streaming share
)
from ..queries.vector import cosine_expr
from .index_util import (
    repair_index_dir,
    shared_index_lease,
    require_batch_layout,
    run_batch_key,
    tier_dir as _tier_dir,
    write_base,
)


def index_corpus(emb: DataFrame, index_dir: str,
                 buckets: int | None = None) -> None:
    """Build the persisted sign-LSH index (signatures + vectors) for a
    corpus.  ``emb`` is (id, emb array<double>).

    Both tiers scale with corpus row count, so their base is written
    HASH-BUCKETED on the vector id (index_util.write_base): partial
    compaction then rewrites only the buckets a crawl's vectors hash
    to — one vector's signature rows share its bucket."""
    write_base(embedding_signatures(emb), index_dir, "sigs", ["id"],
               buckets=buckets)
    write_base(emb, index_dir, "vecs", ["id"], buckets=buckets)


def probe_candidates(new_sigs: DataFrame, idx_sigs: DataFrame) -> DataFrame:
    """(new_id, corpus_id): directed Hamming-1 multiprobe of the index —
    the probe side carries 1+EMB_PLANES signatures per (vector, table),
    the index side one, and the only join is the (t, sig) equi-join.
    The same construction (hamming1_flips) as the batch
    candidates_from_signatures, but directed (new vs corpus), which is
    what a continuous feed needs."""
    probe = new_sigs.select("id", "t", F.explode(hamming1_flips()).alias("sig"))
    return (
        probe.alias("n")
        .join(
            idx_sigs.alias("i"),
            (F.col("n.t") == F.col("i.t")) & (F.col("n.sig") == F.col("i.sig")),
        )
        .select(F.col("n.id").alias("new_id"), F.col("i.id").alias("corpus_id"))
        .filter(F.col("new_id") != F.col("corpus_id"))
        .distinct()
    )


def probe_matches(
    new_vecs: DataFrame,
    new_sigs: DataFrame,
    idx_sigs: DataFrame,
    idx_vecs: DataFrame,
    threshold: float = COS_T,
) -> DataFrame:
    """(new_id, corpus_id, cos_sim): the full probe — multiprobe
    candidates, then exact-cosine verify against the indexed vectors.
    Pure function of its four relations; both the streaming micro-batch
    and the declared v05 gate run exactly this."""
    cands = probe_candidates(new_sigs, idx_sigs)
    a = new_vecs.select(F.col("id").alias("new_id"), F.col("emb").alias("qemb"))
    b = idx_vecs.select(F.col("id").alias("corpus_id"), F.col("emb").alias("nemb"))
    return (
        cands.join(a, "new_id")
        .join(b, "corpus_id")
        .select(
            "new_id", "corpus_id",
            F.round(cosine_expr("qemb", "nemb"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def match_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    append: bool = True,
    threshold: float = COS_T,
    batch_key: str | None = None,
) -> DataFrame:
    """One micro-batch: probe the index (probe_matches), then
    (optionally) fold the batch into the index under its own
    ``batch=<batch_key>`` partition with overwrite — a retried batch
    replaces its directory, so the fold is idempotent under
    at-least-once delivery.  Returns matches (new_id, corpus_id,
    cos_sim)."""
    new_sigs = embedding_signatures(batch)
    idx_sigs = spark.read.parquet(os.path.join(index_dir, "sigs"))
    idx_vecs = spark.read.parquet(os.path.join(index_dir, "vecs"))
    if batch_key is not None:
        # a RETRIED batch must not probe its own partial fold from the
        # failed attempt — excluding the batch's own partition (pruned
        # at the scan) makes the retry reproduce the first run exactly
        idx_sigs = require_batch_layout(idx_sigs, index_dir, "sigs")
        idx_vecs = require_batch_layout(idx_vecs, index_dir, "vecs")
        idx_sigs = idx_sigs.filter(F.col("batch") != batch_key)
        idx_vecs = idx_vecs.filter(F.col("batch") != batch_key)
    idx_sigs = idx_sigs.select("id", "t", "sig")
    idx_vecs = idx_vecs.select("id", "emb")
    # materialize BEFORE the index grows (the plan reads the index dirs)
    result = probe_matches(batch, new_sigs, idx_sigs, idx_vecs, threshold).localCheckpoint()
    if append:
        if batch_key is None:
            raise ValueError(
                "append=True requires batch_key: index folds must be "
                "batch-keyed to stay idempotent under streaming retries"
            )
        new_sigs.write.mode("overwrite").parquet(_tier_dir(index_dir, "sigs", batch_key))
        batch.write.mode("overwrite").parquet(_tier_dir(index_dir, "vecs", batch_key))
    return result


def stream_similarity(
    spark: SparkSession,
    feed_path: str,
    index_dir: str,
    matches_dir: str,
    checkpoint: str,
    compact_every: int | None = None,
):
    """Structured-Streaming wrapper: each micro-batch of vectors
    (vec_id bigint, embedding array<double>) is matched against — and
    folded into — the index; matches land in a ``batch_id=<key>``
    partition of ``matches_dir`` with overwrite.  Keys are
    checkpoint-scoped (index_util.run_batch_key): a retry overwrites its
    own directory, a fresh-checkpoint restart cannot collide with a
    previous run's batch-0 fold.  Read the whole directory as ordinary
    partitioned parquet.

    ``compact_every``: fold committed batch partitions into base every N
    micro-batches (see stream_dedup — same hook, same lock ordering:
    compaction runs before the sink's shared lock)."""
    # finish or roll back a compaction the previous process died in
    repair_index_dir(index_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            from .index_util import compact_index

            compact_index(spark, index_dir, checkpoint)
        emb = batch.select(
            F.col("vec_id").alias("id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
        )
        key = run_batch_key(checkpoint, batch_id)
        # repair-then-shared per micro-batch (ADVICE r14): finish a DEAD
        # out-of-band compactor's persisted plan under the exclusive lock
        # BEFORE probing, then serve the batch under the shared lock —
        # otherwise this batch could see a fold both swapped into base
        # and in its surviving batch dirs (index_util.shared_index_lease)
        with shared_index_lease(index_dir):
            out = match_batch(spark, emb, index_dir, batch_key=key)
            # batch_id is a STRING partition key ('<32hex>-b<N>');
            # consumers that filtered/ordered numerically get the numeric
            # micro-batch id as a real data column (README §streaming)
            out.withColumn(
                "micro_batch_id", F.lit(batch_id).cast("bigint")
            ).write.mode("overwrite").parquet(
                os.path.join(matches_dir, f"batch_id={key}")
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
