"""Streaming entity builds: the incremental rebuild (r11 /
pipeline/incremental.py) run continuously — each micro-batch is a change
feed crawl folded into versioned state tiers.

All build logic is the batch operator (incremental_build) inside
``foreachBatch`` — the streaming layer only sequences crawls and manages
state versions, so batch and streaming incremental builds CANNOT diverge
(the r11 gate and the incremental == full-rebuild test vouch for the
shared definitions; the streaming test closes the loop by checking the
final streamed state equals a full rebuild over the final records tier).

State layout (``state_dir/{records,idmap,merged}/v=<key>``): one version
directory per committed crawl, keys checkpoint-scoped exactly like the
refresh stream's index folds (index_util.run_batch_key).  A retried
micro-batch reads the version of the last COMMITTED batch before it —
never its own partial write — so the retry reproduces the first attempt
(the at-least-once contract shared with dedup/refresh streams).  At
production scale the records/merged writes are partition-overwrites of
the touched components only (the blast radius is delta-sized, SCALE.md
round 10); the twin writes full tiers because its fixtures are small.
Superseded version directories fold away via compact_entity_state (the
entity twin of index_util.compact_index) — without it the layout grows
one full tier set per crawl forever.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.build import run_build
from ..pipeline.incremental import incremental_build
from .index_util import committed_batch_ids, run_batch_key

CHANGES_SCHEMA = (
    "seq bigint, end_time timestamp, change string, object_uri string, "
    "payload string"
)


def _tier_dir(state_dir: str, tier: str, key: str) -> str:
    return os.path.join(state_dir, tier, f"v={key}")


def init_state(
    spark: SparkSession,
    records: DataFrame,
    indexes: dict[str, DataFrame],
    state_dir: str,
    merge_order: dict[str, int] | None = None,
) -> None:
    """Full build over the initial records tier -> ``v=base`` state."""
    out = run_build(spark, records, indexes, merge_order=merge_order)
    records.write.mode("overwrite").parquet(_tier_dir(state_dir, "records", "base"))
    out["idmap"].write.mode("overwrite").parquet(_tier_dir(state_dir, "idmap", "base"))
    out["merged"].write.mode("overwrite").parquet(_tier_dir(state_dir, "merged", "base"))


def _source_key(checkpoint: str, batch_id: int) -> str:
    """The state version a (possibly retried) micro-batch must read:
    the last COMMITTED batch before it, else base.  Commits only advance
    after a successful batch, so a retry resolves the same source as the
    first attempt."""
    prior = [i for i in committed_batch_ids(checkpoint) if i < batch_id]
    return run_batch_key(checkpoint, max(prior)) if prior else "base"


def entity_build_batch(
    spark: SparkSession,
    changes: DataFrame,
    state_dir: str,
    indexes: dict[str, DataFrame],
    batch_key: str,
    source_key: str,
    merge_order: dict[str, int] | None = None,
    last_harvest: str | None = None,
) -> None:
    """One crawl: incremental_build against the ``source_key`` state,
    new full tiers written under ``batch_key`` with overwrite (idempotent
    per-version write — the retry contract)."""
    records = spark.read.parquet(_tier_dir(state_dir, "records", source_key))
    idmap_prev = spark.read.parquet(_tier_dir(state_dir, "idmap", source_key))
    prev_merged = spark.read.parquet(_tier_dir(state_dir, "merged", source_key))
    inc = incremental_build(
        spark, records, changes, indexes,
        idmap_prev=idmap_prev, prev_merged=prev_merged,
        merge_order=merge_order, last_harvest=last_harvest,
    )
    inc["records"].write.mode("overwrite").parquet(
        _tier_dir(state_dir, "records", batch_key)
    )
    inc["idmap_full"].write.mode("overwrite").parquet(
        _tier_dir(state_dir, "idmap", batch_key)
    )
    inc["merged_full"].write.mode("overwrite").parquet(
        _tier_dir(state_dir, "merged", batch_key)
    )


def latest_state(spark: SparkSession, state_dir: str, checkpoint: str) -> dict[str, DataFrame]:
    """The tiers of the last committed crawl (base if none committed)."""
    done = committed_batch_ids(checkpoint)
    key = run_batch_key(checkpoint, max(done)) if done else "base"
    return {
        tier: spark.read.parquet(_tier_dir(state_dir, tier, key))
        for tier in ("records", "idmap", "merged")
    }


def compact_entity_state(state_dir: str, checkpoint: str) -> dict[str, int]:
    """Delete version directories SUPERSEDED by the last committed crawl.

    The versioned layout is correct but unbounded: one full tier set per
    crawl forever — the entity twin of the small-files growth
    compact_index bounds for the refresh/dedup streams.  Version
    liveness follows from the retry contract (_source_key): a (possibly
    retried) batch N reads the last COMMITTED version before N, and
    Structured Streaming never re-executes a committed batch — so once
    batch M is committed, every OLDER committed version of this
    checkpoint is unreachable.  Deleted: this checkpoint's committed
    versions except the latest.  Kept, each load-bearing:

    - ``base``: the fresh-checkpoint restart path replays the feed from
      scratch against it (and its keys aren't checkpoint-scoped);
    - the latest committed version: the next batch's source and the
      retry source for any in-flight batch;
    - any UNCOMMITTED version dir (a dead attempt's partial write): its
      batch may retry, and the retry's per-version overwrite owns it;
    - other checkpoints' keys: another run may be live against the same
      state_dir (the compact_index scoping rule, applied verbatim).

    Returns {tier: number of version directories removed}."""
    import re
    import shutil

    done = committed_batch_ids(checkpoint)
    if not done:
        return {}
    removable = {run_batch_key(checkpoint, i) for i in done} - {
        run_batch_key(checkpoint, max(done))
    }
    removed: dict[str, int] = {}
    for tier in ("records", "idmap", "merged"):
        tdir = os.path.join(state_dir, tier)
        n = 0
        if os.path.isdir(tdir):
            for d in sorted(os.listdir(tdir)):
                m = re.fullmatch(r"v=(.+)", d)
                if m and m.group(1) in removable:
                    shutil.rmtree(os.path.join(tdir, d))
                    n += 1
        removed[tier] = n
    return removed


def stream_entity_builds(
    spark: SparkSession,
    feed_path: str,
    state_dir: str,
    checkpoint: str,
    indexes: dict[str, DataFrame],
    merge_order: dict[str, int] | None = None,
    last_harvest: str | None = None,
):
    """Structured-Streaming wrapper: each micro-batch of change feed rows
    (CHANGES_SCHEMA json) drives one incremental build.

    ``last_harvest`` is the R1 watermark, threaded through to
    incremental_build exactly as in the batch path — feed rows at or
    before it are ignored, so a crawl file containing already-harvested
    stale rows cannot re-apply them (the batch/streaming twins share the
    watermark contract, not just the build body)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        entity_build_batch(
            spark, batch, state_dir, indexes,
            batch_key=run_batch_key(checkpoint, batch_id),
            source_key=_source_key(checkpoint, batch_id),
            merge_order=merge_order,
            last_harvest=last_harvest,
        )

    feed = (
        spark.readStream.schema(CHANGES_SCHEMA)
        # one feed file per micro-batch: each crawl file is one build
        .option("maxFilesPerTrigger", 1)
        .json(feed_path)
    )
    return (
        feed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


__all__ = [
    "CHANGES_SCHEMA",
    "init_state",
    "entity_build_batch",
    "latest_state",
    "compact_entity_state",
    "stream_entity_builds",
]
