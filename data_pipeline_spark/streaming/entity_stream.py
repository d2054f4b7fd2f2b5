"""Streaming entity builds: the incremental rebuild (r11 /
pipeline/incremental.py) run continuously — each micro-batch is a change
feed crawl folded into DELTA-layout state tiers.

All build logic is the batch operator (incremental_build) inside
``foreachBatch`` — the streaming layer only sequences crawls and manages
state versions, so batch and streaming incremental builds CANNOT diverge
(the r11 gate and the incremental == full-rebuild test vouch for the
shared definitions; the streaming test closes the loop by checking the
final streamed state equals a full rebuild over the final records tier).

State layout (merge-on-read, the round-12 scale fix):

    state_dir/{records,idmap,merged}/v=base     full base tiers
    state_dir/{records,idmap,merged}/d=<key>    PER-CRAWL DELTA rows
    state_dir/touched/d=<key>                   (tier, k) touched keys

Until round 11 each crawl wrote FULL tiers under its own version key —
correct, but the write cost per delta-sized crawl was O(corpus): at
100 TB every crawl would rewrite the corpus three times.  The reference
never pays this because its update manager applies per-record cache and
idmap row updates in place (/root/reference
pipeline/process/update_manager.py:12-69 — process_change mutates the
record cache and idmap entries for just the changed identifiers); the
lakehouse restatement of that transactional row update is the
merge-on-read delta log (what Hudi MOR / Delta DVs do — hand-rolled
here since neither ships in the env):

- a crawl writes ONLY its blast-radius slice per tier plus a manifest of
  the keys it touched (records keyed by canonical uri, idmap/merged by
  yuid).  Touched keys with no delta row are deletions.
- reading state at crawl N folds base + the committed deltas before N:
  base rows whose key no delta touched survive (one corpus scan with a
  BROADCAST anti-join — the touched sets are delta-sized, so no
  corpus-sized exchange), and each touched key takes its rows from the
  LAST delta that touched it (winner resolution is delta-sized).
  The fold is idempotent over an already-folded base, which is what
  makes compaction crash-safe (below).
- compact_entity_state folds committed deltas into a NEW base and
  removes them, bounding read-side fan-in; cadence is the operator's
  knob (the CLI exposes --compact).

Retry contract (at-least-once, shared with the dedup/refresh streams):
delta inclusion is gated on the checkpoint COMMIT log AND the delta's
own touched manifest, so a retried micro-batch folds exactly the state
the first attempt saw — never its own partial write (a dead attempt's
delta dirs are uncommitted, hence invisible, and the retry's
per-delta-dir overwrite owns them).  Keys are checkpoint-scoped
(index_util.run_batch_key) so a fresh-checkpoint restart replays against
``v=base`` without colliding with the old run's deltas.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.build import run_build
from ..pipeline.incremental import incremental_build
from .index_util import committed_batch_ids, run_batch_key

CHANGES_SCHEMA = (
    "seq bigint, end_time timestamp, change string, object_uri string, "
    "payload string"
)

_TIERS = ("records", "idmap", "merged")


def _base_dir(state_dir: str, tier: str) -> str:
    return os.path.join(state_dir, tier, "v=base")


def _delta_dir(state_dir: str, tier: str, key: str) -> str:
    return os.path.join(state_dir, tier, f"d={key}")


def _touched_dir(state_dir: str, key: str) -> str:
    return os.path.join(state_dir, "touched", f"d={key}")


def _with_key(tier: str, df: DataFrame) -> DataFrame:
    """Tag tier rows with their fold key ``_k``: records by canonical uri
    (one JSON path, column-pruned — the incremental module's _with_uri
    argument), idmap/merged by yuid."""
    if tier == "records":
        return df.withColumn("_k", F.get_json_object(F.col("data"), "$.id"))
    return df.withColumn("_k", F.col("yuid"))


def init_state(
    spark: SparkSession,
    records: DataFrame,
    indexes: dict[str, DataFrame],
    state_dir: str,
    merge_order: dict[str, int] | None = None,
) -> None:
    """Full build over the initial records tier -> ``v=base`` state."""
    # materialize: two consumed output tiers (idmap + merged) — execute
    # the chain once, not per consumed lineage
    out = run_build(spark, records, indexes, merge_order=merge_order,
                    materialize=True)
    records.write.mode("overwrite").parquet(_base_dir(state_dir, "records"))
    out["idmap"].write.mode("overwrite").parquet(_base_dir(state_dir, "idmap"))
    out["merged"].write.mode("overwrite").parquet(_base_dir(state_dir, "merged"))


def _committed_delta_ids(
    state_dir: str, checkpoint: str, upto: int | None = None
) -> list[int]:
    """Batch ids whose deltas participate in a fold: committed in the
    checkpoint's commit log, optionally strictly before ``upto`` (the
    retry contract: batch N sees exactly the state the first attempt
    saw), and not yet folded into base by compaction (gated on the
    touched manifest still existing — compaction deletes it FIRST, so a
    half-deleted delta is excluded rather than misread as all-deletions).
    """
    done = committed_batch_ids(checkpoint)
    if upto is not None:
        done = {i for i in done if i < upto}
    return sorted(
        i
        for i in done
        if os.path.isdir(_touched_dir(state_dir, run_batch_key(checkpoint, i)))
    )


def _fold_tier(
    spark: SparkSession,
    state_dir: str,
    checkpoint: str,
    tier: str,
    ids: list[int],
) -> DataFrame:
    """Merge-on-read: base + deltas ``ids`` (ascending batch order).

    Winner rule: a key's rows come from the LAST delta that touched it
    (possibly zero rows = deletion), else from base.  Equivalent to
    applying the deltas one by one, and idempotent over a base that
    already includes them (re-application re-selects the same winner
    rows), which is what makes compaction safe to re-run after a
    mid-delete crash."""
    bdir = _base_dir(state_dir, tier)
    if not os.path.isdir(bdir):
        raise FileNotFoundError(
            f"entity state {state_dir!r} has no {tier}/v=base — run "
            "init_state (CLI: stream-entity --init-records) before "
            "streaming or reading against this state dir"
        )
    base = spark.read.parquet(bdir)
    if not ids:
        return base
    touched = None
    rows = None
    for i in ids:
        key = run_batch_key(checkpoint, i)
        t = (
            spark.read.parquet(_touched_dir(state_dir, key))
            .filter(F.col("tier") == tier)
            .select(F.col("k").alias("_wk"), F.lit(i).alias("_wb"))
        )
        touched = t if touched is None else touched.unionByName(t)
        r = _with_key(tier, spark.read.parquet(_delta_dir(state_dir, tier, key)))
        r = r.withColumn("_b", F.lit(i))
        rows = r if rows is None else rows.unionByName(r)
    last = touched.groupBy("_wk").agg(F.max("_wb").alias("_wb"))
    winners = rows.join(
        F.broadcast(last),
        (rows["_k"] == last["_wk"]) & (rows["_b"] == last["_wb"]),
    ).select(*base.columns)
    # touched sets are delta-sized (the incremental module's blast
    # contract) — broadcast, so the only O(corpus) work is this one
    # scan-side anti-join, never a corpus exchange
    survivors = (
        _with_key(tier, base)
        .join(F.broadcast(last.select("_wk")), F.col("_k") == F.col("_wk"), "left_anti")
        .select(*base.columns)
    )
    return survivors.unionByName(winners)


def read_state_at(
    spark: SparkSession, state_dir: str, checkpoint: str, batch_id: int
) -> dict[str, DataFrame]:
    """The state a (possibly retried) micro-batch must build against:
    base folded with the deltas of committed batches BEFORE it.  Commits
    only advance after a successful batch, so a retry folds the same
    sources as the first attempt."""
    ids = _committed_delta_ids(state_dir, checkpoint, upto=batch_id)
    return {
        tier: _fold_tier(spark, state_dir, checkpoint, tier, ids)
        for tier in _TIERS
    }


def entity_build_batch(
    spark: SparkSession,
    changes: DataFrame,
    state_dir: str,
    indexes: dict[str, DataFrame],
    checkpoint: str,
    batch_id: int,
    merge_order: dict[str, int] | None = None,
    last_harvest: str | None = None,
    delta_partitions: int = 8,
) -> None:
    """One crawl: incremental_build against the folded pre-state, DELTA
    tiers + touched manifest written under the crawl's key with overwrite
    (idempotent per-delta-dir write — the retry contract).  Every write
    is blast-radius-sized; the full tiers are never rewritten (SCALE.md
    round 12: per-crawl write bytes flat vs corpus scale).

    ``delta_partitions`` caps each delta's FILE count: deltas are
    blast-sized by the incremental module's contract, but their lineage
    ends at shuffle-partition width (64 near-empty files per tier per
    crawl — a small-files problem at crawl cadence; measured 5x delta
    bytes at fixture scale from parquet footers alone).  Coalesce, not
    repartition: no extra exchange, just narrower writes."""
    st = read_state_at(spark, state_dir, checkpoint, batch_id)
    inc = incremental_build(
        spark, st["records"], changes, indexes,
        idmap_prev=st["idmap"], prev_merged=st["merged"],
        merge_order=merge_order, last_harvest=last_harvest,
    )
    key = run_batch_key(checkpoint, batch_id)
    inc["records_delta"].coalesce(delta_partitions).write.mode(
        "overwrite"
    ).parquet(_delta_dir(state_dir, "records", key))
    inc["idmap"].select("qua_uri", "yuid").coalesce(
        delta_partitions
    ).write.mode("overwrite").parquet(_delta_dir(state_dir, "idmap", key))
    inc["merged"].coalesce(delta_partitions).write.mode("overwrite").parquet(
        _delta_dir(state_dir, "merged", key)
    )
    yuids = inc["touched_yuids"].select(F.col("yuid").alias("k"))
    touched = (
        inc["touched_uris"].select(
            F.lit("records").alias("tier"), F.col("uri").alias("k")
        )
        .unionByName(yuids.select(F.lit("idmap").alias("tier"), "k"))
        .unionByName(yuids.select(F.lit("merged").alias("tier"), "k"))
    )
    touched.coalesce(delta_partitions).write.mode("overwrite").parquet(
        _touched_dir(state_dir, key)
    )


def latest_state(
    spark: SparkSession, state_dir: str, checkpoint: str
) -> dict[str, DataFrame]:
    """The folded tiers of the last committed crawl (base if none)."""
    ids = _committed_delta_ids(state_dir, checkpoint)
    return {
        tier: _fold_tier(spark, state_dir, checkpoint, tier, ids)
        for tier in _TIERS
    }


def compact_entity_state(
    spark: SparkSession, state_dir: str, checkpoint: str
) -> dict[str, int]:
    """Fold this checkpoint's committed deltas into a NEW ``v=base`` and
    delete them — the LSM compaction bounding read-side delta fan-in
    (without it every fold unions one more delta per crawl forever).

    Kept, each load-bearing:
    - any UNCOMMITTED delta dir (a dead attempt's partial write): its
      batch may retry, and the retry's per-delta overwrite owns it;
    - nothing else needs keeping — once batch M commits, the pre-M fold
      states are unreachable (Structured Streaming never re-executes a
      committed batch, and batch M+1 folds base+deltas≤M, which the new
      base now IS).

    Refuses when ANOTHER checkpoint's deltas are present: folding
    rewrites the shared base, which would corrupt the other run's folds.
    (The full-tier r11 layout tolerated shared state dirs; the delta
    layout trades that for delta-sized writes — entity state dirs are
    per-pipeline, unlike the shared dedup/similarity indexes.)

    Crash ordering: the new base is written for ALL tiers first (the
    fold is idempotent over an already-folded base, so a crash after any
    base write is safe to re-run), then each delta's touched manifest is
    deleted BEFORE its row dirs (fold membership is gated on the
    manifest, so a half-deleted delta drops out instead of being misread
    as all-deletions); orphaned row dirs from a previous crash are swept.

    Returns {tier: number of delta directories removed}."""
    own = re.escape(
        run_batch_key(checkpoint, 0).rsplit("-b", 1)[0]
    )  # this checkpoint's 32-hex scope
    foreign = set()
    for sub in (*_TIERS, "touched"):
        tdir = os.path.join(state_dir, sub)
        if not os.path.isdir(tdir):
            continue
        for d in os.listdir(tdir):
            m = re.fullmatch(r"d=(.+)", d)
            if m and not re.fullmatch(rf"{own}-b\d+", m.group(1)):
                foreign.add(m.group(1))
    if foreign:
        raise ValueError(
            "compact_entity_state: delta directories from other "
            f"checkpoints present ({sorted(foreign)[:3]}...); compaction "
            "rewrites the shared base — entity state dirs must be owned "
            "by one stream lineage"
        )

    ids = _committed_delta_ids(state_dir, checkpoint)
    removed = {tier: 0 for tier in _TIERS}
    if ids:
        folded = {
            tier: _fold_tier(spark, state_dir, checkpoint, tier, ids)
            # materialize BEFORE the overwrite: base is source AND target
            .localCheckpoint()
            for tier in _TIERS
        }
        for tier in _TIERS:
            folded[tier].write.mode("overwrite").parquet(_base_dir(state_dir, tier))
        for i in ids:
            key = run_batch_key(checkpoint, i)
            shutil.rmtree(_touched_dir(state_dir, key))  # gate first
            for tier in _TIERS:
                d = _delta_dir(state_dir, tier, key)
                if os.path.isdir(d):
                    shutil.rmtree(d)
                    removed[tier] += 1
    # orphan sweep: COMMITTED deltas whose manifest is gone (a previous
    # compaction died between deletes) are already folded into base —
    # their row dirs are garbage.  Uncommitted dirs stay (retry-owned).
    committed_keys = {
        run_batch_key(checkpoint, i) for i in committed_batch_ids(checkpoint)
    }
    for tier in _TIERS:
        tdir = os.path.join(state_dir, tier)
        if not os.path.isdir(tdir):
            continue
        for d in os.listdir(tdir):
            m = re.fullmatch(r"d=(.+)", d)
            if (
                m
                and m.group(1) in committed_keys
                and not os.path.isdir(_touched_dir(state_dir, m.group(1)))
            ):
                shutil.rmtree(os.path.join(tdir, d))
                removed[tier] += 1
    return removed


def stream_entity_builds(
    spark: SparkSession,
    feed_path: str,
    state_dir: str,
    checkpoint: str,
    indexes: dict[str, DataFrame],
    merge_order: dict[str, int] | None = None,
    last_harvest: str | None = None,
    compact_every: int | None = None,
):
    """Structured-Streaming wrapper: each micro-batch of change feed rows
    (CHANGES_SCHEMA json) drives one incremental build.

    ``last_harvest`` is the R1 watermark, threaded through to
    incremental_build exactly as in the batch path — feed rows at or
    before it are ignored, so a crawl file containing already-harvested
    stale rows cannot re-apply them (the batch/streaming twins share the
    watermark contract, not just the build body).

    ``compact_every``: fold committed deltas into base every N
    micro-batches, bounding the fold's read-side fan-in on long-running
    streams without an operator in the loop (every fold unions one more
    delta per crawl otherwise).  Runs INSIDE the sink before the batch
    commits, which is safe by the same commit-gating that covers
    retries: it folds only batches committed BEFORE this one, and a
    retry of this batch folds the new base plus nothing — exactly the
    state the first attempt saw."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_entity_state(spark, state_dir, checkpoint)
        entity_build_batch(
            spark, batch, state_dir, indexes,
            checkpoint=checkpoint, batch_id=batch_id,
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
    "read_state_at",
    "latest_state",
    "compact_entity_state",
    "stream_entity_builds",
]
