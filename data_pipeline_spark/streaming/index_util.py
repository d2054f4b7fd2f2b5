"""Shared batch-keyed index layout for the streaming twins
(dedup_stream.py, similarity_stream.py).

Both streams persist their index tiers as ``<index_dir>/<tier>/batch=<key>``
partition directories and fold each micro-batch with per-partition
overwrite — the idempotency contract under Structured Streaming's
at-least-once delivery.  The layout rules live here ONCE because they are
load-bearing for retry correctness in both modules: a format change
applied to one stream but not the other would break that stream's retry
exclusion while the other's tests stay green.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession


def tier_dir(index_dir: str, tier: str, key: str) -> str:
    """Batch-keyed partition directory of an index tier.  Keys are always
    non-numeric strings ('base', '<32-hex>-b0') so partition-type
    inference is stable across any batch mix."""
    return os.path.join(index_dir, tier, f"batch={key}")


def require_batch_layout(df: DataFrame, index_dir: str, tier: str) -> DataFrame:
    """Refuse to stream against a pre-batch-keyed (flat) index with one
    actionable error instead of an unresolved-column AnalysisException on
    every micro-batch: an index written by the old flat ``append`` layout
    has no ``batch`` partition column, so the retry-exclusion filter can
    never work against it."""
    if "batch" not in df.columns:
        raise ValueError(
            f"index tier {os.path.join(index_dir, tier)!r} uses the flat "
            "(pre-batch-keyed) layout — no 'batch' partition column. "
            "Streaming folds are batch-keyed for retry idempotency; "
            "rebuild the index with index_corpus() (which writes "
            "batch=base) before streaming against it."
        )
    return df


def run_batch_key(checkpoint: str, batch_id: int) -> str:
    """Partition key for one micro-batch, scoped to the stream's
    checkpoint: ``<full 32-hex md5 of the checkpoint path>-b<id>``.
    The FULL digest, not a prefix: the key is a directory name (length
    is free) and a truncated-digest collision between two distinct
    checkpoint paths would recreate exactly the silent cross-run
    batch-0 overwrite the scoping exists to prevent.

    Micro-batch ids are only unique WITHIN one checkpoint lineage — a
    stream restarted with a FRESH checkpoint (a common remediation after
    checkpoint corruption) restarts at batch 0 and, keyed on the bare id,
    would silently OVERWRITE the previous run's ``batch=b0`` fold and
    matches: data loss, strictly worse than the duplication the keying
    exists to prevent.  Scoping the key to the checkpoint path keeps
    genuine retries and checkpoint resumes (same lineage, same key)
    idempotent, while a fresh-checkpoint run folds alongside the old
    run's partitions instead of over them."""
    h = hashlib.md5(os.path.abspath(checkpoint).encode("utf-8")).hexdigest()
    return f"{h}-b{batch_id}"


def committed_batch_ids(checkpoint: str) -> set[int]:
    """Micro-batch ids with a COMMIT entry in the checkpoint's commit
    log.  A committed batch is durably done — Structured Streaming
    resumes AFTER the last commit, never re-executing it — so its index
    partition can be compacted without breaking the retry exclusion."""
    commits = os.path.join(checkpoint, "commits")
    if not os.path.isdir(commits):
        return set()
    return {int(f) for f in os.listdir(commits) if f.isdigit()}


def compact_index(
    spark: SparkSession, index_dir: str, checkpoint: str
) -> dict[str, int]:
    """Fold COMMITTED micro-batch partitions into ``batch=base``.

    The batch-keyed layout is correct but unbounded: one partition
    directory per micro-batch forever — a small-files problem at
    production cadence.  This rewrites, per tier, the partitions of
    THIS checkpoint's committed batches (plus the existing base) into
    one ``batch=base`` directory and deletes the folded directories.

    Safety rules, each load-bearing:
    - only batches in the checkpoint's COMMIT log fold (an in-flight or
      failed batch may still be retried; its partition must survive so
      the retry's per-partition overwrite and the probe's own-batch
      exclusion keep working);
    - only THIS checkpoint's keys fold (another run's stream may be
      live against the same index — its keys are not ours to move);
    - the union is materialized (localCheckpoint) BEFORE the base
      overwrite, since ``base`` is both a source and the target;
    - probe results are unchanged by construction: the same rows under
      a different partition value, and match_batch's retry exclusion
      filters on ``batch != <live key>``, which ``base`` never is.

    Crash safety (round 13, same fix as the entity-state compaction):
    the folded base is STAGED to a dot-dir (invisible to Spark readers),
    a plan file is persisted (atomic tmp+rename — its existence
    certifies the staging is complete), and the swap is two atomic
    directory renames.  The previous ``mode("overwrite")`` had a
    delete-then-write window in which a crash lost the only copy of
    base.  ``repair_index_dir`` (called here and at every stream start)
    resumes a planned swap or rolls back unplanned staging.

    Returns {tier: number of batch directories folded}."""
    repair_index_dir(index_dir)
    done = committed_batch_ids(checkpoint)
    h = hashlib.md5(os.path.abspath(checkpoint).encode("utf-8")).hexdigest()
    foldable = {f"{h}-b{i}" for i in done}
    out: dict[str, int] = {}
    for tier in sorted(os.listdir(index_dir)):
        tpath = os.path.join(index_dir, tier)
        if not os.path.isdir(tpath):
            continue
        keys = [
            m.group(1)
            for d in sorted(os.listdir(tpath))
            if (m := re.fullmatch(r"batch=(.+)", d))
        ]
        fold = [k for k in keys if k in foldable]
        out[tier] = len(fold)
        if not fold:
            continue
        srcs = fold + (["base"] if "base" in keys else [])
        union = None
        for k in srcs:
            part = spark.read.parquet(tier_dir(index_dir, tier, k))
            union = part if union is None else union.unionByName(part)
        cdir = os.path.join(tpath, ".compact")
        shutil.rmtree(cdir, ignore_errors=True)
        union.write.parquet(os.path.join(cdir, "next"))
        tmp = os.path.join(cdir, "plan.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"swap": "base"}, f)
        os.rename(tmp, os.path.join(cdir, "plan.json"))
        _apply_index_plan(tpath)
        for k in fold:
            shutil.rmtree(tier_dir(index_dir, tier, k))
    return out


def _apply_index_plan(tpath: str) -> None:
    """Finish a staged base swap: trash the old base, rename the staged
    one in, clean up.  Idempotent — every step checks disk state, so a
    crash at any instant re-runs to the same end state."""
    cdir = os.path.join(tpath, ".compact")
    nxt = os.path.join(cdir, "next")
    base = os.path.join(tpath, "batch=base")
    if os.path.isdir(nxt):
        if os.path.isdir(base):
            os.rename(base, os.path.join(cdir, "trash"))
        os.rename(nxt, base)
    elif not os.path.isdir(base):
        raise RuntimeError(
            f"index compaction plan at {cdir!r} is unrecoverable: "
            "neither batch=base nor a staged replacement exists"
        )
    shutil.rmtree(cdir)


def repair_index_dir(index_dir: str) -> None:
    """Resume (plan present: staging completed) or roll back (no plan:
    base untouched) an interrupted compaction in every tier of a
    batch-keyed index.  Streams call this once at start — the realistic
    recovery moment for a process that died mid-compaction."""
    if not os.path.isdir(index_dir):
        return
    for tier in sorted(os.listdir(index_dir)):
        tpath = os.path.join(index_dir, tier)
        cdir = os.path.join(tpath, ".compact")
        if not os.path.isdir(cdir):
            continue
        if os.path.isfile(os.path.join(cdir, "plan.json")):
            _apply_index_plan(tpath)
        else:
            shutil.rmtree(cdir)
