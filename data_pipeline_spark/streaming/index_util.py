"""Shared batch-keyed index layout for the streaming twins
(dedup_stream.py, similarity_stream.py, refresh_stream.py,
sketch_stream.py).

The streams persist their index tiers as ``<index_dir>/<tier>/batch=<key>``
partition directories and fold each micro-batch with per-partition
overwrite — the idempotency contract under Structured Streaming's
at-least-once delivery.  The layout rules live here ONCE because they are
load-bearing for retry correctness in every stream: a format change
applied to one stream but not the others would break that stream's retry
exclusion while the others' tests stay green.

Bucketed base (round 14 — the entity-state template applied to the
shared indexes): corpus-proportional tiers store ``batch=base`` as ONE
PARQUET FILE PER HASH BUCKET (``b<n>.<i>.parquet``) with the bucket key
and count recorded in a Spark-invisible ``_META.json`` inside the base
directory.  Readers see nothing: the files are ordinary parquet leaves
of the ``batch=base`` partition, so every probe/read path is unchanged
and no partition column leaks.  Compaction gains the partial path: the
folding batches' rows are hashed to their buckets, ONLY those bucket
files are rewritten (old bucket rows + new rows), and each swap is a
single atomic ``os.replace`` — no delete-then-write window exists at
all, strictly stronger than the entity-state per-bucket rmtree+rename.
At 100 TB this is the same class of fix round 13 made for entity state:
the fingerprint/band/shingle/vector tiers scale with corpus row count
(the reference analog is the in-place LMDB reconcile index update of
/root/reference pipeline/process/base/index_loader.py), so a full index
rewrite per compaction cadence was the last O(corpus) maintenance write.
Sketch tiers (regs/cells/bins) stay unbucketed on purpose: they are
BOUNDED-size relations (registers x sources, depth x width cells), so
their whole-tier fold is sketch-sized, not corpus-sized.

Crash recovery (ADVICE r13): the compaction plan records the folded
batch keys, and their directories are deleted INSIDE the plan
application — so a crash after the plan persists but before the deletes
is finished by ``repair_index_dir`` instead of leaving batch dirs that
the next compaction would union into base AGAIN (double-folded shingle
rows inflate Jaccard on later probes).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from contextlib import contextmanager

from .locks import maintenance_lock
from .storage import provider as _storage


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


# ---------------------------------------------------------------------------
# bucketed base (round 14)
# ---------------------------------------------------------------------------

_META_NAME = "_META.json"  # leading underscore: invisible to Spark reads
_BUCKET_FILE = re.compile(r"b(\d+)\.(\d+)\.parquet")


def _bucket_expr(key_cols: list[str], n_buckets: int) -> Column:
    """Bucket of an index row — MUST be one expression shared by the base
    writer (write_base) and the compaction planner/stager: two different
    hashes would route a key's base rows and its new rows to different
    buckets and partial compaction would rewrite the wrong file."""
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")


def auto_buckets(n_rows: int, rows_per_bucket: int = 1_000_000) -> int:
    """Default bucket count: ~1M narrow index rows per bucket, power of
    two, floor 8.  At 100 TB size explicitly instead — the production
    rule is tier_bytes / ~128 MB (the Hudi file-group target), because
    partial compaction rewrites whole bucket files: bucket BYTES, not
    bucket count, bound the cost of one touched key."""
    return 2 ** max(3, math.ceil(math.log2(max(1, n_rows / rows_per_bucket))))


def read_tier_meta(index_dir: str, tier: str) -> dict | None:
    """{"buckets": N, "key": [cols]} for a bucketed-base tier, None for
    the flat (pre-round-14) base, which compacts via the legacy
    whole-tier rewrite until rebuilt with index_corpus."""
    try:
        with open(os.path.join(tier_dir(index_dir, tier, "base"), _META_NAME)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _move_bucket_files(src_root: str, dst: str) -> None:
    """Move a partitionBy('_b') staging output into a flat bucket-file
    base dir: ``_b=<n>/part-*.parquet`` -> ``b<n>.<i>.parquet``."""
    for d in sorted(os.listdir(src_root)):
        m = re.fullmatch(r"_b=(\d+)", d)
        if not m:
            continue
        files = sorted(
            f for f in os.listdir(os.path.join(src_root, d))
            if f.endswith(".parquet")
        )
        for i, f in enumerate(files):
            _storage().publish_file(
                os.path.join(src_root, d, f),
                os.path.join(dst, f"b{m.group(1)}.{i}.parquet"),
            )


def _stage_bucketed(df: DataFrame, key_cols: list[str], n_buckets: int,
                    path: str) -> None:
    # repartition ON the bucket column before the partitioned write: a
    # bucket then lives entirely in one task, so each bucket gets ONE
    # file (the entity-state _write_base rationale — the read path is
    # file-listing bound otherwise).  Production note: cap file size
    # with spark.sql.files.maxRecordsPerFile if a bucket outgrows one
    # task's write; the ~128 MB bucket sizing rule keeps that moot, and
    # the plan format carries per-bucket file LISTS so a split write
    # still applies correctly.
    (
        df.withColumn("_b", _bucket_expr(key_cols, n_buckets))
        .repartition(F.col("_b"))
        .write.partitionBy("_b")
        .parquet(path)
    )


def _seed_empty_bucket(df: DataFrame, dst: str) -> None:
    """``partitionBy`` of 0 rows emits no parquet leaves, so a bucketed
    base written from an empty input would hold only ``_META.json`` and
    every later ``spark.read.parquet(base)`` dies with schema-inference
    noise.  The old flat layout left a schema-bearing empty file, so an
    empty-corpus init WORKED — seed one empty ``b0.0.parquet`` to keep
    that true (ADVICE r14).  The staging tempdir is dot-prefixed inside
    the TIER dir (never ``batch=<x>``-shaped), so a crash mid-seed can
    not leave a directory the batch-partition listing would pick up."""
    tmp = os.path.join(os.path.dirname(dst), ".empty_seed")
    _storage().remove_dir(tmp, missing_ok=True)
    df.limit(0).coalesce(1).write.parquet(tmp)
    part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
    _storage().publish_file(os.path.join(tmp, part), os.path.join(dst, "b0.0.parquet"))
    _storage().remove_dir(tmp)


def write_base(
    df: DataFrame,
    index_dir: str,
    tier: str,
    key_cols: list[str],
    buckets: int | None = None,
) -> None:
    """Write a tier's ``batch=base`` as one parquet file per hash bucket
    plus the ``_META.json`` bucket map — the init-time twin of the
    partial compaction's bucket writer.  Overwrite semantics match the
    old ``mode('overwrite')`` init: index_corpus is the rebuild path,
    not the crash-safe path (there is nothing to lose but the init
    itself).

    Auto-sizing (``buckets=None``) materializes the input with a
    localCheckpoint before counting — without it the full lineage (for
    dedup: the corpus text scan + 8-gram explode) executes once for the
    count and again for the write.  At production scale pass ``buckets``
    explicitly (tier_bytes / ~128 MB) and skip the materialization."""
    if buckets is None:
        df = df.localCheckpoint()
        buckets = auto_buckets(df.count())
    tpath = os.path.join(index_dir, tier)
    # a REBUILD must also clear a crashed compaction's staging+plan:
    # a stale plan left under .compact would otherwise be applied onto
    # the FRESH base at the next stream-start repair — old-corpus bucket
    # files replaced into a new-corpus base (silent corruption)
    _storage().remove_dir(os.path.join(tpath, ".compact"), missing_ok=True)
    stage = os.path.join(tpath, ".init")
    _storage().remove_dir(stage, missing_ok=True)
    _stage_bucketed(df, key_cols, buckets, stage)
    base = tier_dir(index_dir, tier, "base")
    _storage().remove_dir(base, missing_ok=True)
    os.makedirs(base)
    _move_bucket_files(stage, base)
    if not any(_BUCKET_FILE.fullmatch(f) for f in os.listdir(base)):
        _seed_empty_bucket(df, base)
    with open(os.path.join(base, _META_NAME), "w") as f:
        json.dump({"buckets": buckets, "key": key_cols}, f)
    _storage().remove_dir(stage)


def _bucket_files(base: str, n: int) -> list[str]:
    if not os.path.isdir(base):
        return []
    return sorted(
        f for f in os.listdir(base)
        if (m := _BUCKET_FILE.fullmatch(f)) and int(m.group(1)) == n
    )


def compact_index(
    spark: SparkSession,
    index_dir: str,
    checkpoint: str,
    bucket_specs: dict[str, tuple[list[str], int | None]] | None = None,
) -> dict[str, int]:
    """Fold COMMITTED micro-batch partitions into ``batch=base``.

    The batch-keyed layout is correct but unbounded: one partition
    directory per micro-batch forever — a small-files problem at
    production cadence.  This folds, per tier, the partitions of THIS
    checkpoint's committed batches into base and deletes them.

    Two paths:
    - BUCKETED base (``_META.json`` present — written by the round-14
      index_corpus, or by a migration via ``bucket_specs``): the folding
      rows are hashed to their buckets with the writer's own expression,
      ONLY the touched bucket files are rewritten (old bucket rows + new
      rows, staged to the dot-dir), and each swap is one atomic
      ``os.replace`` per file.  Compaction cost scales with the folding
      batches (a small crawl touches few buckets), never the index.
    - LEGACY flat base: the whole tier is folded and swapped in behind a
      ``replace_all`` plan — kept for the bounded-size sketch tiers
      (regs/cells/bins: a full fold is sketch-sized by construction) and
      for pre-round-14 indexes.  Passing ``bucket_specs={tier: (key_cols,
      buckets)}`` migrates such a tier: the full fold is written bucketed
      with a fresh meta, and every later compaction is partial.

    Safety rules, each load-bearing:
    - only batches in the checkpoint's COMMIT log fold (an in-flight or
      failed batch may still be retried; its partition must survive so
      the retry's per-partition overwrite and the probe's own-batch
      exclusion keep working);
    - only THIS checkpoint's keys fold (another run's stream may be
      live against the same index — its keys are not ours to move);
    - the plan file is persisted (atomic tmp+rename) only AFTER staging
      completes — its existence certifies the staged files are whole;
    - the plan records the folded batch keys and their directories are
      deleted INSIDE ``_apply_index_plan`` (ADVICE r13: deleting them
      after apply, outside the plan, left a crash window in which the
      next compaction unioned the already-folded batches into base
      again — duplicated shingle rows, inflated Jaccard);
    - probe results are unchanged by construction: the same rows under
      ``batch=base``, and match_batch's retry exclusion filters on
      ``batch != <live key>``, which ``base`` never is.

    Concurrency: holds the EXCLUSIVE maintenance lock; the streams take
    the SHARED lock around each micro-batch, so an out-of-band
    compact_index serializes against live probes/folds at micro-batch
    boundaries — a probe can never see both a swapped-in fold and its
    not-yet-deleted batch dir (double rows would inflate Jaccard).

    Returns {tier: number of batch directories folded}."""
    with maintenance_lock(index_dir):
        return _compact_index_locked(spark, index_dir, checkpoint, bucket_specs)


def _compact_index_locked(
    spark: SparkSession,
    index_dir: str,
    checkpoint: str,
    bucket_specs: dict[str, tuple[list[str], int | None]] | None,
) -> dict[str, int]:
    _repair_index_locked(index_dir)
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
        new_rows = None
        for k in fold:
            part = spark.read.parquet(tier_dir(index_dir, tier, k))
            new_rows = part if new_rows is None else new_rows.unionByName(part)
        cdir = os.path.join(tpath, ".compact")
        _storage().remove_dir(cdir, missing_ok=True)
        meta = read_tier_meta(index_dir, tier)
        base = tier_dir(index_dir, tier, "base")
        if meta is not None:
            plan = _stage_partial(
                spark, base, cdir, new_rows, meta["key"], meta["buckets"], fold
            )
        elif bucket_specs and tier in bucket_specs:
            # one-time migration: full fold, written bucketed + meta
            key_cols, buckets = bucket_specs[tier]
            if "base" in keys:
                new_rows = new_rows.unionByName(spark.read.parquet(base))
            if buckets is None:
                buckets = auto_buckets(new_rows.count())
            plan = _stage_replace_all(new_rows, key_cols, buckets, cdir,
                                      fold=fold)
        else:
            # legacy whole-tier fold (sketch tiers; pre-round-14 bases)
            srcs = [new_rows] + (
                [spark.read.parquet(base)] if "base" in keys else []
            )
            union = srcs[0]
            for s in srcs[1:]:
                union = union.unionByName(s)
            union.write.parquet(os.path.join(cdir, "next"))
            plan = {"mode": "replace_all", "fold": fold}
        _persist_plan(cdir, plan)
        _apply_index_plan(tpath)
    return out


def _persist_plan(cdir: str, plan: dict) -> None:
    """Atomic tmp+rename: the plan file's existence certifies the
    staging under ``cdir`` is complete."""
    tmp = os.path.join(cdir, "plan.json.tmp")
    with open(tmp, "w") as f:
        json.dump(plan, f)
    _storage().publish_file(tmp, os.path.join(cdir, "plan.json"))


def _stage_replace_all(
    df: DataFrame, key_cols: list[str], buckets: int, cdir: str,
    fold: list[str],
) -> dict:
    """Stage a complete bucketed base (bucket files + meta) under
    ``cdir/next`` and return its ``replace_all`` plan — shared by the
    flat-base migration and rebucket_index so the two whole-base write
    paths cannot drift.  The caller persists the plan (_persist_plan)
    once staging has returned, then applies it."""
    stage = os.path.join(cdir, "stage")
    _stage_bucketed(df, key_cols, buckets, stage)
    nxt = os.path.join(cdir, "next")
    os.makedirs(nxt)
    _move_bucket_files(stage, nxt)
    if not any(_BUCKET_FILE.fullmatch(f) for f in os.listdir(nxt)):
        # same empty-input hole as write_base: a rebucket/migration of an
        # empty tier must still stage a readable base
        _seed_empty_bucket(df, nxt)
    with open(os.path.join(nxt, _META_NAME), "w") as f:
        json.dump({"buckets": buckets, "key": key_cols}, f)
    _storage().remove_dir(stage)
    return {"mode": "replace_all", "fold": fold}


def _stage_partial(
    spark: SparkSession,
    base: str,
    cdir: str,
    new_rows: DataFrame,
    key_cols: list[str],
    n_buckets: int,
    fold: list[str],
) -> dict:
    """Stage the touched-bucket rewrite and return its plan: hash the
    folding rows to buckets (delta-sized distinct collect of at most
    n_buckets ints — control plane), read ONLY those buckets' base files,
    write (old + new) bucketed to the dot-dir, and record the exact
    src-file -> target-file renames so application — and crash recovery —
    is a list of idempotent atomic ``os.replace`` calls."""
    keyed = new_rows.withColumn("_b", _bucket_expr(key_cols, n_buckets))
    touched = sorted(
        r["_b"] for r in keyed.select("_b").distinct().collect()
    )
    old_files = [
        os.path.join(base, f) for n in touched for f in _bucket_files(base, n)
    ]
    staged_rows = keyed.drop("_b")
    if old_files:
        old = spark.read.parquet(*old_files)
        # old bucket rows re-derive their bucket with the same writer
        # expression — equal to the filename's bucket by construction
        staged_rows = staged_rows.unionByName(old)
    nxt = os.path.join(cdir, "next")
    _stage_bucketed(staged_rows, key_cols, n_buckets, nxt)
    swap: dict[str, list[list[str]]] = {}
    for d in sorted(os.listdir(nxt)):
        m = re.fullmatch(r"_b=(\d+)", d)
        if not m:
            continue
        files = sorted(
            f for f in os.listdir(os.path.join(nxt, d)) if f.endswith(".parquet")
        )
        swap[m.group(1)] = [
            [f, f"b{m.group(1)}.{i}.parquet"] for i, f in enumerate(files)
        ]
    return {"mode": "buckets", "swap": swap, "fold": fold}


def _apply_index_plan(tpath: str) -> None:
    """Finish a staged compaction: swap the staged base (whole-dir
    rename) or the staged bucket files (atomic per-file ``os.replace``)
    in, delete the folded batch directories the plan records, clean up.
    Idempotent — every step checks disk state, so a crash at any instant
    re-runs to the same end state."""
    cdir = os.path.join(tpath, ".compact")
    with open(os.path.join(cdir, "plan.json")) as f:
        plan = json.load(f)
    nxt = os.path.join(cdir, "next")
    base = os.path.join(tpath, "batch=base")
    # pre-round-14 plan format ({"swap": "base"}): a crashed old-process
    # plan applied by new code — whole-base swap, no fold list.  The old
    # code deleted folded batch dirs OUTSIDE the plan, so replaying its
    # plan cannot know which dirs it folded: warn that they may survive
    # (and would double-fold at the next compaction — verify row counts
    # or rebuild the index if this upgrade-edge crash actually happened).
    legacy = "mode" not in plan and plan.get("swap") == "base"
    if legacy:
        import warnings

        warnings.warn(
            f"applying a pre-upgrade index compaction plan at {cdir!r}: "
            "its folded batch directories are not recorded in the plan "
            "and may survive — verify tier row counts (a later "
            "compaction would union them into base again) or rebuild "
            "the index with index_corpus",
            stacklevel=2,
        )
    mode = plan.get("mode") or ("replace_all" if legacy else None)
    if mode == "replace_all":
        if os.path.isdir(nxt):
            if os.path.isdir(base):
                _storage().swap_dir(base, os.path.join(cdir, "trash"))
            _storage().swap_dir(nxt, base)
        elif not os.path.isdir(base):
            raise RuntimeError(
                f"index compaction plan at {cdir!r} is unrecoverable: "
                "neither batch=base nor a staged replacement exists"
            )
    elif mode == "buckets":
        for n, pairs in plan["swap"].items():
            srcdir = os.path.join(nxt, f"_b={n}")
            keep = set()
            for src, tgt in pairs:
                keep.add(tgt)
                s = os.path.join(srcdir, src)
                t = os.path.join(base, tgt)
                if os.path.isfile(s):
                    _storage().publish_file(s, t)  # atomic overwrite
                elif not os.path.isfile(t):
                    raise RuntimeError(
                        f"index compaction plan for bucket {n} at {cdir!r} "
                        "is unrecoverable: staged file and target both "
                        f"missing ({src} -> {tgt})"
                    )
            # prune the previous generation's extra files of this bucket
            # (a bucket that shrank from i files to j<i): AFTER the
            # renames, so every instant keeps at least one complete copy
            for f in _bucket_files(base, int(n)):
                if f not in keep:
                    _storage().remove_file(os.path.join(base, f))
    else:
        raise RuntimeError(f"unknown index compaction plan mode in {cdir!r}")
    for k in plan.get("fold", ()):
        # inside the plan application (ADVICE r13): recovery finishes
        # these deletes too, so a folded batch can never be union'd into
        # base a second time by the next compaction
        _storage().remove_dir(os.path.join(tpath, f"batch={k}"), missing_ok=True)
    _storage().remove_dir(cdir)


def rebucket_index(
    spark: SparkSession,
    index_dir: str,
    buckets: int,
    tiers: list[str] | None = None,
) -> None:
    """Rewrite bucketed base tiers under a NEW bucket count — the
    maintenance op that keeps the ~128 MB-per-bucket-file rule true as
    the index grows (``index_stats``' bucket_bytes_max is the trigger),
    the index twin of entity_stream.rebucket_state.

    Simpler than the entity version: index folds are APPENDS whose
    bucket is recomputed from the tier meta at fold time, so pending
    ``batch=<key>`` partitions never straddle bucket maps — no
    compact-first precondition, and the meta swaps atomically WITH the
    base (it lives inside ``batch=base``).  Deliberately O(tier), like
    init; each tier stages the rewrite and swaps it in behind a
    ``replace_all`` plan (a crash at any instant leaves the old base or
    the new one, finished by repair).  Holds the exclusive maintenance
    lock.  Flat (meta-less) tiers are skipped — rebuild those with
    index_corpus or migrate via compact_index(bucket_specs=...)."""
    if buckets < 1:
        raise ValueError("rebucket_index: buckets must be >= 1")
    with maintenance_lock(index_dir):
        _repair_index_locked(index_dir)
        todo = tiers if tiers is not None else sorted(os.listdir(index_dir))
        for tier in todo:
            tpath = os.path.join(index_dir, tier)
            if not os.path.isdir(tpath):
                if tiers is not None:  # explicitly asked: fail loudly,
                    # not a silent no-op printed as success (a typo'd
                    # --tier must not leave oversized buckets in place)
                    raise ValueError(
                        f"rebucket_index: tier {tier!r} does not exist "
                        f"under {index_dir!r}"
                    )
                continue
            meta = read_tier_meta(index_dir, tier)
            if meta is None:
                if tiers is not None:  # explicitly asked: fail loudly
                    raise ValueError(
                        f"rebucket_index: tier {tier!r} has no bucketed "
                        "base — rebuild with index_corpus or migrate via "
                        "compact_index(bucket_specs=...)"
                    )
                continue
            df = spark.read.parquet(tier_dir(index_dir, tier, "base"))
            cdir = os.path.join(tpath, ".compact")
            _storage().remove_dir(cdir, missing_ok=True)
            plan = _stage_replace_all(df, meta["key"], buckets, cdir,
                                      fold=[])
            _persist_plan(cdir, plan)
            _apply_index_plan(tpath)


def index_stats(index_dir: str, checkpoint: str | None = None) -> dict:
    """Operator-facing index summary (no Spark jobs — a directory
    walk): per-tier layout + bucket count, base bytes, bucket-file
    spread (max/mean — the rebucket_index trigger), and batch-partition
    fan-in (how many ``batch=<key>`` dirs every probe currently lists —
    the compact_every feedback); with ``checkpoint``, how many of those
    are committed (foldable) vs retry-owned."""

    def du(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except FileNotFoundError:
                    pass
        return total

    if not os.path.isdir(index_dir):
        return {"tiers": {}}
    committed_keys: set[str] | None = None
    if checkpoint is not None:
        committed_keys = {
            run_batch_key(checkpoint, i)
            for i in committed_batch_ids(checkpoint)
        }
    out: dict = {"tiers": {}}
    for tier in sorted(os.listdir(index_dir)):
        tpath = os.path.join(index_dir, tier)
        if not os.path.isdir(tpath):
            continue
        meta = read_tier_meta(index_dir, tier)
        base = tier_dir(index_dir, tier, "base")
        sizes = []
        for f in (os.listdir(base) if os.path.isdir(base) else []):
            if _BUCKET_FILE.fullmatch(f):
                try:
                    sizes.append(os.path.getsize(os.path.join(base, f)))
                except FileNotFoundError:
                    # lock-free by design (live-stream feedback tool): a
                    # concurrent swap/prune may remove a listed file
                    pass
        batches = [
            m.group(1)
            for d in (os.listdir(tpath))
            if (m := re.fullmatch(r"batch=(.+)", d)) and m.group(1) != "base"
        ]
        row: dict = {
            "layout": "bucketed" if meta else "flat",
            "buckets": (meta or {}).get("buckets"),
            "key": (meta or {}).get("key"),
            "base_bytes": du(base),
            "bucket_files": len(sizes),
            "bucket_bytes_max": max(sizes, default=0),
            "bucket_bytes_mean": int(sum(sizes) / len(sizes)) if sizes else 0,
            "batch_dirs": len(batches),
            "batch_bytes": sum(
                du(os.path.join(tpath, f"batch={k}")) for k in batches
            ),
        }
        if committed_keys is not None:
            row["committed_batch_dirs"] = sum(
                1 for k in batches if k in committed_keys
            )
        out["tiers"][tier] = row
    return out


@contextmanager
def shared_index_lease(index_dir: str):
    """Repair-then-shared acquisition for the stream sinks (ADVICE r14).

    A stream-start ``repair_index_dir`` is not enough in the documented
    multi-process shared-index deployment: an OUT-OF-BAND compactor can
    die mid-``_apply_index_plan`` (plan persisted, some bucket files
    swapped, folded batch dirs not yet deleted) WHILE a stream is live —
    the OS releases the dead process's flock, so the stream's next
    micro-batch would acquire the SHARED lock and probe an index where
    the folded rows exist both in the new bucket files and in the
    surviving ``batch=<key>`` dirs (double-counted shingle rows inflate
    Jaccard denominators — silently wrong matches).  Mirror
    entity_stream.lookup_state: take the EXCLUSIVE lock first and finish
    any pending plan (blocking — if a live compactor holds the lock we
    wait it out; if it died mid-apply while we waited, we acquire and
    complete its plan), then serve the micro-batch under the SHARED
    lock.

    The exclusive acquisition is gated on a LOCK-FREE probe for a
    persisted ``plan.json`` — without it, every micro-batch's blocking
    ``flock(LOCK_EX)`` would wait out every OTHER stream's shared-held
    micro-batch on the same index dir, serializing streams that
    overlapped freely pre-r15 (review catch).  The probe is sound
    because a pending PLAN is the only read hazard: staging without a
    plan means either a LIVE compactor mid-staging (its exclusive lock
    excludes our shared one regardless) or a dead pre-plan compactor
    (base untouched — probes read correctly past garbage staging, which
    the next maintenance entry sweeps).  A compactor dying right after
    a no-plan probe is the same bounded residual as the
    exclusive-release-to-shared-acquire gap below: the next
    micro-batch's probe sees its plan and repairs."""
    if _pending_plans(index_dir):
        repair_index_dir(index_dir)
    with maintenance_lock(index_dir, shared=True):
        yield


def _pending_plans(index_dir: str) -> bool:
    """Lock-free: does any tier hold a persisted compaction/rebucket
    plan?  plan.json is published atomically (tmp + publish_file), so
    the probe sees it fully or not at all."""
    if not os.path.isdir(index_dir):
        return False
    for tier in os.listdir(index_dir):
        if os.path.isfile(
            os.path.join(index_dir, tier, ".compact", "plan.json")
        ):
            return True
    return False


def repair_index_dir(index_dir: str) -> None:
    """Resume (plan present: staging completed) or roll back (no plan:
    base untouched) an interrupted compaction in every tier of a
    batch-keyed index.  Streams call this once at start — the realistic
    recovery moment for a process that died mid-compaction.  Takes the
    exclusive maintenance lock: a concurrent LIVE compactor must never
    race a second repairer on the same staging dir (rmtree vs rename),
    and a no-plan rollback must never delete staging a live compactor
    is still writing (ADVICE r13)."""
    with maintenance_lock(index_dir):
        _repair_index_locked(index_dir)


def _repair_index_locked(index_dir: str) -> None:
    if not os.path.isdir(index_dir):
        return
    for tier in sorted(os.listdir(index_dir)):
        tpath = os.path.join(index_dir, tier)
        if not os.path.isdir(tpath):
            continue
        cdir = os.path.join(tpath, ".compact")
        if not os.path.isdir(cdir):
            continue
        if os.path.isfile(os.path.join(cdir, "plan.json")):
            _apply_index_plan(tpath)
        else:
            _storage().remove_dir(cdir)
