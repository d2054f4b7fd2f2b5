"""Shared-index compaction scale protocol (round 14, VERDICT r13 #1):
the bucketed ``compact_index`` measured at corpus scale, the same way
round 13 measured the entity-state compactor.

On the dedup LSH index (bands + shingles — the heavyweight tiers: one
band row per (doc, band) and one shingle row per (doc, 8-gram)) built
over a scaled documents table:

- **init**: ``index_corpus`` -> bucketed base (one parquet file per
  id-hash bucket), wall + per-tier bytes/file counts;
- **partial compaction proportionality**: a TINY (20-doc) and a SMALL
  (1,000-doc) committed crawl folded by ``compact_index`` — wall,
  bucket files REWRITTEN (mtime+size delta) and their bytes vs the
  whole tier.  The claim under measurement: compaction cost ∝ the
  folding batch (id-bucketing keeps one doc's ~dozens of band/shingle
  rows in ONE bucket per tier), never the index;
- **legacy baseline**: the SAME 20-doc fold against a flat
  (pre-round-14) base — the whole-tier rewrite the bucketed layout
  replaces;
- **crash drill at scale**: a fold staged + plan persisted, process
  "dies" before apply; ``repair_index_dir`` must finish the swaps AND
  the folded-batch-dir deletes (the ADVICE r13 double-fold window) —
  verified by row counts, wall recorded.

Usage:
    python tools/measure_index_compact.py /tmp/sf1x30
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

BUCKETS = 1024


def _spin(iters: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += i
    _ = acc
    return round(time.perf_counter() - t0, 3)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except FileNotFoundError:
                pass
    return total


def _base_snapshot(idx: str, tier: str) -> dict[str, tuple[int, int]]:
    base = os.path.join(idx, tier, "batch=base")
    return {
        f: (os.stat(os.path.join(base, f)).st_mtime_ns,
            os.path.getsize(os.path.join(base, f)))
        for f in os.listdir(base)
        if f.endswith(".parquet")
    }


def main(sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")

    from data_pipeline_spark.queries.dedup import (
        bands_df,
        minhash_signatures,
        shingles_df,
    )
    from data_pipeline_spark.streaming.dedup_stream import index_corpus
    from data_pipeline_spark.streaming.index_util import (
        _stage_partial,
        compact_index,
        read_tier_meta,
        repair_index_dir,
        run_batch_key,
        tier_dir,
    )

    canary_start = _spin()
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    work = f"/tmp/idx_compact_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    report: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "buckets": BUCKETS,
                    "canary_start": canary_start}

    # ---- init: bucketed base ------------------------------------------
    idx = os.path.join(work, "lsh")
    t0 = time.perf_counter()
    index_corpus(docs, idx, buckets=BUCKETS)
    report["init_bucketed_sec"] = round(time.perf_counter() - t0, 1)
    for tier in ("bands", "shingles"):
        base = os.path.join(idx, tier, "batch=base")
        files = [f for f in os.listdir(base) if f.endswith(".parquet")]
        report[f"{tier}_base_mb"] = round(_du(base) / 1e6, 1)
        report[f"{tier}_base_files"] = len(files)
        assert read_tier_meta(idx, tier)["buckets"] == BUCKETS

    def _fold_rows(batch):
        sh = shingles_df(batch)
        return bands_df(minhash_signatures(sh)), sh

    def _committed_batch(name: str, batch, batch_id: int = 0) -> str:
        """Write a crawl's band/shingle folds under a committed batch key
        — byte-identical to what stream_dedup's match_batch(append=True)
        persists, without paying the probe."""
        ck = os.path.join(work, f"ck_{name}")
        os.makedirs(os.path.join(ck, "commits"), exist_ok=True)
        with open(os.path.join(ck, "commits", str(batch_id)), "w") as f:
            f.write("{}")
        key = run_batch_key(ck, batch_id)
        b, sh = _fold_rows(batch)
        b.write.mode("overwrite").parquet(tier_dir(idx, "bands", key))
        sh.write.mode("overwrite").parquet(tier_dir(idx, "shingles", key))
        return ck

    # ---- partial compaction: tiny + small crawls ----------------------
    for label, n in (("tiny20", 20), ("small1000", 1000)):
        batch = (
            docs.orderBy("doc_id").limit(n)
            .select((F.col("doc_id") + 90_000_000).alias("doc_id"), "text")
        )
        ck = _committed_batch(label, batch)
        before = {t: _base_snapshot(idx, t) for t in ("bands", "shingles")}
        t0 = time.perf_counter()
        folded = compact_index(spark, idx, ck)
        wall = round(time.perf_counter() - t0, 1)
        row: dict = {"wall_sec": wall, "folded": folded}
        for tier in ("bands", "shingles"):
            after = _base_snapshot(idx, tier)
            changed = {f for f in after if before[tier].get(f) != after[f]}
            row[tier] = {
                "files_rewritten": len(changed),
                "files_total": len(after),
                "mb_rewritten": round(
                    sum(after[f][1] for f in changed) / 1e6, 2
                ),
                "mb_total": round(sum(v[1] for v in after.values()) / 1e6, 1),
            }
        report[f"compact_{label}"] = row
        print(json.dumps({label: row}), flush=True)

    # ---- legacy flat baseline: same 20-doc fold, whole-tier rewrite ---
    flat = os.path.join(work, "flat")
    b, sh = _fold_rows(docs)
    t0 = time.perf_counter()
    b.write.parquet(tier_dir(flat, "bands", "base"))
    sh.write.parquet(tier_dir(flat, "shingles", "base"))
    report["init_flat_sec"] = round(time.perf_counter() - t0, 1)
    batch = (
        docs.orderBy("doc_id").limit(20)
        .select((F.col("doc_id") + 91_000_000).alias("doc_id"), "text")
    )
    ckf = os.path.join(work, "ck_flat")
    os.makedirs(os.path.join(ckf, "commits"))
    with open(os.path.join(ckf, "commits", "0"), "w") as f:
        f.write("{}")
    key = run_batch_key(ckf, 0)
    bb, bsh = _fold_rows(batch)
    bb.write.parquet(tier_dir(flat, "bands", key))
    bsh.write.parquet(tier_dir(flat, "shingles", key))
    bytes_before = _du(flat)
    t0 = time.perf_counter()
    compact_index(spark, flat, ckf)
    report["compact_flat_tiny20"] = {
        "wall_sec": round(time.perf_counter() - t0, 1),
        "mb_rewritten": round(_du(flat) / 1e6, 1),  # whole base restaged
        "note": "legacy replace_all rewrites every tier byte",
    }
    _ = bytes_before
    print(json.dumps({"flat": report["compact_flat_tiny20"]}), flush=True)

    # ---- crash drill at scale: plan persisted, apply never ran --------
    batch = (
        docs.orderBy("doc_id").limit(20)
        .select((F.col("doc_id") + 92_000_000).alias("doc_id"), "text")
    )
    ck = _committed_batch("crash", batch)
    key = run_batch_key(ck, 0)
    pre_counts = {
        t: spark.read.parquet(os.path.join(idx, t)).count()
        for t in ("bands", "shingles")
    }
    new_rows = {
        t: spark.read.parquet(tier_dir(idx, t, key)).count()
        for t in ("bands", "shingles")
    }
    for tier in ("bands", "shingles"):
        tpath = os.path.join(idx, tier)
        cdir = os.path.join(tpath, ".compact")
        meta = read_tier_meta(idx, tier)
        plan = _stage_partial(
            spark, os.path.join(tpath, "batch=base"), cdir,
            spark.read.parquet(tier_dir(idx, tier, key)),
            meta["key"], meta["buckets"], [key],
        )
        with open(os.path.join(cdir, "plan.json"), "w") as f:
            json.dump(plan, f)
    # "crash" here; recovery is the stream-start repair
    t0 = time.perf_counter()
    repair_index_dir(idx)
    repair_wall = round(time.perf_counter() - t0, 2)
    post_counts = {
        t: spark.read.parquet(os.path.join(idx, t)).count()
        for t in ("bands", "shingles")
    }
    ok = all(
        post_counts[t] == pre_counts[t]  # folded rows moved, not doubled
        for t in ("bands", "shingles")
    ) and not any(
        os.path.isdir(tier_dir(idx, t, key)) for t in ("bands", "shingles")
    )
    report["crash_repair"] = {
        "wall_sec": repair_wall, "no_double_fold": ok,
        "rows": post_counts, "fold_rows": new_rows,
    }

    report["canary_end"] = _spin()
    print(json.dumps(report), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
