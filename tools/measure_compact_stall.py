"""Inline-compaction stall budget + rebucket_state protocol (round 14,
VERDICT r13 #5/#6).

``compact_every`` fires INSIDE the foreachBatch sink, so the batch that
triggers compaction stalls the stream for the compaction's wall.  This
tool measures that worst case at corpus scale: nine 1,000-change crawls
streamed with ``compact_every=4`` — batches 4 and 8 each fold the four
crawls before them — and reports every batch's duration from the
query's own progress log, so the stall is the measured gap between a
compacting batch and its neighbors.

Then the remaining maintenance op without a protocol row:
``rebucket_state`` (1024 -> 2048) on the same corpus-scale state —
wall, plus the mid-rebucket crash path at scale (meta marker present:
the serving lookup falls back to the full fold — both walls recorded —
and the next compaction completes the rebucket at the marker's target).

Usage:
    python tools/measure_compact_stall.py /tmp/sf1x100 [buckets=1024]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

import measure_entity_stream as mes  # noqa: E402  (helpers shared)

N_CRAWLS = 9
COMPACT_EVERY = 4


def main(sf_dir: str, buckets: int) -> None:
    from data_pipeline_spark.streaming.entity_stream import (
        compact_entity_state,
        lookup_state,
        read_state_meta,
        rebucket_state,
        state_stats,
        stream_entity_builds,
    )
    from data_pipeline_spark.streaming.entity_stream import _write_state_meta

    canary_start = mes._spin()
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
    e = spark.createDataFrame
    indexes = {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }
    order = {"srcA": 0, "srcB": 1, "srcN": 2}

    work = "/tmp/compact_stall"
    shutil.rmtree(work, ignore_errors=True)
    state_dir = os.path.join(work, "state")
    feed_dir = os.path.join(work, "feed")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(feed_dir)

    records = mes._pair_records(spark, sf_dir).localCheckpoint()
    n_records = records.count()
    report: dict = {"sf_dir": sf_dir, "n_records": n_records,
                    "buckets": buckets, "compact_every": COMPACT_EVERY,
                    "canary_start": canary_start}

    from data_pipeline_spark.streaming.entity_stream import init_state

    t0 = time.perf_counter()
    init_state(spark, records, indexes, state_dir, merge_order=order,
               buckets=buckets)
    report["init_sec"] = round(time.perf_counter() - t0, 1)

    # ---- the stall run: 9 crawls, compaction inside batches 4 and 8 ----
    now = time.time()
    for i in range(N_CRAWLS):
        mes._write_crawl(os.path.join(feed_dir, f"crawl{i}.jsonl"), i, now + i)
    t0 = time.perf_counter()
    q = stream_entity_builds(spark, feed_dir, state_dir, ckpt, indexes,
                             order, compact_every=COMPACT_EVERY)
    q.awaitTermination(3600)
    report["stream_total_sec"] = round(time.perf_counter() - t0, 1)
    report["batch_secs"] = [
        round(p["batchDuration"] / 1000.0, 1)
        for p in (json.loads(sp.json) for sp in q.recentProgress)
        if p.get("batchDuration")
    ]
    print(json.dumps({"batch_secs": report["batch_secs"]}), flush=True)

    # ---- rebucket: drain remaining deltas first (its precondition) ----
    t0 = time.perf_counter()
    compact_entity_state(spark, state_dir, ckpt)
    report["final_compact_sec"] = round(time.perf_counter() - t0, 1)
    st = state_stats(state_dir, ckpt)
    report["bucket_bytes_max_before"] = st["tiers"]["merged"]["bucket_bytes_max"]
    t0 = time.perf_counter()
    rebucket_state(spark, state_dir, ckpt, buckets * 2)
    report["rebucket_sec"] = round(time.perf_counter() - t0, 1)
    st = state_stats(state_dir, ckpt)
    report["bucket_bytes_max_after"] = st["tiers"]["merged"]["bucket_bytes_max"]
    assert read_state_meta(state_dir)["buckets"] == buckets * 2

    # ---- mid-rebucket crash at scale: marker present, bucket map not
    # to be trusted — the serving lookup must fall back to the full fold
    # (wall recorded vs the pruned path), and the next compaction
    # completes the rebucket at the marker's target ----
    keys = [f"https://fixture.test/srcA/{k}" for k in range(50, 60)]
    t0 = time.perf_counter()
    n_pruned = lookup_state(spark, state_dir, ckpt, keys).count()
    report["lookup_pruned_sec"] = round(time.perf_counter() - t0, 1)
    meta = read_state_meta(state_dir)
    _write_state_meta(state_dir, {**meta, "rebucket_to": buckets})
    t0 = time.perf_counter()
    n_fallback = lookup_state(spark, state_dir, ckpt, keys).count()
    report["lookup_fallback_sec"] = round(time.perf_counter() - t0, 1)
    assert n_fallback == n_pruned
    # a crawl lands while the marker is up; compaction completes the
    # rebucket via its full-rewrite path
    mes._write_crawl(os.path.join(feed_dir, f"crawl{N_CRAWLS}.jsonl"),
                     N_CRAWLS, now + N_CRAWLS)
    q2 = stream_entity_builds(spark, feed_dir, state_dir, ckpt, indexes, order)
    q2.awaitTermination(1200)
    t0 = time.perf_counter()
    compact_entity_state(spark, state_dir, ckpt)
    report["compact_completes_rebucket_sec"] = round(
        time.perf_counter() - t0, 1
    )
    assert read_state_meta(state_dir) == {
        "layout": "bucketed", "buckets": buckets
    }

    report["canary_end"] = mes._spin()
    print(json.dumps(report), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1024)
