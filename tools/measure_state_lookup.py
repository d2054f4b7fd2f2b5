"""Serving-read probe (round 13): lookup_state vs the full fold at 30x.

The bucketed base exists for two costs — compaction writes (measured in
measure_entity_stream.py) and keyed point reads.  This probe times the
point read: init a 30x state (1024 buckets), stream one 1,000-change
crawl, then compare

- ``lookup_state`` of 10 keys (reads 10 bucket dirs + 1 delta), vs
- ``latest_state`` fold + filter on the same keys (the pre-r13 way:
  a corpus scan).

Usage:
    python tools/measure_state_lookup.py /tmp/sf1x30
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main(sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_pipeline_spark.streaming.entity_stream import (
        init_state,
        latest_state,
        lookup_state,
        stream_entity_builds,
    )
    from tools.measure_entity_stream import _pair_records, _uri, _write_crawl

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
    work = "/tmp/state_lookup_probe"
    shutil.rmtree(work, ignore_errors=True)
    state_dir = os.path.join(work, "state")
    feed_dir = os.path.join(work, "feed")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(feed_dir)

    records = _pair_records(spark, sf_dir).localCheckpoint()
    n = records.count()
    init_state(spark, records, indexes, state_dir, merge_order=order,
               buckets=1024)
    _write_crawl(os.path.join(feed_dir, "crawl0.jsonl"), 0, time.time())
    q = stream_entity_builds(spark, feed_dir, state_dir, ckpt, indexes, order)
    q.awaitTermination(1200)

    # measure in a FRESH session: the build session's residue (stream
    # drain state, shuffle files, heap) inflated the first probe's
    # lookup 10x (16.5 s vs 1.5 s clean) — a serving deployment reads
    # from its own process, so the fresh session is the honest shape
    spark.stop()
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

    # 5 updated keys (delta winners) + 5 untouched base keys
    keys = [_uri("srcA", k) for k in (1, 5, 9, 13, 17)] + [
        _uri("srcA", k) for k in (5001, 5002, 5003, 5004, 5005)
    ]
    times = {}
    for label, fn in (
        ("lookup_state_10_keys", lambda: lookup_state(
            spark, state_dir, ckpt, keys).count()),
        ("full_fold_filter_10_keys", lambda: latest_state(
            spark, state_dir, ckpt)["records"]
            .filter(F.get_json_object("data", "$.id").isin(keys)).count()),
    ):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            got = fn()
            runs.append(round(time.perf_counter() - t0, 3))
        times[label] = {"rows": got, "sec": runs}
    print(json.dumps({"sf_dir": sf_dir, "n_records": n,
                      "n_buckets": 1024, **times}))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x30")
