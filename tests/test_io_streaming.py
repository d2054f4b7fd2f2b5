"""Tests for sources (JSONL dump load with pre-parse skip), sinks (upsert
merge, sharded exports, NT lines), and the change-feed ingestion in both
batch and Structured-Streaming form."""

from __future__ import annotations

import gzip
import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.sinks.exports import (
    export_jsonl,
    export_ntriples,
    merge_upsert,
    write_upsert_parquet,
)
from data_pipeline_spark.sources.loaders import load_jsonl_dump
from data_pipeline_spark.streaming.ingest import apply_changes, stream_changes


# ---------------------------------------------------------------------- S5
def test_jsonl_dump_load_with_sniff_skip(spark, tmp_path):
    dump = tmp_path / "dump.jsonl.gz"
    rows = [{"id": f"rec{i}", "type": "Person", "name": f"P{i}"} for i in range(10)]
    rows.append({"type": "property", "junk": True})  # no id -> dropped by sniff
    with gzip.open(dump, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    existing = spark.createDataFrame([(f"rec{i}",) for i in range(5)], ["identifier"])
    out = load_jsonl_dump(
        spark,
        str(dump),
        schema="id string, type string, name string",
        existing_keys=existing,
    )
    got = {r.identifier for r in out.collect()}
    assert got == {f"rec{i}" for i in range(5, 10)}
    assert out.filter(F.col("doc.name").isNull()).count() == 0


def test_jsonl_prefilter(spark, tmp_path):
    dump = tmp_path / "d.jsonl"
    with open(dump, "w") as f:
        f.write('{"id": "a", "type": "property"}\n{"id": "b", "type": "item"}\n')
    out = load_jsonl_dump(
        spark, str(dump), schema="id string, type string",
        prefilter=r'"type":\s*"property"',
    )
    assert [r.identifier for r in out.collect()] == ["b"]


# ---------------------------------------------------------------------- K1
def test_merge_upsert_semantics(spark):
    existing = spark.createDataFrame(
        [("a", 1, "old"), ("b", 1, "keep")], ["k", "v", "tag"]
    )
    updates = spark.createDataFrame(
        [("a", 2, "new"), ("c", 1, "insert")], ["k", "v", "tag"]
    )
    got = {r.k: (r.v, r.tag) for r in merge_upsert(existing, updates, "k").collect()}
    assert got == {"a": (2, "new"), "b": (1, "keep"), "c": (1, "insert")}


def test_write_upsert_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tier")
    write_upsert_parquet(
        spark, spark.createDataFrame([("a", 1)], ["k", "v"]), path, key="k"
    )
    write_upsert_parquet(
        spark, spark.createDataFrame([("a", 2), ("b", 1)], ["k", "v"]), path, key="k"
    )
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"a": 2, "b": 1}


# ------------------------------------------------------------------- K4/K6
def test_exports(spark, tmp_path):
    df = spark.createDataFrame([(i, f"n{i}") for i in range(100)], ["id", "name"])
    jdir = str(tmp_path / "jsonl")
    export_jsonl(df, jdir, shards=4)
    back = spark.read.json(jdir)
    assert back.count() == 100
    assert len([f for f in os.listdir(jdir) if f.startswith("part-")]) == 4

    edges = spark.createDataFrame(
        [("https://a.test/x", "broader", "https://a.test/y"),
         ("yuid-1", "rdf:type", "Person")],
        ["subject", "predicate", "object"],
    )
    ndir = str(tmp_path / "nt")
    export_ntriples(edges, ndir, shards=1)
    lines = set(spark.read.text(ndir).toPandas()["value"])
    assert "<https://a.test/x> <https://lux.example/ns/broader> <https://a.test/y> ." in lines
    assert '<urn:yuid:yuid-1> <https://lux.example/ns/rdf:type> "Person" .' in lines


def test_ntriples_literal_escaping(spark):
    """N-Triples grammar: backslash escaped before quotes (no
    double-escape corruption), control characters never break the line."""
    from data_pipeline_spark.pipeline.edges import to_ntriples

    edges = spark.createDataFrame(
        [("yuid-1", "note", 'back\\slash and "quote"'),
         ("yuid-1", "note2", "line one\nline two\ttabbed")],
        ["subject", "predicate", "object"],
    )
    lines = [r.nt for r in to_ntriples(edges).collect()]
    assert (
        '<urn:yuid:yuid-1> <https://lux.example/ns/note> "back\\\\slash and \\"quote\\"" .'
        in lines
    )
    assert (
        '<urn:yuid:yuid-1> <https://lux.example/ns/note2> "line one\\nline two\\ttabbed" .'
        in lines
    )
    assert all("\n" not in ln for ln in lines)


# ---------------------------------------------------------------- R1-R8
@pytest.fixture()
def cache(spark):
    return spark.createDataFrame(
        [
            ("uri:a", "2026-01-15 00:00:00", '{"id":"uri:a","v":1}'),
            ("uri:b", "2026-01-15 00:00:00", '{"id":"uri:b","v":1}'),
            ("uri:c", "2026-01-15 00:00:00", '{"id":"uri:c","v":1}'),
        ],
        "object_uri string, record_time string, data string",
    ).withColumn("record_time", F.col("record_time").cast("timestamp"))


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "seq bigint, end_time string, change string, object_uri string, payload string"
    ).withColumn("end_time", F.col("end_time").cast("timestamp"))


def test_apply_changes_upsert_delete_watermark(spark, cache):
    ch = _changes(
        spark,
        [
            (1, "2026-02-01 10:00:00", "update", "uri:a", '{"id":"uri:a","v":2}'),
            (2, "2026-02-01 09:00:00", "update", "uri:a", '{"id":"uri:a","v":99}'),  # loses dedupe
            (3, "2026-02-01 08:00:00", "delete", "uri:b", None),
            (4, "2026-01-01 00:00:00", "update", "uri:c", '{"id":"uri:c","v":9}'),  # pre-watermark
            (5, "2026-02-01 11:00:00", "create", "uri:d", '{"id":"uri:d","v":1}'),
        ],
    )
    out = apply_changes(cache, ch, last_harvest="2026-01-10 00:00:00")
    got = {r.object_uri: json.loads(r.data)["v"] for r in out.collect()}
    assert got == {"uri:a": 2, "uri:c": 1, "uri:d": 1}  # b deleted, c unchanged


def test_delete_vetoed_by_inbound_refs(spark, cache):
    ch = _changes(spark, [(1, "2026-02-01 10:00:00", "delete", "uri:b", None)])
    edges = spark.createDataFrame(
        [("uri:a", "part_of", "uri:b")], ["subject", "predicate", "object"]
    )
    out = apply_changes(cache, ch, edges=edges)
    assert "uri:b" in {r.object_uri for r in out.collect()}  # survives (R8 veto)


def test_freshness_gate(spark, cache):
    ch = _changes(
        spark,
        [(1, "2026-01-10 00:00:00", "update", "uri:a", '{"id":"uri:a","v":0}')],
    )
    out = apply_changes(cache, ch)  # change older than cached record_time
    got = {r.object_uri: json.loads(r.data)["v"] for r in out.collect()}
    assert got["uri:a"] == 1  # R6: skip-if-fresher kept the cache row


# --------------------------------------------------- Structured Streaming
def test_stream_changes_end_to_end(spark, tmp_path):
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    rows = [
        {"seq": 1, "end_time": "2026-02-01T10:00:00", "change": "create",
         "object_uri": "uri:x", "payload": '{"id":"uri:x","v":1}'},
        {"seq": 2, "end_time": "2026-02-01T11:00:00", "change": "update",
         "object_uri": "uri:x", "payload": '{"id":"uri:x","v":2}'},
        {"seq": 3, "end_time": "2026-02-01T12:00:00", "change": "create",
         "object_uri": "uri:y", "payload": '{"id":"uri:y","v":1}'},
    ]
    with open(feed_dir / "page1.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cache_path = str(tmp_path / "cache")
    q = stream_changes(
        spark, str(feed_dir), cache_path, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {r.object_uri: json.loads(r.data)["v"] for r in spark.read.parquet(cache_path).collect()}
    assert got == {"uri:x": 2, "uri:y": 1}


def test_stream_changes_delete_not_resurrected(spark, tmp_path):
    """Regression: a delete flowing through the streaming sink must actually
    remove the row — the sink commits apply_changes' FULL output atomically
    instead of key-merging it against the old cache (which kept exactly the
    deleted keys)."""
    cache_path = str(tmp_path / "cache")
    seed = spark.createDataFrame(
        [("uri:a", "2026-01-15 00:00:00", '{"id":"uri:a","v":1}'),
         ("uri:b", "2026-01-15 00:00:00", '{"id":"uri:b","v":1}')],
        "object_uri string, record_time string, data string",
    ).withColumn("record_time", F.col("record_time").cast("timestamp"))
    seed.write.parquet(cache_path)

    feed_dir = tmp_path / "dfeed"
    feed_dir.mkdir()
    rows = [
        {"seq": 1, "end_time": "2026-02-01T10:00:00", "change": "delete",
         "object_uri": "uri:a", "payload": None},
        {"seq": 2, "end_time": "2026-02-01T11:00:00", "change": "update",
         "object_uri": "uri:b", "payload": '{"id":"uri:b","v":2}'},
    ]
    with open(feed_dir / "page1.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    q = stream_changes(
        spark, str(feed_dir), cache_path, checkpoint=str(tmp_path / "dckpt")
    )
    q.awaitTermination(120)
    got = {r.object_uri: json.loads(r.data)["v"] for r in spark.read.parquet(cache_path).collect()}
    assert got == {"uri:b": 2}  # uri:a is gone, not resurrected


def test_run_harvest_delete_only(spark, tmp_path):
    """Regression: run_harvest with fetch_record=None promises 'only deletes
    take effect' — the delete must survive the cache commit."""
    from data_pipeline_spark.sources.harvester import run_harvest

    cache_path = str(tmp_path / "hcache")
    seed = spark.createDataFrame(
        [("uri:x", "2026-01-01 00:00:00", '{"id":"uri:x"}'),
         ("uri:y", "2026-01-01 00:00:00", '{"id":"uri:y"}')],
        "object_uri string, record_time string, data string",
    ).withColumn("record_time", F.col("record_time").cast("timestamp"))
    seed.write.parquet(cache_path)

    pages = {
        "coll": {"last": {"id": "p1"}},
        "p1": {"orderedItems": [
            {"type": "Delete", "endTime": "2026-02-01 10:00:00",
             "object": {"id": "uri:x"}},
        ]},
    }
    n = run_harvest(spark, pages.__getitem__, "coll", cache_path, fetch_record=None)
    assert n == 1
    got = {r.object_uri for r in spark.read.parquet(cache_path).collect()}
    assert got == {"uri:y"}


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-user running totals must accumulate
    across micro-batches (two files, maxFilesPerTrigger=1 -> two batches
    in one run; memory sink cannot recover checkpoints, so state
    continuity is exercised WITHIN the run)."""
    from data_pipeline_spark.streaming.stateful import running_user_totals

    feed = tmp_path / "sfeed"
    feed.mkdir()
    with open(feed / "a.jsonl", "w") as f:
        for r in [{"user_id": 1, "value": 10.0}, {"user_id": 1, "value": 5.0},
                  {"user_id": 2, "value": 7.0}]:
            f.write(json.dumps(r) + "\n")
    with open(feed / "b.jsonl", "w") as f:
        f.write(json.dumps({"user_id": 1, "value": 1.0}) + "\n")

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM totals").collect()
    # update mode re-emits per batch: the final state per user is the max
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value)
    assert final == {1: (3, 16.0), 2: (1, 7.0)}
    # state actually spanned more than one emission for user 1
    assert len([r for r in rows if r.user_id == 1]) >= 2


def test_stream_dedup_against_indexed_corpus(spark, tmp_path):
    """Near-dup matching of streamed docs against a persisted LSH index;
    later batches see earlier batches' documents (index append)."""
    from data_pipeline_spark.streaming.dedup_stream import (
        index_corpus,
        stream_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again today "
        "while the patient grey owl watches from a very tall oak tree and "
        "counts every single jump with great care and quiet amusement"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words about spark sql engines here")],
        "doc_id bigint, text string",
    )
    index_dir = str(tmp_path / "lsh_index")
    index_corpus(corpus, index_dir)

    feed = tmp_path / "docfeed"
    feed.mkdir()
    with open(feed / "batch1.jsonl", "w") as f:
        # near-copy of doc 1 (one word changed) + an unrelated doc
        f.write(json.dumps({"doc_id": 10, "text": base.replace("dog", "cat")}) + "\n")
        f.write(json.dumps({"doc_id": 11, "text": "nothing like anything else at all in this corpus of text"}) + "\n")
    matches_dir = str(tmp_path / "matches")
    q = stream_dedup(spark, str(feed), index_dir, matches_dir,
                     checkpoint=str(tmp_path / "ckpt3"))
    q.awaitTermination(120)
    got = {(r.new_id, r.corpus_id) for r in spark.read.parquet(matches_dir).collect()}
    assert (10, 1) in got
    assert all(n != 11 for n, _ in got)
    # the streamed docs joined the index: a later near-copy of doc 10 matches it
    with open(feed / "batch2.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 20, "text": base.replace("dog", "cat").replace("today", "tomorrow")}) + "\n")
    q2 = stream_dedup(spark, str(feed), index_dir, matches_dir,
                      checkpoint=str(tmp_path / "ckpt3"))
    q2.awaitTermination(120)
    got2 = {(r.new_id, r.corpus_id) for r in spark.read.parquet(matches_dir).collect()}
    assert (20, 10) in got2


def test_streaming_sessions_close_on_watermark(spark, tmp_path):
    """EventTimeTimeout sessionization: a session emits exactly once, only
    after the watermark passes its last event + gap. Two files -> two
    micro-batches: user 1's early session must close once batch 2's later
    events advance the watermark; the sessions still inside the gap stay
    open (no output row)."""
    from data_pipeline_spark.streaming.stateful import streaming_sessions

    import os

    feed = tmp_path / "sessfeed"
    feed.mkdir()
    # batch 1: user 1 has two events a minute apart at 10:00, plus one at
    # 11:00 — 59 minutes after the previous, so the 30-minute gap rule
    # must SPLIT inside the batch (first session emits immediately)
    with open(feed / "a.jsonl", "w") as f:
        for r in [
            {"user_id": 1, "ts": "2024-01-01T10:00:00"},
            {"user_id": 1, "ts": "2024-01-01T10:01:00"},
            {"user_id": 1, "ts": "2024-01-01T11:00:00"},
        ]:
            f.write(json.dumps(r) + "\n")
    # batch 2: user 2 at 12:00 advances the watermark to 11:50 (past user
    # 1's 10:01 + 30min timeout). batch 3: user 3 at 14:00 triggers the
    # batch in which user 1's timed-out state actually fires.
    with open(feed / "b.jsonl", "w") as f:
        f.write(json.dumps({"user_id": 2, "ts": "2024-01-01T12:00:00"}) + "\n")
    with open(feed / "c.jsonl", "w") as f:
        f.write(json.dumps({"user_id": 3, "ts": "2024-01-01T14:00:00"}) + "\n")
    # the file source orders batches by modification time — pin it
    for i, name in enumerate(["a.jsonl", "b.jsonl", "c.jsonl"]):
        os.utime(feed / name, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = (
        streaming_sessions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    u1 = sorted(
        (str(r.session_start), str(r.session_end), r.n_events)
        for r in rows if r.user_id == 1
    )
    # first session split inside the batch by the 59-minute gap; the tail
    # session (11:00) closed on timeout once the watermark hit 11:50
    assert u1 == [
        ("2024-01-01 10:00:00", "2024-01-01 10:01:00", 2),
        ("2024-01-01 11:00:00", "2024-01-01 11:00:00", 1),
    ]
    # user 3's session cannot have closed: the watermark never passed
    # 14:00 + 30min (no later events arrived)
    assert not [r for r in rows if r.user_id == 3]


def test_streaming_sessions_late_ingap_event_merges(spark, tmp_path):
    """Watermark delay (10m) < gap (30m): a late in-gap event admitted
    after an in-batch gap split must merge the split-closed session with
    its successor, not drag the successor's start backwards into an
    overlapping pair.  Batch 1 splits 10:00 | 10:35; batch 2's late 10:28
    (> watermark 10:25) bridges both intervals; the finalized output is
    ONE session 10:00-10:35 with 3 events — the r07 batch twin's answer
    for the same event multiset."""
    from data_pipeline_spark.streaming.stateful import streaming_sessions

    import os

    feed = tmp_path / "latefeed"
    feed.mkdir()
    with open(feed / "a.jsonl", "w") as f:
        f.write(json.dumps({"user_id": 1, "ts": "2024-01-01T10:00:00"}) + "\n")
        f.write(json.dumps({"user_id": 1, "ts": "2024-01-01T10:35:00"}) + "\n")
    with open(feed / "b.jsonl", "w") as f:  # late, in-gap, above watermark
        f.write(json.dumps({"user_id": 1, "ts": "2024-01-01T10:28:00"}) + "\n")
    with open(feed / "c.jsonl", "w") as f:  # advances watermark to 11:50
        f.write(json.dumps({"user_id": 2, "ts": "2024-01-01T12:00:00"}) + "\n")
    with open(feed / "d.jsonl", "w") as f:  # batch where the timeout fires
        f.write(json.dumps({"user_id": 3, "ts": "2024-01-01T14:00:00"}) + "\n")
    for i, name in enumerate(["a.jsonl", "b.jsonl", "c.jsonl", "d.jsonl"]):
        os.utime(feed / name, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = (
        streaming_sessions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_sessions").collect()
    u1 = sorted(
        (str(r.session_start), str(r.session_end), r.n_events)
        for r in rows if r.user_id == 1
    )
    assert u1 == [("2024-01-01 10:00:00", "2024-01-01 10:35:00", 3)]


def test_kv_store_build_sorted_runs_and_class_index(spark, tmp_path):
    """K7: the distributed parts of the LMDB distribution build — global
    range-sort into disjoint ordered runs (LMDB append=True needs exactly
    this order) and the class index packed in batches of 30 keys — plus
    the gated native writer raising cleanly without the lmdb package."""
    import uuid as _uuid

    import pytest

    from data_pipeline_spark.sinks.kv_store import (
        IDX_BATCH, class_index_batches, kv_records, prepare_kv_dataset,
        write_lmdb_store,
    )

    rows = [
        (f"https://x.test/data/{_uuid.uuid5(_uuid.NAMESPACE_URL, str(i))}",
         "Person" if i % 3 else "Group", '{"id":"r%d"}' % i)
        for i in range(100)
    ]
    merged = spark.createDataFrame(rows, "yuid string, rectype string, data string")
    recs = kv_records(merged)
    out = str(tmp_path / "kvruns")
    prepare_kv_dataset(recs, out, n_shards=5)

    # shards are internally sorted AND range-disjoint in shard-file order:
    # concatenating part files yields one globally sorted key stream
    import glob

    import pyarrow.parquet as pq

    stream = []
    for part in sorted(glob.glob(f"{out}/part-*")):
        keys = pq.read_table(part, columns=["key_hex"]).column(0).to_pylist()
        assert keys == sorted(keys), "run not internally sorted"
        if stream and keys:
            assert stream[-1] <= keys[0], "runs overlap: append order broken"
        stream.extend(keys)
    assert len(stream) == 100 and stream == sorted(stream)

    # class index: batches of <=30 keys packed as BINARY in 16-byte uuid
    # strides (byte-compatible with the reference's make_dataset_lmdb
    # index, which packs uuid.bytes and reads 16-byte strides back)
    idx = class_index_batches(recs).collect()
    person_batches = sorted(
        [r for r in idx if r.cls == "Person"], key=lambda r: r.batch_id
    )
    n_person = sum(1 for _, c, _ in rows if c == "Person")
    assert sum(len(r.packed) // 16 for r in person_batches) == n_person
    person_keys = sorted(k for k, c, _ in (
        (r[0].rsplit("/", 1)[-1].lower(), r[1], r[2]) for r in rows) if c == "Person")
    packed_all = b"".join(bytes(r.packed) for r in person_batches)
    assert packed_all == b"".join(
        bytes.fromhex(k.replace("-", "")) for k in person_keys
    )
    assert all(len(r.packed) <= 16 * IDX_BATCH for r in idx)

    # native writer is environment-gated, never half-writes
    with pytest.raises(NotImplementedError, match="lmdb"):
        write_lmdb_store(out, str(tmp_path / "store.lmdb"))


def test_stream_curation_quality_pii_contamination(spark, tmp_path):
    """Streamed docs get the batch curation checks per micro-batch:
    Gopher verdict, PII scrub, contamination vs a persisted benchmark
    index — one curated row per doc, kept = quality AND clean."""
    from data_pipeline_spark.streaming.curation_stream import (
        index_benchmark,
        stream_curate,
    )

    good = ("the quick brown fox jumps over the lazy dog and then the "
            "patient grey owl watches from a tall oak tree while many "
            "other small animals of the quiet forest come and go in the "
            "long warm afternoon with a calm and steady wind blowing "
            "softly over the hills and valleys of this green land")
    bench_text = ("alpha beta gamma delta epsilon zeta eta theta iota "
                  "kappa lambda mu nu xi")
    bench = spark.createDataFrame(
        [(900, bench_text)], "doc_id bigint, text string"
    )
    index_dir = str(tmp_path / "bench_index")
    index_benchmark(bench, index_dir)

    feed = tmp_path / "curatefeed"
    feed.mkdir()
    with open(feed / "b1.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": good}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "too short"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": good + " mail me at someone@mail.example.org"}) + "\n")
        f.write(json.dumps({"doc_id": 4, "text": good + " " + bench_text}) + "\n")
    out_dir = str(tmp_path / "curated")
    q = stream_curate(spark, str(feed), index_dir, out_dir,
                      checkpoint=str(tmp_path / "ckpt_curate"))
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].kept and rows[1].verdict == "keep"
    assert rows[2].verdict == "drop" and not rows[2].kept
    assert rows[3].n_emails == 1
    assert "someone@mail.example.org" not in rows[3].scrubbed_text
    assert "<EMAIL>" in rows[3].scrubbed_text
    assert rows[4].n_contaminated > 0 and not rows[4].kept
    assert rows[1].n_contaminated == 0


def test_write_training_shards_ordered_layout(spark, tmp_path):
    """Shard directories hold rows in permutation order: reading one
    shard back in file order yields strictly increasing pos."""
    from data_pipeline_spark.queries import QUERIES
    from data_pipeline_spark.sinks.exports import write_training_shards

    curated = QUERIES["d24_corpus_shuffle_shards"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    out = str(tmp_path / "shards")
    write_training_shards(curated, out)
    total = 0
    import glob

    import pyarrow.parquet as pq

    shard_dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(shard_dirs) == 8
    for d in shard_dirs:
        # read physical row order with pyarrow — spark.read.parquet order
        # depends on split-size/partitioning defaults and could interleave
        # at larger fixtures
        poss: list[int] = []
        for f in sorted(glob.glob(d + "/*.parquet")):
            poss += pq.read_table(f, columns=["pos"]).column("pos").to_pylist()
        assert poss == sorted(poss) and poss[0] == 1
        total += len(poss)
    assert total == curated.count()


def test_stream_similarity_against_indexed_corpus(spark, tmp_path):
    """Embedding near-dup matching of streamed vectors against the
    persisted sign-LSH index; later batches see earlier batches'
    vectors (index append).  Same planes as the batch path, so buckets
    cannot drift."""
    from data_pipeline_spark.streaming.similarity_stream import (
        index_corpus,
        stream_similarity,
    )

    a = [1.0] * 64
    b = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]       # cos(a,b)=0
    c = [1.0 if i % 4 < 2 else -1.0 for i in range(64)]        # orth to a,b
    corpus = spark.createDataFrame(
        [(1, a), (2, b)], "id bigint, emb array<double>"
    )
    index_dir = str(tmp_path / "ann_index")
    index_corpus(corpus, index_dir)

    feed = tmp_path / "vecfeed"
    feed.mkdir()
    near_a = [0.5] + a[1:]
    with open(feed / "batch1.jsonl", "w") as f:
        f.write(json.dumps({"vec_id": 10, "embedding": near_a}) + "\n")
        f.write(json.dumps({"vec_id": 11, "embedding": c}) + "\n")
    matches_dir = str(tmp_path / "ann_matches")
    q = stream_similarity(spark, str(feed), index_dir, matches_dir,
                          checkpoint=str(tmp_path / "ckpt_ann"))
    q.awaitTermination(120)
    got = {(r.new_id, r.corpus_id) for r in spark.read.parquet(matches_dir).collect()}
    assert (10, 1) in got
    assert all(n != 11 for n, _ in got)
    # the streamed vectors joined the index: a later near-copy of 10 matches it
    near_a2 = a[:1] + [0.5] + a[2:]
    with open(feed / "batch2.jsonl", "w") as f:
        f.write(json.dumps({"vec_id": 20, "embedding": near_a2}) + "\n")
    q2 = stream_similarity(spark, str(feed), index_dir, matches_dir,
                           checkpoint=str(tmp_path / "ckpt_ann"))
    q2.awaitTermination(120)
    got2 = {(r.new_id, r.corpus_id) for r in spark.read.parquet(matches_dir).collect()}
    assert (20, 10) in got2 and (20, 1) in got2


def test_similarity_batch_fold_idempotent_under_retry(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a micro-batch with the
    same batch key must (a) leave the index without duplicate rows —
    the fold overwrites its own partition — and (b) reproduce the FIRST
    run's matches exactly, because the probe excludes the batch's own
    partial fold (two near-identical vectors in one batch must not
    match each other on the retry)."""
    import os

    import pytest

    from data_pipeline_spark.streaming.similarity_stream import (
        index_corpus,
        match_batch,
    )

    a = [1.0] * 64
    corpus = spark.createDataFrame([(1, a)], "id bigint, emb array<double>")
    index_dir = str(tmp_path / "idx")
    index_corpus(corpus, index_dir)

    # two near-copies of `a` arriving in ONE batch: a clean run matches
    # each to corpus id 1 but never to each other (intra-batch pairs are
    # the NEXT batch's problem once the fold lands)
    batch = spark.createDataFrame(
        [(10, [0.5] + a[1:]), (11, a[:1] + [0.5] + a[2:])],
        "id bigint, emb array<double>",
    )
    m1 = sorted(map(tuple, match_batch(spark, batch, index_dir, batch_key="b0").collect()))
    m2 = sorted(map(tuple, match_batch(spark, batch, index_dir, batch_key="b0").collect()))
    assert m1 == m2
    assert {(n, c) for n, c, _ in m1} == {(10, 1), (11, 1)}

    sigs = spark.read.parquet(os.path.join(index_dir, "sigs"))
    assert sigs.filter("id = 10").count() == 8  # EMB_TABLES rows, not 16
    vecs = spark.read.parquet(os.path.join(index_dir, "vecs"))
    assert vecs.filter("id = 10").count() == 1

    # un-keyed appends are refused outright — they cannot be idempotent
    with pytest.raises(ValueError, match="batch_key"):
        match_batch(spark, batch, index_dir)


def test_stream_index_flat_layout_and_restart_keys(spark, tmp_path):
    """(a) Streaming against a FLAT (pre-batch-keyed) index fails with one
    actionable error instead of an unresolved-column AnalysisException on
    every micro-batch; (b) batch keys are checkpoint-scoped, so a stream
    restarted with a fresh checkpoint (batch ids restart at 0) cannot
    collide with — and silently destroy — an earlier run's batch-0 fold."""
    import pytest

    from data_pipeline_spark.queries.dedup import (
        bands_df, minhash_signatures, shingles_df,
    )
    from data_pipeline_spark.streaming.dedup_stream import match_batch
    from data_pipeline_spark.streaming.index_util import run_batch_key

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "flat_idx")
    sh = shingles_df(docs)
    bands_df(minhash_signatures(sh)).write.parquet(os.path.join(idx, "bands"))
    sh.write.parquet(os.path.join(idx, "shingles"))  # flat: no batch= dirs
    with pytest.raises(ValueError, match="flat"):
        match_batch(spark, docs, idx, batch_key="b0")

    # same checkpoint lineage -> same key (retries/resumes idempotent);
    # different checkpoint -> different key (no cross-run overwrite)
    assert run_batch_key("/tmp/ck1", 0) == run_batch_key("/tmp/ck1", 0)
    assert run_batch_key("/tmp/ck1", 0) != run_batch_key("/tmp/ck2", 0)
    assert run_batch_key("/tmp/ck1", 0) != run_batch_key("/tmp/ck1", 1)
    # keys are non-numeric strings: partition-type inference stays string
    assert not run_batch_key("/tmp/ck1", 3).isdigit()


def test_index_compaction_crash_repair(spark, tmp_path):
    """compact_index stages the folded base and swaps it in behind a
    persisted plan (round 13 — the previous mode('overwrite') had a
    delete-then-write window that could lose the only copy of base).
    Every crash instant is recoverable by repair_index_dir, which the
    streams run at start."""
    import pytest

    from data_pipeline_spark.streaming.index_util import (
        repair_index_dir,
        tier_dir,
    )

    idx = str(tmp_path / "idx")
    spark.createDataFrame([(1,)], "doc_id bigint").write.parquet(
        tier_dir(idx, "fp", "base")
    )
    cdir = os.path.join(idx, "fp", ".compact")
    base = tier_dir(idx, "fp", "base")

    # (a) staging crashed BEFORE the plan: base untouched, staging gone
    os.makedirs(os.path.join(cdir, "next"))
    repair_index_dir(idx)
    assert not os.path.isdir(cdir)
    assert spark.read.parquet(base).count() == 1

    # (b) crash between the renames WITH a plan (the two-syscall window):
    # staged replacement present, old base already trashed — repair must
    # finish the swap
    os.makedirs(cdir)
    spark.createDataFrame([(2,), (3,)], "doc_id bigint").write.parquet(
        os.path.join(cdir, "next")
    )
    with open(os.path.join(cdir, "plan.json"), "w") as f:
        json.dump({"swap": "base"}, f)
    shutil.rmtree(base)
    repair_index_dir(idx)
    assert not os.path.isdir(cdir)
    assert spark.read.parquet(base).count() == 2

    # the dot-dir is invisible to partitioned reads while staged
    os.makedirs(os.path.join(cdir, "next"))
    assert spark.read.parquet(os.path.join(idx, "fp")).count() == 2
    shutil.rmtree(cdir)

    # (c) a plan with neither staged nor applied base raises loudly
    os.makedirs(cdir)
    with open(os.path.join(cdir, "plan.json"), "w") as f:
        json.dump({"swap": "base"}, f)
    shutil.rmtree(base)
    with pytest.raises(RuntimeError, match="unrecoverable"):
        repair_index_dir(idx)


def test_index_compaction_preserves_probes_and_retry(spark, tmp_path):
    """compact_index folds COMMITTED batch partitions into batch=base:
    probe results must be identical before/after (same rows, different
    partition value), an UNCOMMITTED (retryable) batch's partition must
    survive the compaction, and a retry of that live batch across the
    compaction must stay idempotent (own-partition overwrite + own-fold
    probe exclusion)."""
    import json as _json

    from data_pipeline_spark.streaming.dedup_stream import (
        index_corpus,
        match_batch,
        stream_dedup,
    )
    from data_pipeline_spark.streaming.index_util import (
        committed_batch_ids,
        compact_index,
        run_batch_key,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again today "
        "while the patient grey owl watches from a very tall oak tree and "
        "counts every single jump with great care and quiet amusement"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words about spark sql engines here")],
        "doc_id bigint, text string",
    )
    index_dir = str(tmp_path / "lsh_index")
    index_corpus(corpus, index_dir)

    ck = str(tmp_path / "ckpt_compact")
    feed = tmp_path / "feed"
    feed.mkdir()
    matches_dir = str(tmp_path / "matches")
    # two committed micro-batches (one stream run per feed file)
    for i, txt in enumerate(
        [base.replace("dog", "cat"), base.replace("today", "tomorrow")]
    ):
        with open(feed / f"b{i}.jsonl", "w") as f:
            f.write(_json.dumps({"doc_id": 10 + i, "text": txt}) + "\n")
        q = stream_dedup(spark, str(feed), index_dir, matches_dir, checkpoint=ck)
        q.awaitTermination(120)
    assert committed_batch_ids(ck) == {0, 1}

    probe = spark.createDataFrame(
        [(99, base.replace("owl", "hawk"))], "doc_id bigint, text string"
    )
    r_before = sorted(
        map(tuple, match_batch(spark, probe, index_dir, append=False).collect())
    )
    assert {c for _, c, _ in r_before} >= {1, 10}
    # both streamed docs joined the index (band-collision with the probe
    # is probabilistic; index membership is not)
    idx_ids = {
        r.id
        for r in spark.read.parquet(os.path.join(index_dir, "shingles"))
        .select("id").distinct().collect()
    }
    assert idx_ids >= {1, 2, 10, 11}

    # a LIVE (uncommitted) batch folds its partition, then compaction runs
    live_key = run_batch_key(ck, 2)
    live = spark.createDataFrame(
        [(30, base.replace("jump", "hop"))], "doc_id bigint, text string"
    )
    l1 = sorted(map(tuple, match_batch(spark, live, index_dir, batch_key=live_key).collect()))

    folded = compact_index(spark, index_dir, ck)
    assert folded == {"bands": 2, "shingles": 2}
    for tier in ("bands", "shingles"):
        dirs = sorted(os.listdir(os.path.join(index_dir, tier)))
        assert f"batch={live_key}" in dirs           # live batch survives
        assert [d for d in dirs if d.startswith("batch=")] == sorted(
            ["batch=base", f"batch={live_key}"]
        )

    # probe results identical across the compaction (doc 30's live fold
    # is part of the index in both probes)
    r_after = sorted(
        map(tuple, match_batch(spark, probe, index_dir, append=False).collect())
    )
    assert r_after == sorted(
        r_before + [t for t in r_after if t[1] == 30]
    ) or r_after == r_before
    assert [t for t in r_after if t[1] != 30] == r_before

    # retrying the live batch ACROSS the compaction reproduces its first
    # run exactly and leaves no duplicate index rows
    l2 = sorted(map(tuple, match_batch(spark, live, index_dir, batch_key=live_key).collect()))
    assert l2 == l1
    sh = spark.read.parquet(os.path.join(index_dir, "shingles"))
    assert sh.filter("id = 30").select("shingle").distinct().count() == sh.filter("id = 30").count()
    # a second compaction with no newly committed batches is a no-op
    assert compact_index(spark, index_dir, ck) == {"bands": 0, "shingles": 0}


def test_stream_profile_matches_batch_sketch(spark, tmp_path):
    """The streamed HLL profile (per-micro-batch partial registers,
    MAX-merged by the reader) must equal the one-shot batch sketch over
    the same documents BIT-FOR-BIT, stay identical under a duplicate
    fold of a batch (register MAX is idempotent, the strongest retry
    guarantee in the streaming family), and survive committed-batch
    compaction unchanged."""
    from data_pipeline_spark.queries.sketches import (
        cms_cells,
        cms_probe_estimates,
        hist_bins,
        hist_quantiles,
        hll_estimate,
        hll_registers,
    )
    from data_pipeline_spark.streaming.index_util import (
        committed_batch_ids,
        compact_index,
        run_batch_key,
    )
    from data_pipeline_spark.streaming.sketch_stream import (
        fold_batch,
        fold_cms_batch,
        fold_hist_batch,
        profile_corpus,
        read_cms_profile,
        read_hist_profile,
        read_profile,
        stream_profile,
    )

    schema = "doc_id bigint, source string, text string"
    # texts include CMS probe vocabulary ("the", "data", "stream", ...)
    # split across base and feed batches, so the probe-estimate equality
    # below is non-vacuous AND exercises cross-batch summation
    base_rows = [
        (1, "src_a", "alpha beta the data gamma alpha the"),
        (2, "src_b", "delta stream epsilon delta the"),
    ]
    docs0 = spark.createDataFrame(base_rows, schema)
    profile_dir = str(tmp_path / "profile")
    profile_corpus(docs0.select("source", "text"), profile_dir)

    feed = tmp_path / "docfeed"
    feed.mkdir()
    rows1 = [(10, "src_a", "alpha zeta data eta theta"), (11, "src_c", "iota the kappa")]
    rows2 = [(12, "src_b", "lambda mu stream nu xi the omicron pi epsilon")]
    ck = str(tmp_path / "ckpt_prof")
    for i, rows in enumerate([rows1, rows2]):
        with open(feed / f"b{i}.jsonl", "w") as f:
            for d, s, t in rows:
                f.write(json.dumps({"doc_id": d, "source": s, "text": t}) + "\n")
        q = stream_profile(spark, str(feed), profile_dir, checkpoint=ck)
        q.awaitTermination(120)

    everything = spark.createDataFrame(
        base_rows + rows1 + rows2, schema
    ).select("source", "text")
    want = sorted(map(tuple, hll_estimate(hll_registers(everything)).collect()))
    got = sorted(map(tuple, read_profile(spark, profile_dir).collect()))
    assert got == want
    assert {s for s, *_ in got} == {"src_a", "src_b", "src_c", "__all__"}
    # the CMS tier folded in the same pass: the streamed frequency
    # profile must equal the one-shot batch sketch (CMS is LINEAR — the
    # SUM-merge of per-batch cells is exact, not approximate)
    want_cms = sorted(
        map(tuple, cms_probe_estimates(spark, cms_cells(everything)).collect())
    )
    got_cms = sorted(map(tuple, read_cms_profile(spark, profile_dir).collect()))
    assert got_cms == want_cms
    # the histogram tier folded in the same pass (bins SUM — linear)
    want_hist = sorted(
        map(tuple, hist_quantiles(spark, hist_bins(everything)).collect())
    )
    got_hist = sorted(map(tuple, read_hist_profile(spark, profile_dir).collect()))
    assert got_hist == want_hist

    # a RETRIED fold of micro-batch 0 (same checkpoint-scoped key)
    # overwrites its own partition; the merged profiles cannot move —
    # for CMS this is THE at-least-once guarantee (SUM is not
    # idempotent; only the overwrite layout prevents double-counting)
    b0 = spark.createDataFrame(rows1, schema)
    fold_batch(b0.select("source", "text"), profile_dir, run_batch_key(ck, 0))
    fold_cms_batch(b0.select("source", "text"), profile_dir, run_batch_key(ck, 0))
    fold_hist_batch(b0.select("source", "text"), profile_dir, run_batch_key(ck, 0))
    assert sorted(map(tuple, read_profile(spark, profile_dir).collect())) == want
    assert sorted(map(tuple, read_cms_profile(spark, profile_dir).collect())) == want_cms
    assert sorted(map(tuple, read_hist_profile(spark, profile_dir).collect())) == want_hist

    # committed-batch compaction folds both batches into base in ALL
    # tiers; the profiles are unchanged and the batch directories gone
    assert committed_batch_ids(ck) == {0, 1}
    assert compact_index(spark, profile_dir, ck) == {"bins": 2, "cells": 2, "regs": 2}
    assert sorted(map(tuple, read_profile(spark, profile_dir).collect())) == want
    assert sorted(map(tuple, read_cms_profile(spark, profile_dir).collect())) == want_cms
    assert sorted(map(tuple, read_hist_profile(spark, profile_dir).collect())) == want_hist
    assert os.listdir(os.path.join(profile_dir, "regs")) == ["batch=base"]
    assert os.listdir(os.path.join(profile_dir, "cells")) == ["batch=base"]
    assert os.listdir(os.path.join(profile_dir, "bins")) == ["batch=base"]


def test_refresh_index_append_closes_the_loop(spark, tmp_path):
    """The d48 refresh operator's full production cycle: crawl 0 runs
    against EMPTY indexes, its admitted documents' fingerprints append
    to the stored fp/simhash indexes, and crawl 1 — containing an exact
    copy, a word-permutation near-dup, novel docs and an in-batch dup —
    must classify every document against what crawl 0 admitted.  This
    pins the sink side of the refresh (the indexes a crawl writes are
    the indexes the next crawl reads), not just the verdict logic."""
    from pyspark.sql import functions as F

    from data_pipeline_spark.queries.dedup import (
        _D48_W,
        _D48_W_REV,
        refresh_features,
        refresh_verdicts,
    )

    words = lambda p: " ".join(f"{p}{i:02d}" for i in range(22))
    text_b, text_c, text_d = words("ridge"), words("creek"), words("bluff")
    d_perm = " ".join(reversed(text_d.split()))

    schema = "doc_id bigint, text string"
    crawl0 = spark.createDataFrame(
        [(1, _D48_W), (2, text_b), (3, "too short")], schema
    )
    empty_fp = spark.createDataFrame([], "fp string")
    empty_sim = spark.createDataFrame([], "simhash bigint")
    feats0 = refresh_features(crawl0)
    v0 = {r.doc_id: r.reason for r in refresh_verdicts(feats0, empty_fp, empty_sim).collect()}
    assert v0 == {1: "admitted", 2: "admitted", 3: "low_quality"}

    # the sink side: admitted docs' fingerprints become the stored indexes
    base = str(tmp_path / "idx")
    admitted0 = feats0.filter(F.col("doc_id").isin(1, 2))
    admitted0.select("fp").write.mode("append").parquet(f"{base}/fp")
    admitted0.select("simhash").write.mode("append").parquet(f"{base}/sim")

    crawl1 = spark.createDataFrame(
        [
            (10, _D48_W),      # exact copy of crawl-0 doc 1
            (11, _D48_W_REV),  # word-permutation of doc 1 (same simhash)
            (12, text_c),      # novel
            (13, text_c),      # exact dup of 12 within the batch
            (14, text_d),      # novel
            (15, d_perm),      # permutation of 14 (same simhash, new fp)
        ],
        schema,
    )
    v1 = {
        r.doc_id: r.reason
        for r in refresh_verdicts(
            refresh_features(crawl1),
            spark.read.parquet(f"{base}/fp"),
            spark.read.parquet(f"{base}/sim"),
        ).collect()
    }
    assert v1 == {
        10: "in_prev_build",
        11: "near_dup_prev",
        12: "admitted",
        13: "dup_in_batch",
        14: "admitted",
        15: "near_dup_batch",
    }


def test_stream_refresh_matches_batch_and_is_retry_idempotent(spark, tmp_path):
    """The streamed refresh must (a) judge each crawl exactly as the
    batch operator does against the same indexes, (b) admit across
    crawls transitively (crawl 2 rejects dups of crawl 1's admissions),
    (c) reproduce a crawl's verdicts exactly on a RETRY (own-batch index
    exclusion — without it the retry would see its first attempt's fold
    and reject everything as in_prev_build), and (d) survive
    committed-batch compaction."""
    from data_pipeline_spark.queries.dedup import _D48_W, _D48_W_REV
    from data_pipeline_spark.streaming.index_util import (
        committed_batch_ids,
        compact_index,
        run_batch_key,
    )
    from data_pipeline_spark.streaming.refresh_stream import (
        index_corpus,
        refresh_batch,
        stream_refresh,
    )

    words = lambda p: " ".join(f"{p}{i:02d}" for i in range(22))
    text_b, text_c = words("mesa"), words("fjord")

    schema = "doc_id bigint, text string"
    base = spark.createDataFrame([(1, _D48_W), (2, text_b)], schema)
    index_dir = str(tmp_path / "ridx")
    index_corpus(base, index_dir)

    feed = tmp_path / "crawlfeed"
    feed.mkdir()
    crawl1 = [(10, _D48_W), (11, _D48_W_REV), (12, text_c), (13, "too short")]
    crawl2 = [(20, text_c), (21, words("atoll"))]
    ck = str(tmp_path / "ckpt_refresh")
    verd_dir = str(tmp_path / "verdicts")
    for i, rows in enumerate([crawl1, crawl2]):
        with open(feed / f"c{i}.jsonl", "w") as f:
            for d, t in rows:
                f.write(json.dumps({"doc_id": d, "text": t}) + "\n")
        q = stream_refresh(spark, str(feed), index_dir, verd_dir, checkpoint=ck)
        q.awaitTermination(120)

    got = {
        r.doc_id: r.reason
        for r in spark.read.parquet(verd_dir).collect()
    }
    assert got == {
        10: "in_prev_build",   # exact copy of base doc 1
        11: "near_dup_prev",   # permutation of base doc 1
        12: "admitted",
        13: "low_quality",
        20: "in_prev_build",   # exact copy of crawl-1's ADMITTED doc 12
        21: "admitted",
    }

    # a RETRIED crawl 0 (same checkpoint-scoped key) must reproduce its
    # original verdicts — its own fold is excluded from the read — and
    # overwrite rather than duplicate its index partitions
    b0 = spark.createDataFrame(crawl1, schema)
    retry = refresh_batch(
        spark, b0, index_dir, batch_key=run_batch_key(ck, 0)
    )
    assert {r.doc_id: r.reason for r in retry.collect()} == {
        10: "in_prev_build", 11: "near_dup_prev", 12: "admitted", 13: "low_quality"
    }

    # compaction folds the committed crawls into base; a fresh judgment
    # of the same crawl-2 documents (no append) is unchanged
    assert committed_batch_ids(ck) == {0, 1}
    assert compact_index(spark, index_dir, ck) == {"fp": 2, "sim": 2}
    again = refresh_batch(
        spark, spark.createDataFrame(crawl2, schema), index_dir, append=False
    )
    assert {r.doc_id: r.reason for r in again.collect()} == {
        20: "in_prev_build", 21: "in_prev_build"  # 21 was admitted+folded
    }


@pytest.mark.slow  # full-coverage tier (r16 split): fast siblings cover the surface
def test_stream_entity_builds_crawl_sequence(spark, tmp_path):
    """The entity-chain streaming twin (streaming/entity_stream.py): two
    crawl files -> two micro-batch incremental builds over versioned
    state; the final streamed merged tier must equal a FULL rebuild over
    the final records tier (the same gold check the batch incremental
    test pins), so the streaming sequencing adds nothing to semantics."""
    from pyspark.sql import functions as F

    from data_pipeline_spark.pipeline.build import run_build
    from data_pipeline_spark.streaming.entity_stream import (
        init_state,
        latest_state,
        read_base_tier,
        stream_entity_builds,
    )

    def uri(src, k):
        return f"https://fixture.test/{src}/{k}"

    def doc(src, k, label, link=None):
        d = {"id": uri(src, k), "type": "Person", "_label": label}
        if link:
            d["equivalent"] = [{"id": link, "type": "Person"}]
        return json.dumps(d)

    rows = []
    for k in range(20):
        rows.append(("srcA", str(k), "Person", "2026-01-01T00:00:00", "create",
                     doc("srcA", k, f"A{k}", uri("srcB", k))))
        rows.append(("srcB", str(k), "Person", "2026-01-01T00:00:00", "create",
                     doc("srcB", k, f"B{k}")))
    records = spark.createDataFrame(
        rows,
        "source string, identifier string, rectype string, record_time string, change string, data string",
    )
    e = spark.createDataFrame
    indexes = {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }
    order = {"srcA": 0, "srcB": 1, "srcN": 2}
    state_dir = str(tmp_path / "state")
    init_state(spark, records, indexes, state_dir, merge_order=order)

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    crawl1 = [
        {"seq": 1, "end_time": "2026-02-01T10:00:00", "change": "update",
         "object_uri": uri("srcA", 3),
         "payload": doc("srcA", 3, "A3-updated", uri("srcB", 3))},
        {"seq": 2, "end_time": "2026-02-01T10:00:00", "change": "delete",
         "object_uri": uri("srcA", 5), "payload": None},
    ]
    crawl2 = [
        {"seq": 3, "end_time": "2026-02-02T10:00:00", "change": "create",
         "object_uri": uri("srcN", 7),
         "payload": doc("srcN", 7, "N7", uri("srcA", 7))},
        # second-crawl update of the SAME record crawl 1 touched: state
        # versioning must chain, not reset
        {"seq": 4, "end_time": "2026-02-02T10:00:00", "change": "update",
         "object_uri": uri("srcA", 3),
         "payload": doc("srcA", 3, "A3-final", uri("srcB", 3))},
    ]
    for i, crawl in enumerate((crawl1, crawl2)):
        with open(feed_dir / f"crawl{i}.jsonl", "w") as f:
            for r in crawl:
                f.write(json.dumps(r) + "\n")

    ckpt = str(tmp_path / "ckpt")
    q = stream_entity_builds(spark, str(feed_dir), state_dir, ckpt, indexes, order)
    q.awaitTermination(180)

    final = latest_state(spark, state_dir, ckpt)
    # gold carries the BASE idmap as its stability input: the streamed
    # chain keeps prev yuids across crawls (e.g. B5 keeps the pair's
    # yuid after srcA/5's delete), so the equivalent batch rebuild must
    # get the same lineage — without it the gold would re-mint B5
    base_idmap = read_base_tier(spark, state_dir, "idmap")
    gold = run_build(
        spark, final["records"], indexes, idmap_prev=base_idmap, merge_order=order
    )
    got = {
        (r["yuid"], r["data"]) for r in final["merged"].collect()
    }
    want = {(r["yuid"], r["data"]) for r in gold["merged"].collect()}
    assert got == want
    labels = {
        json.loads(d)["_label"] for (_, d) in got
    }
    assert "A3-final" in labels           # crawl-2 update landed on crawl-1 state
    assert "A3-updated" not in labels
    assert "B5" in labels                 # srcA/5 deleted -> srcB/5 now the base
    n7 = [json.loads(d) for (_, d) in got if json.loads(d)["_label"] == "A7"]
    assert len(n7) == 1                   # srcN/7 folded INTO A7's entity
    assert final["idmap"].filter(F.col("qua_uri") == uri("srcN", 7)).count() == 1

    # state compaction: BOTH committed crawl deltas fold into a new base
    # (delta layout, round 12) and their d= dirs vanish; only v=base
    # survives, and the folded state still reads identically
    from data_pipeline_spark.streaming.entity_stream import compact_entity_state

    removed = compact_entity_state(spark, state_dir, ckpt)
    assert removed == {"records": 2, "idmap": 2, "merged": 2}
    kept = sorted(os.listdir(os.path.join(state_dir, "merged")))
    assert kept == ["v=base"]
    assert sorted(os.listdir(os.path.join(state_dir, "touched"))) == []
    again = latest_state(spark, state_dir, ckpt)
    assert {(r["yuid"], r["data"]) for r in again["merged"].collect()} == got
    # idempotent: nothing further to fold
    assert compact_entity_state(spark, state_dir, ckpt) == {
        "records": 0, "idmap": 0, "merged": 0
    }


def test_entity_build_batch_retry_idempotent(spark, tmp_path):
    """A retried crawl (same batch id, same commit log) must reproduce
    its first attempt exactly: the per-delta-dir overwrite plus the
    commit-gated fold read are the whole at-least-once story for the
    entity stream (mirrors the refresh stream's retry contract)."""
    from data_pipeline_spark.streaming.entity_stream import (
        entity_build_batch,
        init_state,
    )
    from data_pipeline_spark.streaming.index_util import run_batch_key

    def doc(src, k, label, link=None):
        d = {"id": f"https://fixture.test/{src}/{k}", "type": "Person", "_label": label}
        if link:
            d["equivalent"] = [{"id": link, "type": "Person"}]
        return json.dumps(d)

    rows = [
        ("srcA", str(k), "Person", "2026-01-01T00:00:00", "create",
         doc("srcA", k, f"A{k}"))
        for k in range(8)
    ]
    records = spark.createDataFrame(
        rows,
        "source string, identifier string, rectype string, record_time string, change string, data string",
    )
    e = spark.createDataFrame
    indexes = {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }
    state_dir = str(tmp_path / "state")
    init_state(spark, records, indexes, state_dir)

    changes = e(
        [(1, "2026-02-01 00:00:00", "update", "https://fixture.test/srcA/3",
          doc("srcA", 3, "A3-v2"))],
        "seq bigint, end_time string, change string, object_uri string, payload string",
    ).withColumn("end_time", F.col("end_time").cast("timestamp"))

    ckpt = str(tmp_path / "ckpt")  # no commit log: batch 1 folds base only
    key = run_batch_key(ckpt, 1)

    def snapshot():
        out = {
            tier: sorted(map(tuple, spark.read.parquet(
                f"{state_dir}/{tier}/d={key}").collect()))
            for tier in ("records", "idmap", "merged")
        }
        out["touched"] = sorted(map(tuple, spark.read.parquet(
            f"{state_dir}/touched/d={key}").collect()))
        return out

    entity_build_batch(spark, changes, state_dir, indexes,
                       checkpoint=ckpt, batch_id=1)
    first = snapshot()
    # retry: same batch id, same (empty) commit log — the per-delta-dir
    # overwrite must reproduce the first attempt bit for bit
    entity_build_batch(spark, changes, state_dir, indexes,
                       checkpoint=ckpt, batch_id=1)
    assert snapshot() == first
    labels = {json.loads(r[2])["_label"] if len(r) == 3 else None
              for r in first["merged"]}
    assert "A3-v2" in labels
    # the delta is blast-radius-sized: ONLY srcA/3's rows, not the tier
    assert len(first["records"]) == 1
    assert ("records", "https://fixture.test/srcA/3") in first["touched"]


def test_entity_stream_crash_restart_recovers_from_checkpoint(spark, tmp_path):
    """Process-death drill (VERDICT r10 #4): the in-process retry tests
    cover replayed foreachBatch calls, but a real deployment dies BETWEEN
    micro-batches — after batch N's data writes, before its checkpoint
    commit — and restarts as a NEW query from the same checkpoint dir.
    The reference survives this via Postgres transactionality
    (update_manager.py); the Spark twin must prove the same via the
    checkpoint + versioned-state layout:

    crash injection: batch 1's first attempt POISONS its own version
    directory (a partial records write) and raises before building —
    exactly a mid-write death.  The restarted query must replay batch 1
    from its planned offsets, resolve its source state from the COMMIT
    log (batch 0's version, never the poisoned partial), overwrite the
    poison, and land the same final state as an uninterrupted run."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from data_pipeline_spark.pipeline.build import run_build
    from data_pipeline_spark.streaming.entity_stream import (
        CHANGES_SCHEMA,
        entity_build_batch,
        init_state,
        latest_state,
        read_base_tier,
        stream_entity_builds,
    )
    from data_pipeline_spark.streaming.index_util import (
        committed_batch_ids,
        run_batch_key,
    )

    def uri(src, k):
        return f"https://fixture.test/{src}/{k}"

    def doc(src, k, label, link=None):
        d = {"id": uri(src, k), "type": "Person", "_label": label}
        if link:
            d["equivalent"] = [{"id": link, "type": "Person"}]
        return json.dumps(d)

    rows = []
    for k in range(12):
        rows.append(("srcA", str(k), "Person", "2026-01-01T00:00:00", "create",
                     doc("srcA", k, f"A{k}", uri("srcB", k))))
        rows.append(("srcB", str(k), "Person", "2026-01-01T00:00:00", "create",
                     doc("srcB", k, f"B{k}")))
    records = spark.createDataFrame(
        rows,
        "source string, identifier string, rectype string, record_time string, change string, data string",
    )
    e = spark.createDataFrame
    indexes = {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }
    order = {"srcA": 0, "srcB": 1}
    state_dir = str(tmp_path / "state")
    init_state(spark, records, indexes, state_dir, merge_order=order)

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    crawls = [
        [{"seq": 1, "end_time": "2026-02-01T10:00:00", "change": "update",
          "object_uri": uri("srcA", 3),
          "payload": doc("srcA", 3, "A3-c1", uri("srcB", 3))}],
        [{"seq": 2, "end_time": "2026-02-02T10:00:00", "change": "update",
          "object_uri": uri("srcA", 4),
          "payload": doc("srcA", 4, "A4-c2", uri("srcB", 4))},
         {"seq": 3, "end_time": "2026-02-02T10:00:00", "change": "delete",
          "object_uri": uri("srcB", 9), "payload": None}],
    ]
    now = time.time()
    for i, crawl in enumerate(crawls):
        p = feed_dir / f"crawl{i}.jsonl"
        with open(p, "w") as f:
            for r in crawl:
                f.write(json.dumps(r) + "\n")
        # FileStreamSource orders micro-batches by mtime — pin distinct
        # mtimes so crawl0 is batch 0 regardless of write-timing ties
        os.utime(p, (now + i, now + i))

    ckpt = str(tmp_path / "ckpt")
    crash = {"armed": True}

    def crashing_sink(batch, batch_id):
        key = run_batch_key(ckpt, batch_id)
        if batch_id == 1 and crash["armed"]:
            crash["armed"] = False
            # mid-write death: a partial, WRONG delta (empty rows AND a
            # poisoned touched manifest claiming an unrelated uri was
            # deleted) under the batch's own key, then the process "dies".
            # Commit-gating must keep this invisible to the retry's fold.
            batch.limit(0).write.mode("overwrite").parquet(
                f"{state_dir}/records/d={key}"
            )
            spark.createDataFrame(
                [("records", uri("srcB", 2))], "tier string, k string"
            ).write.mode("overwrite").parquet(f"{state_dir}/touched/d={key}")
            raise RuntimeError("injected process death between batches")
        entity_build_batch(
            spark, batch, state_dir, indexes,
            checkpoint=ckpt, batch_id=batch_id,
            merge_order=order,
        )

    feed = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed_dir))
    )
    q = (
        feed.writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(180)
    assert committed_batch_ids(ckpt) == {0}  # batch 1 died uncommitted

    # restart: the REAL production entry point, same checkpoint dir
    q2 = stream_entity_builds(
        spark, str(feed_dir), state_dir, ckpt, indexes, order
    )
    q2.awaitTermination(180)
    assert committed_batch_ids(ckpt) == {0, 1}

    final = latest_state(spark, state_dir, ckpt)
    base_idmap = read_base_tier(spark, state_dir, "idmap")
    gold = run_build(
        spark, final["records"], indexes, idmap_prev=base_idmap, merge_order=order
    )
    got = {(r["yuid"], r["data"]) for r in final["merged"].collect()}
    want = {(r["yuid"], r["data"]) for r in gold["merged"].collect()}
    assert got == want
    labels = {json.loads(d)["_label"] for (_, d) in got}
    assert {"A3-c1", "A4-c2"} <= labels   # both crawls landed
    assert "A9" in labels and not any(
        json.loads(d)["_label"] == "B9" and "srcB/9" in d for (_, d) in got
    )  # the crash-batch delete applied on replay


def test_refresh_stream_crash_restart_recovers_from_checkpoint(spark, tmp_path):
    """Same process-death drill for the refresh stream: batch 1 folds its
    admitted fingerprints into the index (a REAL partial fold, not a
    poison) and then dies before commit.  The restarted query must judge
    the replayed crawl identically — the own-batch index exclusion is
    what makes the retry blind to the dead attempt's fold — and the
    final verdicts must equal the uninterrupted run's."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from data_pipeline_spark.queries.dedup import _D48_W
    from data_pipeline_spark.streaming.index_util import (
        committed_batch_ids,
        run_batch_key,
    )
    from data_pipeline_spark.streaming.refresh_stream import (
        index_corpus,
        refresh_batch,
        stream_refresh,
    )

    words = lambda p: " ".join(f"{p}{i:02d}" for i in range(22))
    base = spark.createDataFrame([(1, _D48_W)], "doc_id bigint, text string")
    index_dir = str(tmp_path / "ridx")
    index_corpus(base, index_dir)

    feed = tmp_path / "crawlfeed"
    feed.mkdir()
    crawls = [
        [(10, words("mesa")), (11, _D48_W)],
        [(20, words("mesa")), (21, words("atoll"))],  # 20 dups crawl-1's admit
    ]
    now = time.time()
    for i, rows in enumerate(crawls):
        p = feed / f"c{i}.jsonl"
        with open(p, "w") as f:
            for d, t in rows:
                f.write(json.dumps({"doc_id": d, "text": t}) + "\n")
        # pin distinct mtimes: crawl order == batch order (see entity drill)
        os.utime(p, (now + i, now + i))

    ck = str(tmp_path / "ckpt_refresh")
    verd_dir = str(tmp_path / "verdicts")
    crash = {"armed": True}

    def crashing_sink(batch, batch_id):
        key = run_batch_key(ck, batch_id)
        out = refresh_batch(spark, batch, index_dir, batch_key=key)
        if batch_id == 1 and crash["armed"]:
            crash["armed"] = False
            # die AFTER the index fold + verdict compute, BEFORE the
            # verdicts write and the checkpoint commit
            raise RuntimeError("injected process death between batches")
        out.withColumn("micro_batch_id", F.lit(batch_id).cast("bigint")).write.mode(
            "overwrite"
        ).parquet(os.path.join(verd_dir, f"batch_id={key}"))

    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
        .writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    assert committed_batch_ids(ck) == {0}

    # restart with the REAL production entry point (one file per batch is
    # the default availableNow replan here: batch 1's offsets are already
    # planned in the checkpoint, so the restarted query replays it as-is)
    q2 = stream_refresh(spark, str(feed), index_dir, verd_dir, checkpoint=ck)
    q2.awaitTermination(120)
    assert committed_batch_ids(ck) == {0, 1}

    got = {r.doc_id: r.reason for r in spark.read.parquet(verd_dir).collect()}
    assert got == {
        10: "admitted",
        11: "in_prev_build",
        20: "in_prev_build",  # dup of crawl-1's admission — across the crash
        21: "admitted",
    }


def test_stream_entity_builds_enforces_last_harvest(spark, tmp_path):
    """The R1 watermark must hold in the STREAMING entity twin exactly as
    in the batch incremental path (ADVICE r10: stream_entity_builds
    silently dropped it): a crawl file mixing one stale row (at/before
    last_harvest) with one fresh row applies only the fresh one."""
    from data_pipeline_spark.streaming.entity_stream import (
        init_state,
        latest_state,
        stream_entity_builds,
    )

    def doc(src, k, label):
        return json.dumps(
            {"id": f"https://fixture.test/{src}/{k}", "type": "Person",
             "_label": label}
        )

    rows = [
        ("srcA", str(k), "Person", "2026-01-01T00:00:00", "create",
         doc("srcA", k, f"A{k}"))
        for k in range(6)
    ]
    records = spark.createDataFrame(
        rows,
        "source string, identifier string, rectype string, record_time string, change string, data string",
    )
    e = spark.createDataFrame
    indexes = {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }
    state_dir = str(tmp_path / "state")
    init_state(spark, records, indexes, state_dir)

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    crawl = [
        # stale: at the watermark — must be ignored
        {"seq": 1, "end_time": "2026-01-15T00:00:00", "change": "update",
         "object_uri": "https://fixture.test/srcA/2",
         "payload": doc("srcA", 2, "A2-stale")},
        # fresh: after the watermark — must land
        {"seq": 2, "end_time": "2026-02-01T00:00:00", "change": "update",
         "object_uri": "https://fixture.test/srcA/3",
         "payload": doc("srcA", 3, "A3-fresh")},
    ]
    with open(feed_dir / "crawl0.jsonl", "w") as f:
        for r in crawl:
            f.write(json.dumps(r) + "\n")

    ckpt = str(tmp_path / "ckpt")
    q = stream_entity_builds(
        spark, str(feed_dir), state_dir, ckpt, indexes,
        last_harvest="2026-01-15T00:00:00",
    )
    q.awaitTermination(120)

    final = latest_state(spark, state_dir, ckpt)
    labels = {json.loads(r["data"])["_label"] for r in final["merged"].collect()}
    assert "A3-fresh" in labels
    assert "A2-stale" not in labels and "A2" in labels


def test_entity_stream_empty_crawl_folds_to_identity(spark, tmp_path):
    """An all-stale crawl (every row at/before last_harvest) still
    commits a micro-batch, so the delta layout must handle a COMMITTED
    EMPTY delta: zero-row tier dirs + a zero-row touched manifest fold
    to the identity — latest_state equals base row for row, and the
    empty delta compacts away cleanly."""
    from data_pipeline_spark.streaming.entity_stream import (
        compact_entity_state,
        init_state,
        latest_state,
        read_base_tier,
        stream_entity_builds,
    )
    from data_pipeline_spark.streaming.index_util import committed_batch_ids

    def doc(src, k, label):
        return json.dumps(
            {"id": f"https://fixture.test/{src}/{k}", "type": "Person",
             "_label": label}
        )

    records = spark.createDataFrame(
        [("srcA", str(k), "Person", "2026-01-01T00:00:00", "create",
          doc("srcA", k, f"A{k}")) for k in range(5)],
        "source string, identifier string, rectype string, record_time string, change string, data string",
    )
    e = spark.createDataFrame
    indexes = {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }
    state_dir = str(tmp_path / "state")
    init_state(spark, records, indexes, state_dir)
    base = sorted(
        (r["yuid"], r["data"])
        for r in read_base_tier(spark, state_dir, "merged").collect()
    )

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    with open(feed_dir / "crawl0.jsonl", "w") as f:
        f.write(json.dumps(
            {"seq": 1, "end_time": "2026-01-10T00:00:00", "change": "update",
             "object_uri": "https://fixture.test/srcA/2",
             "payload": doc("srcA", 2, "A2-stale")}) + "\n")

    ckpt = str(tmp_path / "ckpt")
    q = stream_entity_builds(
        spark, str(feed_dir), state_dir, ckpt, indexes,
        last_harvest="2026-01-15T00:00:00",
    )
    q.awaitTermination(120)
    assert committed_batch_ids(ckpt) == {0}

    final = latest_state(spark, state_dir, ckpt)
    got = sorted((r["yuid"], r["data"]) for r in final["merged"].collect())
    assert got == base
    # the committed empty delta compacts away like any other
    removed = compact_entity_state(spark, state_dir, ckpt)
    assert removed == {"records": 1, "idmap": 1, "merged": 1}
    again = latest_state(spark, state_dir, ckpt)
    assert sorted((r["yuid"], r["data"]) for r in again["merged"].collect()) == base


@pytest.mark.slow  # full-coverage tier (r16 split): fast siblings cover the surface
def test_entity_stream_compact_every_bounds_delta_fanin(spark, tmp_path):
    """compact_every=2: the batch-2 sink folds batches 0-1 into base
    BEFORE building, so after draining three crawls only batch 2's
    delta remains — and the final state equals the same stream run
    without mid-stream compaction (the fold is cadence-invariant)."""
    from data_pipeline_spark.streaming.entity_stream import (
        init_state,
        latest_state,
        stream_entity_builds,
    )
    from data_pipeline_spark.streaming.index_util import run_batch_key

    def doc(k, label):
        return json.dumps(
            {"id": f"https://fixture.test/srcA/{k}", "type": "Person",
             "_label": label}
        )

    records = spark.createDataFrame(
        [("srcA", str(k), "Person", "2026-01-01T00:00:00", "create",
          doc(k, f"A{k}")) for k in range(6)],
        "source string, identifier string, rectype string, record_time string, change string, data string",
    )
    e = spark.createDataFrame
    indexes = {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }

    def crawl_files(feed_dir):
        now = time.time()
        for i in range(3):
            p = feed_dir / f"c{i}.jsonl"
            with open(p, "w") as f:
                f.write(json.dumps(
                    {"seq": i, "end_time": f"2026-02-0{i+1}T00:00:00",
                     "change": "update",
                     "object_uri": f"https://fixture.test/srcA/{i}",
                     "payload": doc(i, f"A{i}-c{i}")}) + "\n")
            os.utime(p, (now + i, now + i))

    def run(tag, compact_every):
        state = str(tmp_path / f"state{tag}")
        feed = tmp_path / f"feed{tag}"
        feed.mkdir()
        ckpt = str(tmp_path / f"ck{tag}")
        init_state(spark, records, indexes, state)
        crawl_files(feed)
        q = stream_entity_builds(
            spark, str(feed), state, ckpt, indexes,
            compact_every=compact_every,
        )
        q.awaitTermination(180)
        merged = latest_state(spark, state, ckpt)["merged"]
        labels = sorted(json.loads(r["data"])["_label"] for r in merged.collect())
        return state, ckpt, labels

    state_a, ckpt_a, labels_a = run("a", 2)
    _, _, labels_b = run("b", None)
    assert labels_a == labels_b
    assert {"A0-c0", "A1-c1", "A2-c2"} <= set(labels_a)
    # batches 0-1 folded by the batch-2 sink; only batch 2's delta left
    kept = sorted(os.listdir(os.path.join(state_a, "merged")))
    assert kept == sorted(["v=base", f"d={run_batch_key(ckpt_a, 2)}"])


def test_entity_state_read_requires_init(spark, tmp_path):
    """Reading an uninitialized state dir fails with an actionable
    init_state message, not a cryptic parquet PATH_NOT_FOUND."""
    import pytest as _pytest

    from data_pipeline_spark.streaming.entity_stream import latest_state

    with _pytest.raises(FileNotFoundError, match="init_state"):
        latest_state(spark, str(tmp_path / "nostate"), str(tmp_path / "ck"))
