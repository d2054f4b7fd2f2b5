"""Bucketed entity-state base + partial compaction (round 13).

The state base is hash-bucketed on the fold key (``v=base/b=<n>``, the
Hudi-MOR file-group shape) so compact_entity_state rewrites ONLY the
buckets holding touched keys — cost ∝ delta, not corpus.  Bucket
replacement is staged to a dot-dir and applied by atomic per-bucket
renames behind a persisted plan; ``_repair_tier`` resumes or rolls back
an interrupted compaction on every base read (closes the ADVICE r12
non-atomic whole-base overwrite window).

Reference parity: the reference's update manager applies per-record row
updates transactionally (/root/reference pipeline/process/
update_manager.py:12-69); these tests pin the lakehouse restatement —
bounded-write compaction with no crash instant that loses state.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.streaming.entity_stream import (
    compact_entity_state,
    init_state,
    latest_state,
    read_base_tier,
    read_state_meta,
    stream_entity_builds,
)


def _uri(src, k):
    return f"https://fixture.test/{src}/{k}"


def _doc(src, k, label, link=None):
    d = {"id": _uri(src, k), "type": "Person", "_label": label}
    if link:
        d["equivalent"] = [{"id": link, "type": "Person"}]
    return json.dumps(d)


def _records(spark, n=10):
    rows = [
        ("srcA", str(k), "Person", "2026-01-01T00:00:00", "create",
         _doc("srcA", k, f"A{k}"))
        for k in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "source string, identifier string, rectype string, "
        "record_time string, change string, data string",
    )


def _indexes(spark):
    e = spark.createDataFrame
    return {
        "name_index": e([], "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": e([], "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": e([], "uri_a string, uri_b string"),
        "different_from": e([], "uri_a string, uri_b string"),
    }


def _feed(tmp_path, crawls):
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir(exist_ok=True)
    for i, crawl in enumerate(crawls):
        p = feed_dir / f"crawl{i}.jsonl"
        with open(p, "w") as f:
            for r in crawl:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (1000 + i, 1000 + i))  # pin micro-batch order
    return str(feed_dir)


def _bucket_files(state_dir, tier):
    """{bucket dir name: {(file, mtime_ns)}} under <tier>/v=base."""
    bdir = os.path.join(state_dir, tier, "v=base")
    out = {}
    for d in os.listdir(bdir):
        if not d.startswith("b="):
            continue
        full = os.path.join(bdir, d)
        out[d] = {
            (f, os.stat(os.path.join(full, f)).st_mtime_ns)
            for f in os.listdir(full)
            if not f.startswith(("_", "."))
        }
    return out


def test_bucketed_base_partial_compaction(spark, tmp_path):
    """init writes a bucketed base + meta; compaction rewrites ONLY the
    buckets holding touched keys — every untouched bucket's files are
    bit-for-bit untouched (same names, same mtimes), which is the whole
    claim: compaction cost scales with the delta, not the corpus."""
    state_dir = str(tmp_path / "state")
    init_state(spark, _records(spark, 12), _indexes(spark), state_dir,
               buckets=16)

    assert read_state_meta(state_dir) == {"layout": "bucketed", "buckets": 16}
    for tier in ("records", "idmap", "merged"):
        base = read_base_tier(spark, state_dir, tier)
        assert "b" not in base.columns  # internal col never leaks
        assert any(
            d.startswith("b=")
            for d in os.listdir(os.path.join(state_dir, tier, "v=base"))
        )

    feed = _feed(tmp_path, [[
        {"seq": 1, "end_time": "2026-02-01T10:00:00", "change": "update",
         "object_uri": _uri("srcA", 3),
         "payload": _doc("srcA", 3, "A3-v2")},
        {"seq": 2, "end_time": "2026-02-01T10:00:00", "change": "delete",
         "object_uri": _uri("srcA", 5), "payload": None},
    ]])
    ckpt = str(tmp_path / "ckpt")
    q = stream_entity_builds(spark, feed, state_dir, ckpt, _indexes(spark))
    q.awaitTermination(180)

    want = sorted(
        (r["yuid"], r["data"])
        for r in latest_state(spark, state_dir, ckpt)["merged"].collect()
    )
    before = {t: _bucket_files(state_dir, t) for t in ("records", "idmap", "merged")}
    removed = compact_entity_state(spark, state_dir, ckpt)
    assert removed == {"records": 1, "idmap": 1, "merged": 1}
    after = {t: _bucket_files(state_dir, t) for t in ("records", "idmap", "merged")}

    # the touched records keys are exactly srcA/3 (update) and srcA/5
    # (delete): their buckets must change; every other bucket must not
    tb = {
        r["tb"]
        for r in spark.createDataFrame(
            [(_uri("srcA", 3),), (_uri("srcA", 5),)], "k string"
        ).select(F.pmod(F.xxhash64("k"), F.lit(16)).alias("tb")).collect()
    }
    touched_dirs = {f"b={n}" for n in tb}
    changed = {d for d in before["records"]
               if before["records"][d] != after["records"].get(d)}
    changed |= {d for d in after["records"] if d not in before["records"]}
    assert changed <= touched_dirs and changed  # only touched buckets moved
    untouched = set(before["records"]) - touched_dirs
    for d in untouched:
        assert after["records"][d] == before["records"][d]

    # folded read identical post-compaction; deltas gone
    got = sorted(
        (r["yuid"], r["data"])
        for r in latest_state(spark, state_dir, ckpt)["merged"].collect()
    )
    assert got == want
    labels = {json.loads(d)["_label"] for _, d in got}
    assert "A3-v2" in labels and "A5" not in labels
    assert not any(
        d.startswith("d=") for d in os.listdir(os.path.join(state_dir, "merged"))
    )
    # idempotent: second compaction is a no-op
    assert compact_entity_state(spark, state_dir, ckpt) == {
        "records": 0, "idmap": 0, "merged": 0
    }


def test_lookup_state_reads_only_target_buckets(spark, tmp_path):
    """lookup_state is the serving read the bucketed base exists for:
    O(|keys| buckets + deltas), never a corpus scan.  Proof by poison —
    every NON-target bucket's parquet is overwritten with garbage bytes
    before the lookup; a read that listed or opened them would throw, so
    success + correct rows means only the target buckets were touched.
    Also covers the delta overlay (an updated key's lookup returns the
    delta winner, a deleted key returns nothing)."""
    from data_pipeline_spark.streaming.entity_stream import lookup_state

    state_dir = str(tmp_path / "state")
    init_state(spark, _records(spark, 12), _indexes(spark), state_dir,
               buckets=32)
    feed = _feed(tmp_path, [[
        {"seq": 1, "end_time": "2026-02-01T10:00:00", "change": "update",
         "object_uri": _uri("srcA", 3),
         "payload": _doc("srcA", 3, "A3-v2")},
        {"seq": 2, "end_time": "2026-02-01T10:00:00", "change": "delete",
         "object_uri": _uri("srcA", 5), "payload": None},
    ]])
    ckpt = str(tmp_path / "ckpt")
    q = stream_entity_builds(spark, feed, state_dir, ckpt, _indexes(spark))
    q.awaitTermination(180)

    targets = [_uri("srcA", 3), _uri("srcA", 5), _uri("srcA", 7)]
    want_buckets = {
        r["b"]
        for r in spark.createDataFrame([(u,) for u in targets], "k string")
        .select(F.pmod(F.xxhash64("k"), F.lit(32)).alias("b")).collect()
    }
    bdir = os.path.join(state_dir, "records", "v=base")
    poisoned = 0
    for d in os.listdir(bdir):
        if d.startswith("b=") and int(d[2:]) not in want_buckets:
            for f in os.listdir(os.path.join(bdir, d)):
                with open(os.path.join(bdir, d, f), "wb") as fh:
                    fh.write(b"not parquet at all")
                poisoned += 1
    assert poisoned > 0  # the poison actually covers non-target buckets

    got = {
        json.loads(r["data"])["_label"]
        for r in lookup_state(spark, state_dir, ckpt, targets).collect()
    }
    assert got == {"A3-v2", "A7"}  # delta winner in, deleted key out


def test_compaction_crash_repair_paths(spark, tmp_path):
    """Every crash instant of a compaction is recoverable on the next
    read: un-planned staging rolls back (base untouched); a persisted
    plan resumes (staged buckets swap in, drop buckets vanish) — no
    state exists where neither a complete bucket nor its plan is on
    disk."""
    state_dir = str(tmp_path / "state")
    init_state(spark, _records(spark, 8), _indexes(spark), state_dir,
               buckets=8)
    merged_dir = os.path.join(state_dir, "merged")
    want = sorted(
        (r["yuid"], r["data"])
        for r in read_base_tier(spark, state_dir, "merged").collect()
    )

    # (a) staging crashed BEFORE the plan was persisted: base untouched,
    # reads stay correct WITHOUT touching the staging (round 14 / ADVICE
    # r13: a reader must never roll back what may be a LIVE compactor's
    # half-written staging — sweeping no-plan staging is the maintenance
    # entry points' job, under the exclusive lock)
    from data_pipeline_spark.streaming.entity_stream import repair_state_dir

    cdir = os.path.join(merged_dir, ".compact")
    os.makedirs(os.path.join(cdir, "next", "b=0"))
    got = sorted(
        (r["yuid"], r["data"])
        for r in read_base_tier(spark, state_dir, "merged").collect()
    )
    assert got == want
    assert os.path.isdir(cdir)  # the read left the staging alone
    repair_state_dir(state_dir)
    assert not os.path.isdir(cdir)  # the locked repair rolled it back

    # (b) crash mid-swap WITH a plan: stage a replacement for one bucket
    # (a real bucket dir copied aside counts as "staged new version"),
    # plus a drop of another; repair must complete both
    buckets = sorted(
        d for d in os.listdir(os.path.join(merged_dir, "v=base"))
        if d.startswith("b=")
    )
    assert len(buckets) >= 2
    swap_d, drop_d = buckets[0], buckets[1]
    swap_n, drop_n = int(swap_d[2:]), int(drop_d[2:])
    os.makedirs(os.path.join(cdir, "next"))
    shutil.copytree(
        os.path.join(merged_dir, "v=base", swap_d),
        os.path.join(cdir, "next", swap_d),
    )
    # mutate the staged copy's identity: remove the original bucket so
    # repair MUST take the staged one (simulates crash after rmtree(dst))
    shutil.rmtree(os.path.join(merged_dir, "v=base", swap_d))
    with open(os.path.join(cdir, "plan.json"), "w") as f:
        json.dump({"mode": "buckets", "swap": [swap_n], "drop": [drop_n]}, f)

    kept_rows = sorted(
        (r["yuid"], r["data"])
        for r in read_base_tier(spark, state_dir, "merged").collect()
    )
    assert not os.path.isdir(cdir)  # plan applied + cleaned
    assert os.path.isdir(os.path.join(merged_dir, "v=base", swap_d))
    assert not os.path.isdir(os.path.join(merged_dir, "v=base", drop_d))
    # swapped bucket's rows survive, dropped bucket's rows are gone
    want_set = {r for r in want}
    assert set(kept_rows) < want_set

    # (c) an unrecoverable plan (neither staged nor applied) raises
    # loudly instead of serving a hole
    os.makedirs(cdir)
    shutil.rmtree(os.path.join(merged_dir, "v=base", swap_d))
    with open(os.path.join(cdir, "plan.json"), "w") as f:
        json.dump({"mode": "buckets", "swap": [swap_n], "drop": []}, f)
    with pytest.raises(RuntimeError, match="unrecoverable"):
        read_base_tier(spark, state_dir, "merged")


def test_rebucket_state_lifecycle(spark, tmp_path):
    """rebucket_state keeps the bucket-bytes rule maintainable as the
    corpus grows: atomic per-tier swaps behind a meta MARKER so a crash
    mid-rebucket (mixed bucket map on disk) degrades safely — lookups
    fall back to the full fold, partial compaction refuses the stale map
    and instead completes the rebucket via its full-rewrite path."""
    from data_pipeline_spark.streaming.entity_stream import (
        _write_state_meta,
        lookup_state,
        rebucket_state,
        state_stats,
    )

    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    init_state(spark, _records(spark, 10), _indexes(spark), state_dir,
               buckets=4)
    before = sorted(
        (r["yuid"], r["data"])
        for r in read_base_tier(spark, state_dir, "merged").collect()
    )

    rebucket_state(spark, state_dir, ckpt, 32)
    assert read_state_meta(state_dir) == {"layout": "bucketed", "buckets": 32}
    assert state_stats(state_dir, ckpt)["tiers"]["merged"][
        "base_buckets_present"] > 4
    after = sorted(
        (r["yuid"], r["data"])
        for r in read_base_tier(spark, state_dir, "merged").collect()
    )
    assert after == before
    key = _uri("srcA", 3)
    got = lookup_state(spark, state_dir, ckpt, [key]).collect()
    assert len(got) == 1  # bucket pruning agrees with the new map

    # pending committed deltas refuse a rebucket (keys must not straddle
    # two bucket maps)
    feed = _feed(tmp_path, [[
        {"seq": 1, "end_time": "2026-02-01T10:00:00", "change": "update",
         "object_uri": key, "payload": _doc("srcA", 3, "A3-v2")},
    ]])
    q = stream_entity_builds(spark, feed, state_dir, ckpt, _indexes(spark))
    q.awaitTermination(180)
    with pytest.raises(ValueError, match="compact_entity_state first"):
        rebucket_state(spark, state_dir, ckpt, 64)

    # interrupted rebucket (marker on disk, map possibly mixed): lookup
    # still serves correct rows via the full-fold fallback, and the next
    # compaction COMPLETES the rebucket at the marker's target
    _write_state_meta(state_dir, {"layout": "bucketed", "buckets": 32,
                                  "rebucket_to": 64})
    got = lookup_state(spark, state_dir, ckpt, [key]).collect()
    assert json.loads(got[0]["data"])["_label"] == "A3-v2"
    removed = compact_entity_state(spark, state_dir, ckpt)
    assert removed == {"records": 1, "idmap": 1, "merged": 1}
    assert read_state_meta(state_dir) == {"layout": "bucketed", "buckets": 64}
    got = lookup_state(spark, state_dir, ckpt, [key]).collect()
    assert json.loads(got[0]["data"])["_label"] == "A3-v2"


def test_flat_base_migration_and_legacy_error(spark, tmp_path):
    """A round-12 FLAT base (no meta, un-bucketed v=base) reads as-is
    and is migrated to the bucketed layout by its first compaction via
    an atomic whole-dir swap; a round-11 versioned layout (v=<key> dirs)
    raises a migration error instead of silently serving stale base
    (ADVICE r12)."""
    state_dir = str(tmp_path / "state")
    init_state(spark, _records(spark, 8), _indexes(spark), state_dir,
               buckets=8)

    # flatten: rewrite each tier un-bucketed, drop the meta (exactly the
    # round-12 on-disk shape)
    for tier in ("records", "idmap", "merged"):
        flat = read_base_tier(spark, state_dir, tier).localCheckpoint()
        bdir = os.path.join(state_dir, tier, "v=base")
        shutil.rmtree(bdir)
        flat.write.parquet(bdir)
    os.remove(os.path.join(state_dir, "_META.json"))
    assert read_state_meta(state_dir) is None

    feed = _feed(tmp_path, [[
        {"seq": 1, "end_time": "2026-02-01T10:00:00", "change": "update",
         "object_uri": _uri("srcA", 2),
         "payload": _doc("srcA", 2, "A2-v2")},
    ]])
    ckpt = str(tmp_path / "ckpt")
    q = stream_entity_builds(spark, feed, state_dir, ckpt, _indexes(spark))
    q.awaitTermination(180)
    want = sorted(
        (r["yuid"], r["data"])
        for r in latest_state(spark, state_dir, ckpt)["merged"].collect()
    )

    removed = compact_entity_state(spark, state_dir, ckpt, buckets=8)
    meta = read_state_meta(state_dir)
    assert meta == {"layout": "bucketed", "buckets": 8}
    assert removed == {"records": 1, "idmap": 1, "merged": 1}
    for tier in ("records", "idmap", "merged"):
        assert any(
            d.startswith("b=")
            for d in os.listdir(os.path.join(state_dir, tier, "v=base"))
        )
    got = sorted(
        (r["yuid"], r["data"])
        for r in latest_state(spark, state_dir, ckpt)["merged"].collect()
    )
    assert got == want
    assert any(json.loads(d)["_label"] == "A2-v2" for _, d in got)

    # round-11 layout: versioned dirs other than v=base -> loud error
    os.makedirs(os.path.join(state_dir, "merged", "v=deadbeef-b0"))
    with pytest.raises(ValueError, match="pre-delta-layout"):
        latest_state(spark, state_dir, ckpt)
    with pytest.raises(ValueError, match="pre-delta-layout"):
        compact_entity_state(spark, state_dir, ckpt)


def test_maintenance_lock_semantics(tmp_path):
    """The flock contract the round-14 concurrency fix rests on:
    exclusive excludes everything, shared coexists with shared, and the
    non-blocking try reports a busy lock instead of deadlocking (flock
    treats two fds in one process as independent owners, so this also
    drills the self-deadlock shape try_maintenance_lock exists for)."""
    import fcntl

    from data_pipeline_spark.streaming.locks import (
        maintenance_lock,
        try_maintenance_lock,
    )

    root = str(tmp_path / "state")
    with maintenance_lock(root):  # exclusive held
        with try_maintenance_lock(root) as got:
            assert got is False  # busy: a second exclusive must not win
    with try_maintenance_lock(root) as got:
        assert got is True  # free again after release

    # shared + shared coexist; shared + exclusive-try conflicts
    import os as _os
    lock_path = _os.path.join(root, ".maintenance.lock")
    with maintenance_lock(root, shared=True):
        fd = _os.open(lock_path, _os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_SH | fcntl.LOCK_NB)  # ok
        finally:
            _os.close(fd)
        with try_maintenance_lock(root) as got:
            assert got is False


def test_stream_fails_fast_on_foreign_deltas(spark, tmp_path):
    """A state dir holding ANOTHER checkpoint's deltas must be rejected
    AT STREAM START when compaction is scheduled — not at batch N inside
    the sink (ADVICE r13: --compact-every defaulting on turned
    previously-working shared-dir runs into mid-stream deaths)."""
    state_dir = str(tmp_path / "state")
    init_state(spark, _records(spark, 4), _indexes(spark), state_dir,
               buckets=4)
    # plant a delta owned by a DIFFERENT checkpoint lineage
    foreign = os.path.join(state_dir, "records", "d=deadbeef" + "0" * 24 + "-b0")
    os.makedirs(foreign)
    feed = _feed(tmp_path, [[{
        "seq": 1, "end_time": "2026-01-02T00:00:00", "change": "update",
        "object_uri": _uri("srcA", 0),
        "payload": _doc("srcA", 0, "A0-v2"),
    }]])
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(ValueError, match="other"):
        stream_entity_builds(
            spark, feed, state_dir, ckpt, _indexes(spark), compact_every=2
        )
    # without compaction scheduled the same dir streams fine
    q = stream_entity_builds(spark, feed, state_dir, ckpt, _indexes(spark))
    q.awaitTermination(120)
