"""Tests for the BFS reference walk (X3/X4/A12) and the bulk HTTP sink (K5)."""

from __future__ import annotations

import glob
import json
import os

from data_pipeline_spark.pipeline.references import (
    external_reference_queue,
    reference_distances,
)
from data_pipeline_spark.sinks.http_load import load_http


def test_reference_distances_min_and_bound(spark):
    #   seed -> a -> b -> c -> d   (d is beyond max_distance=3)
    #   seed -> b                  (b also reachable at distance 1)
    #   equivalent edges ignored
    edges = spark.createDataFrame(
        [
            ("seed", "part_of", "a"),
            ("a", "part_of", "b"),
            ("seed", "member_of", "b"),
            ("b", "part_of", "c"),
            ("c", "part_of", "d"),
            ("seed", "equivalent", "z"),
        ],
        ["subject", "predicate", "object"],
    )
    seeds = spark.createDataFrame([("seed",)], ["uri"])
    got = {r.uri: r.distance for r in reference_distances(edges, seeds, 3).collect()}
    assert got == {"seed": 0, "a": 1, "b": 1, "c": 2, "d": 3}
    assert "z" not in got  # ignored predicate


def test_external_reference_queue(spark):
    edges = spark.createDataFrame(
        [("seed", "part_of", "a"), ("a", "part_of", "b")],
        ["subject", "predicate", "object"],
    )
    seeds = spark.createDataFrame([("seed",)], ["uri"])
    dists = reference_distances(edges, seeds, 3)
    known = spark.createDataFrame([("seed",), ("a",)], ["uri"])
    q = {r.uri: r.distance for r in external_reference_queue(dists, known).collect()}
    assert q == {"b": 2}  # only the unheld referenced record


def test_http_load_batching(spark, tmp_path):
    outdir = str(tmp_path)

    def poster(batch):
        # executors share the local FS in local mode: one file per batch
        import uuid

        with open(os.path.join(outdir, f"{uuid.uuid4().hex}.json"), "w") as f:
            json.dump(batch, f)

    df = spark.createDataFrame([(i, f"doc{i}") for i in range(25)], ["id", "doc"]).coalesce(1)
    load_http(df, poster=poster, batch_size=10, max_threads=2)
    files = glob.glob(os.path.join(outdir, "*.json"))
    batches = [json.load(open(p)) for p in files]
    assert sorted(len(b) for b in batches) == [5, 10, 10]
    ids = sorted(r["id"] for b in batches for r in b)
    assert ids == list(range(25))


def test_ntriples_typed_literals(spark):
    from data_pipeline_spark.pipeline.edges import to_ntriples

    edges = spark.createDataFrame(
        [("y1", "height", "1.69"),
         ("y1", "born", "1606-07-15T00:00:00"),
         ("y1", "label", 'say "hi"')],
        ["subject", "predicate", "object"],
    )
    lines = {r.nt for r in to_ntriples(edges).collect()}
    assert any('"1.69"^^<http://www.w3.org/2001/XMLSchema#decimal>' in l for l in lines)
    assert any('"1606-07-15T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>' in l for l in lines)
    assert any('"say \\"hi\\""' in l for l in lines)
