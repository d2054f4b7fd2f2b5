"""Reference walking with BFS distance (SURVEY §2.9 X3/X4, §2.5 A12).

The reference crawls outbound references record-by-record, tracking the
minimum BFS distance at which each URI was reached and re-queueing URIs
found closer (process/reference_manager.py:100-210 in /root/reference),
bounded by max_distance=3. Spark restatement: whole-dataset frontier
iteration — each round is one join frontier⋈edges + a min-distance
aggregate, so the entire crawl is ``max_distance`` shuffles regardless of
record count, and the "re-queue if found closer" rule is simply
``groupBy(uri).agg(min(dist))`` (A12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_distance: int = 3,
    ignore_predicates: tuple[str, ...] = ("equivalent",),
) -> DataFrame:
    """(uri, distance): minimum BFS distance from any seed, distance <=
    max_distance. ``seeds(uri)`` are distance-0 roots (the internal
    records); ``edges(subject, predicate, object)`` is the extracted graph.

    ``ignore_predicates`` mirrors the reference's ignore-props skip list
    (reidentifier.py:12-13): equivalence links are identity, not
    reference reachability."""
    hop = edges
    for p in ignore_predicates:
        hop = hop.filter(F.col("predicate") != p)
    hop = hop.select("subject", "object").localCheckpoint()

    labels = seeds.select(F.col("uri")).distinct().withColumn("distance", F.lit(0))
    frontier = labels
    for d in range(1, max_distance + 1):
        nxt = (
            hop.join(frontier, hop.subject == frontier.uri)
            .select(F.col("object").alias("uri"))
            .distinct()
            .withColumn("distance", F.lit(d))
        )
        # min-distance keep (A12): only URIs not already reached closer
        nxt = nxt.join(labels.select("uri"), "uri", "left_anti").localCheckpoint()
        if nxt.isEmpty():
            break
        labels = labels.unionByName(nxt)
        frontier = nxt
    return labels


def external_reference_queue(
    distances: DataFrame, known: DataFrame, max_distance: int = 3
) -> DataFrame:
    """The acquire queue (run-reconcile.py:162-220 analog): referenced URIs
    within the distance bound that we hold no record for — the records the
    crawl stage should fetch next."""
    return (
        distances.filter(
            (F.col("distance") > 0) & (F.col("distance") <= max_distance)
        )
        .join(known.select("uri"), "uri", "left_anti")
        .select("uri", "distance")
    )
