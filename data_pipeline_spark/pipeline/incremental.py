"""Incremental rebuild (SURVEY §3.2 + R7/R8): apply a change feed and
rebuild ONLY the affected equivalence components.

The reference's incremental path (test_updates.py:55-309, update_manager.py
in /root/reference) re-runs reconcile→merge→export for changed records and
uses the idmap's per-build tokens to know what to refresh. Spark
restatement:

1. apply the change feed to the records tier (create/update/delete);
2. blast radius = every URI sharing a component with a changed URI — one
   join through the previous idmap (yuid = component id), NOT a graph
   crawl;
3. run the ordinary full build on just those records (with the previous
   idmap as the stability input, so surviving components keep their
   yuids);
4. splice: previous merged output minus affected yuids, union the rebuilt
   slice.

Correctness contract (tested): incremental output == full rebuild on the
updated records tier, row for row. At 100TB the affected slice is
proportional to the change feed, not the corpus — the full-build cost is
paid only by touched components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import run_build
from .envelope import with_doc


def apply_changes_to_records(records: DataFrame, changes: DataFrame) -> DataFrame:
    """Apply create/update/delete feed rows to the records tier (keyed by
    the record's canonical URI). Latest change per URI wins (R5)."""
    from ..streaming.ingest import dedupe_first_seen

    ch = dedupe_first_seen(changes)
    keyed = with_doc(records).withColumn("_uri", F.col("doc.id")).drop("doc")

    deletes = ch.filter(F.col("change") == "delete").select(
        F.col("object_uri").alias("_uri")
    )
    upserts = (
        ch.filter((F.col("change") != "delete") & F.col("payload").isNotNull())
        .select(
            F.col("object_uri").alias("_uri"),
            F.col("payload").alias("data"),
            F.col("end_time").cast("string").alias("record_time"),
        )
        .withColumn("doc", F.from_json("data", "id string, type string"))
        .select(
            "_uri",
            F.regexp_extract("_uri", r"https?://[^/]+/([^/]+)/", 1).alias("source"),
            F.element_at(F.split("_uri", "/"), -1).alias("identifier"),
            F.col("doc.type").alias("rectype"),
            "record_time",
            F.lit("update").alias("change"),
            "data",
        )
    )
    survivors = (
        keyed.join(deletes, "_uri", "left_anti")
        .join(upserts.select("_uri"), "_uri", "left_anti")
    )
    return survivors.unionByName(upserts.select(*survivors.columns)).drop("_uri")


def affected_uris(changes: DataFrame, idmap_prev: DataFrame) -> DataFrame:
    """(uri): the blast radius — changed URIs plus every member of any
    component (shared yuid) that contains one."""
    changed = changes.select(F.col("object_uri").alias("qua_uri")).distinct()
    hit_yuids = idmap_prev.join(changed, "qua_uri").select("yuid").distinct()
    members = idmap_prev.join(hit_yuids, "yuid").select(F.col("qua_uri").alias("uri"))
    return members.union(changed.select(F.col("qua_uri").alias("uri"))).distinct()


def incremental_build(
    spark: SparkSession,
    records: DataFrame,
    changes: DataFrame,
    indexes: dict[str, DataFrame],
    idmap_prev: DataFrame,
    prev_merged: DataFrame,
    merge_order: dict[str, int] | None = None,
    last_harvest: str | None = None,
) -> dict[str, DataFrame]:
    """One incremental round. Returns the same tier dict as run_build,
    where `merged_full` is the spliced full output.

    ``idmap_prev`` must be the PREVIOUS BUILD'S COMPUTED idmap (its full
    qua_uri -> yuid relation), not a partial seed: the blast radius and the
    splice both resolve through it, so yuids it doesn't know about would
    leave stale rows behind. ``last_harvest`` is the R1 watermark — feed
    items at or before it are ignored."""
    if last_harvest is not None:
        changes = changes.filter(
            F.col("end_time") > F.lit(last_harvest).cast("timestamp")
        )
    new_records = apply_changes_to_records(records, changes)
    blast = affected_uris(changes, idmap_prev)

    slice_records = (
        with_doc(new_records)
        .withColumn("_uri", F.col("doc.id"))
        .join(blast, F.col("_uri") == blast.uri, "left_semi")
        .drop("doc", "_uri")
    )
    rebuilt = run_build(spark, slice_records, indexes, idmap_prev, merge_order)

    affected_yuids = (
        idmap_prev.join(
            changes.select(F.col("object_uri").alias("qua_uri")).distinct(),
            "qua_uri",
        ).select("yuid").distinct()
    )
    untouched = prev_merged.join(affected_yuids, "yuid", "left_anti").join(
        rebuilt["merged"].select("yuid"), "yuid", "left_anti"
    )
    rebuilt["merged_full"] = untouched.unionByName(rebuilt["merged"])
    rebuilt["records"] = new_records
    return rebuilt
