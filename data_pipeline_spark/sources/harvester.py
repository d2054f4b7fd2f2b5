"""ActivityStreams / OAI-PMH harvest walkers (SURVEY §2.1 S2/S3).

The crawl itself is inherently sequential paged HTTP (walk the
OrderedCollection backwards from `last`, stop at the watermark) — that part
is a DRIVER-SIDE generator with an injectable ``fetch_page`` (testable
offline, swappable for a real session). Everything after the walk — change
classification, first-seen dedupe, freshness gating, cache application —
is the distributed batch/streaming path in streaming/ingest.py; the walker
just lands pages as rows.

Reference semantics reproduced (process/base/harvester.py:111-297 in
/root/reference): pages walked newest-first; items within a page reversed
(they are stored oldest-first per page); stop as soon as an item's
``endTime`` drops below ``last_harvest``; items newer than ``harvest_from``
skipped (replay window); per-crawl seen-set so the first (newest) change
per identifier wins; change verb normalization.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

CHANGE_VERBS = {
    "create": "create", "add": "create",
    "update": "update", "move": "update", "merge": "update", "refresh": "update",
    "delete": "delete", "remove": "delete",
}


def crawl_activity_stream(
    fetch_page: Callable[[str], dict[str, Any]],
    collection_url: str,
    last_harvest: str | None = None,
    harvest_from: str | None = None,
    item_prefilter: Callable[[dict[str, Any]], dict[str, Any] | None] | None = None,
) -> Iterator[dict[str, Any]]:
    """Yield change rows ``{seq, end_time, change, object_uri}`` walking the
    feed newest-first. ``fetch_page(url)`` returns the parsed JSON of a
    collection or page document.

    ``item_prefilter`` is the S4 feed filter+rewrite hook (the Getty
    harvester shape, sources/authorities/getty/harvester.py:7-26 in
    /root/reference): it runs BEFORE the watermark/replay/seen logic —
    returning None drops the item without tripping the last_harvest stop
    (the reference filters items out before ASHarvester.process_items
    ever sees their endTime), and a returned (possibly rewritten) item
    feeds the normal R1/R2/R5 path, so dedup keys on the REWRITTEN id."""
    coll = fetch_page(collection_url)
    page_url = (coll.get("last") or {}).get("id")
    seen: set[str] = set()
    seq = 0
    while page_url:
        page = fetch_page(page_url)
        items = list(reversed(page.get("orderedItems") or []))  # newest first
        for item in items:
            if item_prefilter is not None:
                item = item_prefilter(item)
                if item is None:
                    continue
            end_time = item.get("endTime")
            if last_harvest is not None and end_time is not None and end_time <= last_harvest:
                return  # R1: everything older is already harvested
            if harvest_from is not None and end_time is not None and end_time > harvest_from:
                continue  # R2: replay upper bound
            obj = (item.get("object") or {}).get("id")
            if not obj or obj in seen:
                continue  # R5: first (newest) change per identifier wins
            seen.add(obj)
            seq += 1
            yield {
                "seq": seq,
                "end_time": end_time,
                "change": CHANGE_VERBS.get(str(item.get("type", "")).lower(), "update"),
                "object_uri": obj,
            }
        page_url = (page.get("prev") or {}).get("id")


def run_harvest(
    spark,
    fetch_page: Callable[[str], dict[str, Any]],
    collection_url: str,
    cache_path: str,
    fetch_record: Callable[[str], str | None] | None = None,
    last_harvest: str | None = None,
    edges=None,
) -> int:
    """§3.2 integration: walk the feed, land the changes as a DataFrame,
    apply them to the cache tier with the R1–R8 semantics, upsert-commit.
    ``fetch_record(uri)`` supplies payloads for create/update (None ->
    change rows carry no body and only deletes take effect). Returns the
    number of change rows applied."""
    import os

    from pyspark.sql import functions as F

    from ..sinks.exports import write_parquet_atomic
    from ..streaming.ingest import apply_changes

    rows = []
    for ch in crawl_activity_stream(fetch_page, collection_url, last_harvest):
        payload = fetch_record(ch["object_uri"]) if fetch_record and ch["change"] != "delete" else None
        rows.append((ch["seq"], ch["end_time"], ch["change"], ch["object_uri"], payload))
    if not rows:
        return 0
    changes = spark.createDataFrame(
        rows, "seq bigint, end_time string, change string, object_uri string, payload string"
    ).withColumn("end_time", F.col("end_time").cast("timestamp"))
    if os.path.exists(cache_path):
        cache = spark.read.parquet(cache_path)
    else:
        cache = spark.createDataFrame(
            [], "object_uri string, record_time timestamp, data string"
        )
    # apply_changes already returned the complete next cache state with
    # deletes applied; commit it atomically (a key-merge here would pull
    # deleted rows back in from the old tier).
    new_cache = apply_changes(cache, changes, edges=edges)
    write_parquet_atomic(new_cache, cache_path)
    return len(rows)


def crawl_oai_pmh(
    fetch_page: Callable[[dict[str, str]], dict[str, Any]],
    metadata_prefix: str = "oai_dc",
    from_datestamp: str | None = None,
) -> Iterator[dict[str, Any]]:
    """S3: ListIdentifiers walk with resumptionToken paging. ``fetch_page``
    takes the request params dict and returns a parsed response with
    ``identifiers: [{identifier, datestamp, deleted}]`` and optional
    ``resumptionToken``."""
    params = {"verb": "ListIdentifiers", "metadataPrefix": metadata_prefix}
    if from_datestamp:
        params["from"] = from_datestamp
    seq = 0
    while True:
        resp = fetch_page(params)
        for rec in resp.get("identifiers") or []:
            seq += 1
            yield {
                "seq": seq,
                "end_time": rec.get("datestamp"),
                "change": "delete" if rec.get("deleted") else "update",
                "object_uri": rec.get("identifier"),
            }
        token = resp.get("resumptionToken")
        if not token:
            return
        params = {"verb": "ListIdentifiers", "resumptionToken": token}
