"""Tests for the AS/OAI harvest walkers (S2/S3) and the registry-wired
example source (U1/U2/F23)."""

from __future__ import annotations

import json


def _fake_fetch_factory():
    def fetch(uri: str):
        if uri.endswith("missing"):
            return None
        if uri.endswith("boom"):
            raise RuntimeError("connection reset")
        return json.dumps({"id": uri, "fetched": True})

    return fetch


def test_fetch_records_distributed(spark):
    """S1: distributed fetch — payloads land keyed by uri, failures and
    exceptions become ok=false rows instead of failing the scan."""
    from data_pipeline_spark.sources.fetcher import fetch_records

    uris = spark.createDataFrame(
        [("https://x.test/a",), ("https://x.test/missing",), ("https://x.test/boom",)],
        ["uri"],
    )
    out = {r.uri: (r.ok, r.payload) for r in
           fetch_records(uris, _fake_fetch_factory, parallelism=2).collect()}
    assert out["https://x.test/a"][0] is True
    assert json.loads(out["https://x.test/a"][1])["fetched"] is True
    assert out["https://x.test/missing"] == (False, None)
    assert out["https://x.test/boom"] == (False, None)

import json

from data_pipeline_spark.registry import SourceRegistry
from data_pipeline_spark.sources.harvester import crawl_activity_stream, crawl_oai_pmh


def _feed():
    """Two-page feed, newest page = 'last'. Items stored oldest-first per
    page (the AS convention the walker must reverse)."""
    pages = {
        "coll": {"last": {"id": "p2"}},
        "p2": {
            "prev": {"id": "p1"},
            "orderedItems": [
                {"type": "Update", "endTime": "2026-02-01T10:00:00",
                 "object": {"id": "uri:a"}},
                {"type": "Create", "endTime": "2026-02-01T11:00:00",
                 "object": {"id": "uri:b"}},
                {"type": "Delete", "endTime": "2026-02-01T12:00:00",
                 "object": {"id": "uri:a"}},  # newest change for a
            ],
        },
        "p1": {
            "orderedItems": [
                {"type": "Update", "endTime": "2026-01-01T00:00:00",
                 "object": {"id": "uri:old"}},
                {"type": "Update", "endTime": "2026-01-20T00:00:00",
                 "object": {"id": "uri:c"}},
            ],
        },
    }
    return lambda url: pages[url]


def test_as_crawl_newest_first_dedupe_and_watermark():
    rows = list(crawl_activity_stream(_feed(), "coll", last_harvest="2026-01-10T00:00:00"))
    # newest first: delete of a wins over the older update (R5)
    assert [(r["object_uri"], r["change"]) for r in rows] == [
        ("uri:a", "delete"),
        ("uri:b", "create"),
        ("uri:c", "update"),
    ]
    # uri:old (before the watermark) stopped the walk (R1)
    assert all(r["object_uri"] != "uri:old" for r in rows)


def test_as_crawl_harvest_from_upper_bound():
    rows = list(
        crawl_activity_stream(
            _feed(), "coll",
            last_harvest="2026-01-10T00:00:00",
            harvest_from="2026-02-01T10:30:00",
        )
    )
    # only items at/below the replay bound survive (R2); the delete and
    # create are too new, so the OLDER update of uri:a is now first-seen
    assert [(r["object_uri"], r["change"]) for r in rows] == [
        ("uri:a", "update"),
        ("uri:c", "update"),
    ]


def test_oai_crawl_resumption_and_tombstones():
    responses = [
        {"identifiers": [{"identifier": "r1", "datestamp": "2026-01-01"},
                          {"identifier": "r2", "datestamp": "2026-01-02", "deleted": True}],
         "resumptionToken": "tok1"},
        {"identifiers": [{"identifier": "r3", "datestamp": "2026-01-03"}]},
    ]
    calls = []

    def fetch(params):
        calls.append(dict(params))
        return responses[len(calls) - 1]

    rows = list(crawl_oai_pmh(fetch, from_datestamp="2025-12-31"))
    assert [(r["object_uri"], r["change"]) for r in rows] == [
        ("r1", "update"), ("r2", "delete"), ("r3", "update"),
    ]
    assert calls[0]["from"] == "2025-12-31"
    assert calls[1]["resumptionToken"] == "tok1"


def test_example_source_end_to_end(spark, tmp_path):
    from data_pipeline_spark.sources.example_museum import CONFIG

    dump = tmp_path / "museum.jsonl"
    with open(dump, "w") as f:
        f.write(json.dumps({"id": "obj1", "kind": "painting",
                            "title": "Night Watch", "maker": "a1"}) + "\n")
        f.write(json.dumps({"id": "a1", "kind": "artist",
                            "title": "Rembrandt"}) + "\n")

    reg = SourceRegistry()
    src = reg.register_config(dict(CONFIG))
    loaded = src.component("loader")(spark, {"dump_path": str(dump)})
    records = src.component("mapper")(loaded)
    rows = {r.identifier: r for r in records.collect()}
    assert rows["obj1"].rectype == "HumanMadeObject"  # F23 guess_type
    assert rows["a1"].rectype == "Person"
    doc = json.loads(rows["obj1"].data)
    assert doc["id"] == "https://fixture.test/museum/obj1"
    assert doc["identified_by"][0]["content"] == "Night Watch"
    assert reg.merge_order_map() == {"museum": 10}


def test_run_harvest_end_to_end(spark, tmp_path):
    """Feed walk -> change rows -> cache application -> parquet tier."""
    from data_pipeline_spark.sources.harvester import run_harvest

    bodies = {
        "uri:a": '{"id":"uri:a","v":2}',
        "uri:b": '{"id":"uri:b","v":1}',
        "uri:c": '{"id":"uri:c","v":1}',
    }
    cache_path = str(tmp_path / "tier")
    n = run_harvest(
        spark, _feed(), "coll", cache_path,
        fetch_record=lambda uri: bodies.get(uri),
        last_harvest="2026-01-10T00:00:00",
    )
    assert n == 3  # delete a, create b, update c
    got = {r.object_uri: json.loads(r.data)["v"]
           for r in spark.read.parquet(cache_path).collect()}
    # a was deleted (tombstone on empty cache -> absent); b and c created
    assert got == {"uri:b": 1, "uri:c": 1}


def test_schedule_order():
    reg = SourceRegistry()
    for name in ("wikidata", "lcsh", "ycba"):
        reg.register(name)
    order = reg.schedule_order({"wikidata": 100_000_000, "lcsh": 450_000, "ycba": 197_711})
    assert order == ["ycba", "lcsh", "wikidata"]
    # unknown sizes go last
    reg.register("mystery")
    assert reg.schedule_order({"wikidata": 1, "lcsh": 2, "ycba": 3})[-1] == "mystery"


def _getty_feed():
    """Mixed-vocabulary Getty feed: aat + ulan items interleaved; the
    oldest pre-watermark item belongs to the OTHER vocabulary, so a
    filter running after the watermark check would stop the walk too
    early and lose 'aat/300000001'."""
    pages = {
        "coll": {"last": {"id": "g2"}},
        "g2": {
            "prev": {"id": "g1"},
            "orderedItems": [
                {"type": "Update", "endTime": "2026-02-01T10:00:00",
                 "object": {"id": "https://data.getty.edu/vocab/aat/300404670"}},
                {"type": "Update", "endTime": "2026-02-01T11:00:00",
                 "object": {"id": "https://data.getty.edu/vocab/ulan/500115588"}},
                # duplicate of the aat item under the raw spelling: dedup
                # must key on the REWRITTEN id
                {"type": "Refresh", "endTime": "2026-02-01T12:00:00",
                 "object": {"id": "https://data.getty.edu/vocab/aat/300404670"}},
            ],
        },
        "g1": {
            # walker reverses (stored oldest-first), so processing order is:
            # malformed, ulan 01-01, aat 01-20, aat 2025-12-01.  The
            # below-watermark ulan item is hit BEFORE the kept aat item —
            # a filter running after the R1 check would stop the walk
            # there and lose aat/300000001.
            "orderedItems": [
                {"type": "Update", "endTime": "2025-12-01T00:00:00",
                 "object": {"id": "https://data.getty.edu/vocab/aat/300999999"}},
                {"type": "Create", "endTime": "2026-01-20T00:00:00",
                 "object": {"id": "https://data.getty.edu/vocab/aat/300000001"}},
                # other-vocab item BELOW the watermark: reference filters
                # it out before the endTime check -> must not stop the walk
                {"type": "Update", "endTime": "2026-01-01T00:00:00",
                 "object": {"id": "https://data.getty.edu/vocab/ulan/500000001"}},
                {"malformed": True},  # no object id -> dropped quietly
            ],
        },
    }
    return lambda url: pages[url]


def test_getty_filter_rewrite_before_watermark():
    """S4 (Getty shape): only the configured vocabulary survives, ids are
    rewritten to vocab.getty.edu BEFORE seen-dedup, and foreign-vocab
    items below the watermark do not terminate the crawl — but an
    in-vocabulary item below it does (R1)."""
    from data_pipeline_spark.sources.getty import crawl

    rows = list(
        crawl(_getty_feed(), "coll", "aat", last_harvest="2026-01-10T00:00:00")
    )
    assert [(r["object_uri"], r["change"]) for r in rows] == [
        ("http://vocab.getty.edu/aat/300404670", "update"),  # newest wins dedup
        ("http://vocab.getty.edu/aat/300000001", "create"),
    ]
    # the 2025-12-01 aat item (below watermark) stopped the walk; the
    # 2026-01-01 ulan item did NOT
    assert all("300999999" not in r["object_uri"] for r in rows)
