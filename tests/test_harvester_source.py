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


def test_wof_sqlite_scan_and_point_lookup(spark, tmp_path):
    """S13: the WOF SQLite dump reads distributed (rowid-range mapInPandas
    scan) and serves point lookups with the chunked-path HTTP fallback."""
    import sqlite3

    from data_pipeline_spark.sources.fetcher import fetch_records
    from data_pipeline_spark.sources.wof import (
        load_sqlite_table, make_fetch_uri, wof_fetch_factory,
    )

    db = str(tmp_path / "wof.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE geojson (id INTEGER, body TEXT)")
        conn.executemany(
            "INSERT INTO geojson VALUES (?, ?)",
            [(i, json.dumps({"wof:id": i, "name": f"place{i}"})) for i in range(100)],
        )

    # bulk scan: all rows, through several range partitions
    df = load_sqlite_table(spark, db, n_partitions=7)
    assert df.rdd.getNumPartitions() == 7
    rows = {int(r.id): json.loads(r.body)["name"] for r in df.collect()}
    assert len(rows) == 100 and rows[42] == "place42"

    # chunked HTTP scheme (fetcher.py:16-31)
    assert make_fetch_uri("85633793") == (
        "https://data.whosonfirst.org/856/337/93/85633793.geojson"
    )
    assert make_fetch_uri("85633793.geojson").endswith("/85633793.geojson")

    # point lookups through the S1 distributed fetcher: dump hit, then a
    # dump miss falling through to the injected HTTP fetch
    def http_factory():
        return lambda uri: json.dumps({"fetched_from": uri})

    uris = spark.createDataFrame([("42",), ("424242",)], ["uri"])
    got = {r.uri: (r.ok, r.payload) for r in fetch_records(
        uris, wof_fetch_factory(db, http_factory), parallelism=2).collect()}
    assert json.loads(got["42"][1])["name"] == "place42"
    assert json.loads(got["424242"][1])["fetched_from"] == (
        "https://data.whosonfirst.org/424/242/424242.geojson"
    )
    # offline mode: miss with no HTTP fallback -> ok=false row
    got2 = {r.uri: r.ok for r in fetch_records(
        uris, wof_fetch_factory(db), parallelism=2).collect()}
    assert got2["42"] is True and got2["424242"] is False


def test_sparql_select_ids_and_harvest(spark):
    """S14: SELECT -> bindings -> DataFrame/ids, prefix auto-prepend only
    when the query has none, and the harvest composition fanning record
    fetches through the S1 fetcher."""
    from data_pipeline_spark.sources.sparql import (
        bindings_to_df, harvest_sparql, search_sparql, sparql_ids,
    )

    seen_queries = []

    def fake_endpoint(query):
        seen_queries.append(query)
        return {
            "results": {"bindings": [
                {"topic": {"type": "uri", "value": "https://auth.example/n/00270331"},
                 "label": {"type": "literal", "value": "Topic A"}},
                {"topic": {"type": "uri", "value": "https://auth.example/n/99999999"}},
            ]}
        }

    binds = search_sparql(fake_endpoint, "SELECT ?topic WHERE { ?s ?p ?o }")
    assert seen_queries[0].startswith("PREFIX rdf:")  # prefixes prepended
    search_sparql(fake_endpoint, "PREFIX x: <urn:x>\nSELECT ?t WHERE {}")
    assert seen_queries[1].startswith("PREFIX x:")  # own prefixes kept

    df = bindings_to_df(spark, binds)
    assert df.columns == ["topic", "label"]
    vals = {r.topic: r.label for r in df.collect()}
    assert vals["https://auth.example/n/00270331"] == "Topic A"
    assert vals["https://auth.example/n/99999999"] is None  # OPTIONAL-style

    assert sparql_ids(fake_endpoint, "SELECT ?topic WHERE {}") == [
        "https://auth.example/n/00270331", "https://auth.example/n/99999999",
    ]

    def record_factory():
        return lambda ident: json.dumps({"id": ident, "fetched": True})

    got = {r.uri: json.loads(r.payload) for r in harvest_sparql(
        spark, fake_endpoint, "SELECT ?topic WHERE {}", record_factory,
        parallelism=2).collect()}
    assert set(got) == {"00270331", "99999999"}  # identifier split off URI
    assert got["00270331"]["fetched"] is True
