"""U1 breadth: real per-source mapper shapes (wikidata + artic museum)
running registry-driven end-to-end — loader config -> envelopes -> the
shared pipeline envelope parser — with no engine changes."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_spark.pipeline.envelope import with_doc
from data_pipeline_spark.registry import SourceRegistry

WD_ENTITIES = [
    # explicit P31 human -> Person; VIAF + ULAN external ids; US nationality
    {
        "id": "Q937",
        "modified": "2026-02-01T00:00:00Z",
        "labels": {
            "en": {"language": "en", "value": "Albert Person"},
            "de": {"language": "de", "value": "Albert Persoon"},
        },
        "claims": {
            "P31": [{"mainsnak": {"datavalue": {"value": {"id": "Q5"}}}}],
            "P214": [{"mainsnak": {"datavalue": {"value": "75121530"}}}],
            "P245": [{"mainsnak": {"datavalue": {"value": "500115588"}}}],
            "P27": [{"mainsnak": {"datavalue": {"value": {"id": "Q30"}}}}],
        },
    },
    # no useful P31 -> property smell test: place-family props dominate
    {
        "id": "Q1709",
        "labels": {"en": {"language": "en", "value": "Someplace"}},
        "claims": {
            "P625": [{"mainsnak": {"datavalue": {"value": "geo"}}}],
            "P1082": [{"mainsnak": {"datavalue": {"value": "1000"}}}],
            "P47": [{"mainsnak": {"datavalue": {"value": "x"}}}],
            "P1566": [{"mainsnak": {"datavalue": {"value": "2950159"}}}],
        },
    },
    # disambiguation page -> aborted (no envelope row)
    {
        "id": "Q4167410",
        "labels": {"en": {"language": "en", "value": "disambig"}},
        "claims": {"P31": [{"mainsnak": {"datavalue": {"value": {"id": "Q4167410"}}}}]},
    },
    # nothing useful -> Type default
    {"id": "Q999999", "labels": {"en": {"language": "en", "value": "Mystery"}}, "claims": {}},
]


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_wikidata_mapper_end_to_end(spark, tmp_path):
    from data_pipeline_spark.sources.wikidata import CONFIG

    dump = tmp_path / "wd.jsonl"
    _write_jsonl(dump, WD_ENTITIES)

    reg = SourceRegistry()
    src = reg.register_config({**CONFIG, "dump_path": str(dump)})
    loaded = src.component("loader")(spark, src.config)
    envelopes = src.component("mapper")(loaded)

    rows = {r.identifier: r for r in envelopes.collect()}
    # disambiguation page dropped
    assert set(rows) == {"Q937", "Q1709", "Q999999"}
    assert rows["Q937"].rectype == "Person"  # P31 table
    assert rows["Q1709"].rectype == "Place"  # property smell test
    assert rows["Q999999"].rectype == "Type"  # default
    assert rows["Q937"].record_time == "2026-02-01T00:00:00Z"

    doc = json.loads(rows["Q937"].data)
    eq_ids = {e["id"] for e in doc["equivalent"]}
    assert "https://viaf.org/viaf/75121530" in eq_ids  # P214 template
    assert "http://vocab.getty.edu/ulan/500115588" in eq_ids  # P245 template
    assert all(e["type"] == "Person" for e in doc["equivalent"])
    # nationality classification from P27 Q30
    assert {c["id"] for c in doc["classified_as"]} == {
        "http://vocab.getty.edu/aat/300107956"
    }
    # multilingual labels -> Name structs with language refs
    names = {n["content"]: n for n in doc["identified_by"]}
    assert set(names) == {"Albert Person", "Albert Persoon"}
    assert names["Albert Persoon"]["language"][0]["id"].endswith("/de")
    assert doc["_label"] == "Albert Person"
    assert doc["id"] == "http://www.wikidata.org/entity/Q937"

    # the envelopes parse through the SHARED pipeline doc schema
    parsed = with_doc(envelopes)
    got = parsed.filter(F.col("identifier") == "Q937").select("doc.equivalent").collect()[0]
    assert len(got.equivalent) == 2


ARTIC_ROWS = [
    {"id": 111, "api_model": "artworks", "title": "A Painting",
     "alt_titles": ["The Painting"], "description": "Oil on canvas",
     "timestamp": "2026-03-01T00:00:00"},
    {"id": 222, "api_model": "agents", "is_artist": True, "title": "Jane Painter",
     "birth_date": "1850", "death_date": "1920"},
    {"id": 333, "api_model": "agents", "is_artist": False, "title": "Some Museum"},
    {"id": 444, "api_model": "exhibitions", "title": "Big Show"},
]


def test_artic_mapper_end_to_end(spark, tmp_path):
    from data_pipeline_spark.sources.artic import CONFIG

    dump = tmp_path / "artic.jsonl"
    _write_jsonl(dump, ARTIC_ROWS)

    reg = SourceRegistry()
    src = reg.register_config({**CONFIG, "dump_path": str(dump)})
    loaded = src.component("loader")(spark, src.config)
    envelopes = src.component("mapper")(loaded)

    rows = {r.identifier: r for r in envelopes.collect()}
    assert rows["111"].rectype == "HumanMadeObject"
    assert rows["222"].rectype == "Person"
    assert rows["333"].rectype == "Group"
    assert rows["444"].rectype == "Activity"

    art = json.loads(rows["111"].data)
    assert art["id"] == "https://api.artic.edu/api/v1/artworks/111"
    names = {n["content"]: n["classified_as"][0]["id"] for n in art["identified_by"]}
    assert names["A Painting"].endswith("primaryName")
    assert names["The Painting"].endswith("alternateName")
    assert art["referred_to_by"][0]["content"] == "Oil on canvas"

    jane = json.loads(rows["222"].data)
    assert jane["id"] == "https://api.artic.edu/api/v1/agents/222"
    assert jane["born"]["timespan"]["begin_of_the_begin"] == "1850-01-01T00:00:00"
    assert jane["died"]["timespan"]["end_of_the_end"] == "1920-12-31T23:59:59"
    assert "born" not in json.loads(rows["333"].data)

    # merge_order flows from config through the registry map
    assert reg.merge_order_map()["artic"] == 15


LC_RECORDS = [
    # PersonalName authority with a German variant, a note, a bnf + viaf
    # equivalent (bnf stripped), lcnaf routing
    {
        "identifier": "n79021164",
        "record_time": "2026-03-01T00:00:00",
        "graph": [
            {
                "id": "http://id.loc.gov/authorities/names/n79021164",
                "types": ["madsrdf:PersonalName", "madsrdf:Authority"],
                "auth_labels": [{"value": "Twain, Mark, 1835-1910", "lang": "eng"}],
                "variants": [{"value": "Clemens, Samuel", "lang": "ger"}],
                "notes": ["American humorist"],
                "exact_external": [
                    "http://viaf.org/viaf/50566653",
                    "http://data.bnf.fr/ark:/12148/cb118898896",
                ],
            }
        ],
    },
    # Geographic class reachable only through the identifiesRWO hop, and a
    # -781 subdivision suffix on the identifier (stripped before lookup
    # would fail -> graph keys use the STRIPPED id)
    {
        "identifier": "n79006971-781",
        "graph": [
            {
                "id": "http://id.loc.gov/authorities/names/n79006971",
                "types": ["madsrdf:Authority"],
                "auth_labels": [{"value": "Boston (Mass.)"}],
                "rwo_ref": "_:rwo1",
            },
            {"id": "_:rwo1", "types": ["madsrdf:Geographic"]},
        ],
    },
    # LCSH topical concept -> Type default, lcsh routing; the top node id
    # appears TWICE (JSON-LD splits properties across entries) — the
    # last entry wins, like the reference's nodes-dict build
    {
        "identifier": "sh85005249",
        "graph": [
            {
                "id": "http://id.loc.gov/authorities/subjects/sh85005249",
                "types": ["madsrdf:Topic"],
                "auth_labels": [{"value": "stale first entry"}],
            },
            {
                "id": "http://id.loc.gov/authorities/subjects/sh85005249",
                "types": ["madsrdf:Topic", "madsrdf:Authority"],
                "auth_labels": [{"value": "Amphibians"}],
            },
        ],
    },
    # deprecated authority -> trashed
    {
        "identifier": "n00000000",
        "graph": [
            {
                "id": "http://id.loc.gov/authorities/names/n00000000",
                "types": ["madsrdf:DeprecatedAuthority"],
                "auth_labels": [{"value": "gone"}],
            }
        ],
    },
    # special-term sentinel -> dropped before any lookup
    {"identifier": "@@LMI-SPECIAL-TERM@@", "graph": []},
    # madsrdf:Title -> trashed (never requested as LinguisticObject here)
    {
        "identifier": "no2026000001",
        "graph": [
            {
                "id": "http://id.loc.gov/authorities/names/no2026000001",
                "types": ["madsrdf:Title"],
                "auth_labels": [{"value": "Some Title"}],
            }
        ],
    },
    # TWO mapped types in record order contrary to TYPE_MAP declaration
    # order: the reference's `for t in @type` loop elects Person (record
    # order), not Place (map order)
    {
        "identifier": "n81018853",
        "graph": [
            {
                "id": "http://id.loc.gov/authorities/names/n81018853",
                "types": ["madsrdf:PersonalName", "madsrdf:Geographic"],
                "auth_labels": [{"value": "Record-order election"}],
            }
        ],
    },
    # typed ONLY with the full foaf URI — must elect Person, not fall
    # through to the Type default (mapper.py:27-30 full-URI map entries)
    {
        "identifier": "n85095299",
        "graph": [
            {
                "id": "http://id.loc.gov/authorities/names/n85095299",
                "types": ["http://xmlns.com/foaf/0.1/Person"],
                "auth_labels": [{"value": "Full-URI typed person"}],
            }
        ],
    },
]


def test_lc_mapper_end_to_end(spark, tmp_path):
    from data_pipeline_spark.sources.lc import CONFIG

    dump = tmp_path / "lc.jsonl"
    _write_jsonl(dump, LC_RECORDS)

    reg = SourceRegistry()
    src = reg.register_config({**CONFIG, "dump_path": str(dump)})
    loaded = src.component("loader")(spark, src.config)
    envelopes = src.component("mapper")(loaded)

    rows = {r.identifier: r for r in envelopes.collect()}
    # deprecated, sentinel and Title records trashed
    assert set(rows) == {
        "n79021164", "n79006971", "sh85005249", "n81018853", "n85095299",
    }
    # record-order election: [PersonalName, Geographic] -> Person
    assert rows["n81018853"].rectype == "Person"
    # full-URI foaf type maps instead of defaulting to Type
    assert rows["n85095299"].rectype == "Person"

    twain = rows["n79021164"]
    assert twain.rectype == "Person" and twain.source == "lcnaf"
    body = json.loads(twain.data)
    assert body["_label"] == "Twain, Mark, 1835-1910"
    langs = {n["content"]: n.get("language") for n in body["identified_by"]}
    # F15 through the mapper: eng -> en, ger -> de
    assert langs == {"Twain, Mark, 1835-1910": "en", "Clemens, Samuel": "de"}
    assert [s["content"] for s in body["referred_to_by"]] == ["American humorist"]
    # fix_links: bnf equivalent stripped, viaf kept
    assert [e["id"] for e in body["equivalent"]] == ["http://viaf.org/viaf/50566653"]

    boston = rows["n79006971"]  # -781 suffix stripped (F12)
    assert boston.rectype == "Place" and boston.source == "lcnaf"  # via RWO hop

    frog = rows["sh85005249"]
    assert frog.rectype == "Type" and frog.source == "lcsh"  # F23 default + routing
    assert json.loads(frog.data)["_label"] == "Amphibians"  # last duplicate node won

    # envelopes parse through the shared pipeline surface
    parsed = with_doc(envelopes)
    assert parsed.filter(F.col("doc").isNotNull()).count() == 5
