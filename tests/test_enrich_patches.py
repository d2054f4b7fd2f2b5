"""Tests for geometry functions (F16-F19), data-driven patches (F20/U3),
type overrides, metatype enrichment (J12), primary-name election (A8), the
JSON query form (Q2), and the source registry (U1/U2)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_spark.functions.geometry import (
    clamp_coords,
    geometry_score,
    parse_wkt,
    rdp_simplify,
    simplify_wkt,
    wkt_point,
)
from data_pipeline_spark.pipeline.enrich import elect_primary_names, metatype_edges
from data_pipeline_spark.pipeline.patches import (
    apply_patch,
    apply_patches,
    apply_type_overrides,
)
from data_pipeline_spark.plans.parser import Bool, Leaf, Rel, parse, parse_json
from data_pipeline_spark.registry import SourceRegistry


# ------------------------------------------------------------- geometry
def test_wkt_roundtrip_and_score():
    assert parse_wkt("POINT ( 4.89 52.37 )") == ("POINT", [(4.89, 52.37)])
    poly = "POLYGON (( 0 0, 10 0, 10 10, 0 10, 0 0 ))"
    shape, coords = parse_wkt(poly)
    assert shape == "POLYGON" and len(coords) == 5
    # polygon beats point, more vertices beat fewer, parseable beats junk
    assert geometry_score(poly) > geometry_score("POINT ( 1 1 )")
    assert geometry_score("POINT ( 1.12345 1 )") > geometry_score("POINT ( 1.1 1 )")
    assert geometry_score("not wkt")[0] == 0


def test_rdp_simplify_drops_collinear():
    line = [(0.0, 0.0), (1.0, 0.001), (2.0, 0.0), (3.0, 5.0)]
    simp = rdp_simplify(line, epsilon=0.01)
    assert simp == [(0.0, 0.0), (2.0, 0.0), (3.0, 5.0)]
    s = simplify_wkt("LINESTRING ( 0 0, 1 0.001, 2 0, 3 5 )", epsilon=0.01)
    assert s == "LINESTRING ( 0.0 0.0, 2.0 0.0, 3.0 5.0 )"


def test_clamp_and_point_exprs(spark):
    df = spark.createDataFrame(
        [(4.89, 52.37, "POLYGON (( 180 90, -180 -90, 179.5 10 ))")],
        ["lng", "lat", "wkt"],
    ).select(
        wkt_point(F.col("lng"), F.col("lat")).alias("pt"),
        clamp_coords(F.col("wkt")).alias("clamped"),
    )
    r = df.first()
    assert r.pt == "POINT ( 4.89 52.37 )"
    assert r.clamped == "POLYGON (( 179.75 89.75, -179.75 -89.75, 179.5 10 ))"


# ------------------------------------------------------------- patches
def test_apply_patch_ops():
    doc = {"a": {"b": [1, 2, 3]}, "keep": True}
    assert apply_patch(dict(doc), "a.b[1]", "DELETE", None)["a"]["b"] == [1, 3]
    assert apply_patch(dict(doc), "a.b", "UPDATE", "[9]")["a"]["b"] == [9]
    assert apply_patch(dict(doc), "missing.path", "DELETE", None) == doc  # no-op


def test_apply_patches_df(spark):
    records = spark.createDataFrame(
        [
            ("srcA", "r1", json.dumps({"id": "x", "bad": 1, "good": 2})),
            ("srcA", "r2", json.dumps({"id": "y", "bad": 1})),
        ],
        "source string, identifier string, data string",
    )
    patches = spark.createDataFrame(
        [("srcA", "r1", "bad", "DELETE", None),
         ("srcA", "r1", "good", "UPDATE", "99")],
        "source string, identifier string, path string, operation string, argument string",
    )
    out = {r.identifier: json.loads(r.data) for r in apply_patches(records, patches).collect()}
    assert "bad" not in out["r1"] and out["r1"]["good"] == 99
    assert out["r2"] == {"id": "y", "bad": 1}  # untouched row passes through


def test_type_overrides(spark):
    records = spark.createDataFrame(
        [("srcA", "r1", "Group", json.dumps({"id": "uri:1"}))],
        "source string, identifier string, rectype string, data string",
    )
    ov = spark.createDataFrame([("uri:1", "Person")], "ext_uri string, new_type string")
    out = apply_type_overrides(records, ov).first()
    assert out.rectype == "Person"


# ------------------------------------------------------- enrich / election
def test_metatype_edges(spark):
    merged = spark.createDataFrame(
        [("y1", "Type", json.dumps({"id": "y1", "type": "Type",
                                     "classified_as": [{"id": "uri:mat"}]}))],
        "yuid string, rectype string, data string",
    )
    meta = spark.createDataFrame([("uri:mat", "uri:metatype")],
                                 "concept_uri string, metatype_uri string")
    got = metatype_edges(merged, meta).collect()
    assert [(r.yuid, r.metatype_uri) for r in got] == [("y1", "uri:metatype")]


def test_primary_name_election(spark):
    doc = {
        "id": "y1", "type": "Person",
        "identified_by": [
            {"type": "Name", "content": "JMW", "language": [{"id": "lang/en"}]},
            {"type": "Name", "content": "Joseph Mallord William Turner",
             "language": [{"id": "lang/en"}],
             "classified_as": [{"id": "vocab/primaryName"}]},
            {"type": "Name", "content": "A Long English Alternate",
             "language": [{"id": "lang/en"}]},
            {"type": "Name", "content": "Turner", "language": [{"id": "lang/de"}]},
        ],
    }
    merged = spark.createDataFrame(
        [("y1", "Person", json.dumps(doc))], "yuid string, rectype string, data string"
    )
    got = {(r.lang): r.primary_name for r in elect_primary_names(merged).collect()}
    # primaryName classification wins in en despite being longer; the
    # all-caps acronym is demoted below everything
    assert got["en"] == "Joseph Mallord William Turner"
    assert got["de"] == "Turner"


def test_llm_acronym_primary_still_wins(spark):
    """The acronym demotion must not apply to LLM-injected names: the
    reference PREPENDS the LLM primary unconditionally
    (final/mapper.py:322-326), so an all-caps single-token LLM parse
    (e.g. a monogrammist) still wins the en election over an existing
    lowercase primary."""
    doc = {
        "id": "y3", "type": "Person",
        "identified_by": [
            {"type": "Name", "content": "Master of the Embroidered Foliage",
             "language": [{"id": "lang/en"}],
             "classified_as": [{"id": "vocab/primaryName"}]},
        ],
    }
    merged = spark.createDataFrame(
        [("y3", "Person", json.dumps(doc))], "yuid string, rectype string, data string"
    )
    llm = spark.createDataFrame([("y3", "M.E.F.")], "yuid string, llm_primary string")
    got = {r.lang: r.primary_name
           for r in elect_primary_names(merged, llm_names=llm).collect()}
    assert got["en"] == "M.E.F."


def test_primary_name_election_iso639_2_uris(spark):
    """F15: 3-letter language URIs (both bibliographic and terminological
    variants) must bucket into the SAME 2-letter lane as the 639-1 form —
    the old 2-char tail regex turned '/eng' into a bogus 'ng' lane."""
    doc = {
        "id": "y2", "type": "Person",
        "identified_by": [
            {"type": "Name", "content": "English Name", "language": [{"id": "lang/eng"}]},
            {"type": "Name", "content": "Deutsch", "language": [{"id": "lang/ger"}]},
            {"type": "Name", "content": "Deutsch Zwei", "language": [{"id": "lang/deu"}]},
        ],
    }
    merged = spark.createDataFrame(
        [("y2", "Person", json.dumps(doc))], "yuid string, rectype string, data string"
    )
    rows = elect_primary_names(merged).collect()
    got = {r.lang: r.primary_name for r in rows}
    assert set(got) == {"en", "de"}  # ger and deu collapse into one de lane
    assert got["en"] == "English Name"
    assert got["de"] == "Deutsch"  # shorter wins within the merged lane


# ------------------------------------------------------- F11/J11 wikimedia
def test_wikimedia_license_enrichment(spark):
    """Concrete J11: normalize -> license join -> validation drops ->
    cropped-variant preference, in one DataFrame op."""
    from data_pipeline_spark.pipeline.enrich import enrich_wikimedia_licenses

    aps = spark.createDataFrame(
        [
            # dirty wikimedia: http + uppercase path + %20 + ?width -> licensed
            ("r1", "http://Commons.wikimedia.org/wiki/Special:FilePath/My%20Image.jpg?width=250"),
            # wikimedia without a license row -> dropped
            ("r1", "https://commons.wikimedia.org/wiki/Special:FilePath/Unlicensed.png"),
            # yale passthrough, no license
            ("r1", "https://media.yale.edu/iiif/obj1/full.jpg"),
            # unvalidatable external -> dropped
            ("r1", "https://elsewhere.example/img.png"),
            # cropped + its base: base must be removed (the base form is
            # the cropped name with 'cropped' stripped and '_.' collapsed)
            ("r2", "https://commons.wikimedia.org/wiki/Special:FilePath/Scene_cropped.jpg"),
            ("r2", "https://commons.wikimedia.org/wiki/Special:FilePath/Scene.jpg"),
        ],
        "record_uri string, ap_id string",
    )
    licenses = spark.createDataFrame(
        [
            ("My_Image.jpg", "https://creativecommons.org/publicdomain/zero/1.0/"),
            ("Scene_cropped.jpg", "https://creativecommons.org/licenses/by/4.0/"),
            ("Scene.jpg", "https://creativecommons.org/licenses/by/4.0/"),
        ],
        "filename string, license_uri string",
    )
    got = {(r.record_uri, r.ap): r.license_uri
           for r in enrich_wikimedia_licenses(aps, licenses).collect()}
    assert got == {
        ("r1", "https://commons.wikimedia.org/wiki/special:filepath/My_Image.jpg"):
            "https://creativecommons.org/publicdomain/zero/1.0/",
        ("r1", "https://media.yale.edu/iiif/obj1/full.jpg"): None,
        ("r2", "https://commons.wikimedia.org/wiki/special:filepath/Scene_cropped.jpg"):
            "https://creativecommons.org/licenses/by/4.0/",
    }


def test_wikimedia_filename_quote_branch(spark):
    """F11's conditional percent-encode: unencoded special chars get
    quoted; already-encoded names pass through."""
    from data_pipeline_spark.functions.strings import wikimedia_filename

    df = spark.createDataFrame(
        [("https://commons.wikimedia.org/wiki/Special:FilePath/Café (1900).jpg",),
         ("https://commons.wikimedia.org/wiki/Special:FilePath/Caf%C3%A9_%281900%29.jpg",),
         ("https://commons.wikimedia.org/wiki/Special:FilePath/A%20b (1).jpg",)],
        "ap string",
    )
    got = [r.fn for r in df.select(wikimedia_filename(F.col("ap")).alias("fn")).collect()]
    assert got[1] == "Caf%C3%A9_%281900%29.jpg"  # pre-encoded: untouched
    assert "%C3%A9" in got[0] and "%28" in got[0]  # quoted on the way in
    # Reference parity (final/mapper.py:119-121): only the '%20' form maps
    # to '_'; a literal space is percent-encoded by the conditional quote,
    # so it must come out as '%20', never '+' (JVM url_encode default).
    assert got[0] == "Caf%C3%A9%20%281900%29.jpg"
    # A '%20' maps to '_' BEFORE the encoded-branch check, so this name no
    # longer contains '%' and the remaining literal space gets quoted.
    assert got[2] == "A_b%20%281%29.jpg"


# ------------------------------------------------------------- Q2 parser
def test_parse_json_matches_string_form():
    s = parse('AND(type=customer, in_nation(name="NATION_7"))')
    j = parse_json({"AND": [{"type": "customer"}, {"in_nation": {"name": "NATION_7"}}]})
    assert s == j


def test_parse_json_comp_and_inverse():
    j = parse_json({"NOT": {"^in_nation": {"number": 9500, "_comp": ">"}}})
    assert isinstance(j, Bool) and j.op == "NOT"
    rel = j.children[0]
    assert isinstance(rel, Rel) and rel.inverse and rel.predicate == "in_nation"
    assert rel.child == Leaf("number", ">", 9500)


def test_parse_near_andnot_boost_tokens():
    """The remaining reference grammar tokens (ml_lexer.py:328): string
    and JSON surfaces produce the same AST; arity and the optional
    trailing NEAR distance are enforced."""
    import pytest

    from data_pipeline_spark.plans.parser import Near

    s = parse('BOOST(ANDNOT(name~small, NEAR(name~small, name~bolt, 1)), name~gizmo)')
    assert isinstance(s, Bool) and s.op == "BOOST" and len(s.children) == 2
    an = s.children[0]
    assert isinstance(an, Bool) and an.op == "ANDNOT"
    near = an.children[1]
    assert isinstance(near, Near) and near.distance == 1
    assert near.children == [Leaf("name", "~", "small"), Leaf("name", "~", "bolt")]
    # default distance = 10 (the cts default) when no trailing number
    assert parse("NEAR(name~a, name~b)").distance == 10
    j = parse_json(
        {"BOOST": [
            {"ANDNOT": [{"name": "small", "_comp": "~"},
                        {"NEAR": [{"name": "small", "_comp": "~"},
                                  {"name": "bolt", "_comp": "~"}], "_distance": 1}]},
            {"name": "gizmo", "_comp": "~"},
        ]}
    )
    assert j == s
    with pytest.raises(ValueError):
        parse("ANDNOT(name~a)")
    with pytest.raises(ValueError):
        parse("NEAR(name~a)")
    with pytest.raises(ValueError):
        parse("BOOST(name~a, name~b, name~c)")
    # a fractional distance is rejected, not silently truncated to 1
    with pytest.raises(ValueError, match="non-negative integer"):
        parse("NEAR(name~a, name~b, 1.9)")


# ------------------------------------------------------------- registry
def _double_mapper(df):
    return df.withColumn("v", F.col("v") * 2)


def test_source_registry(spark):
    reg = SourceRegistry()
    reg.register_config(
        {"name": "toy", "mapper": f"{__name__}:_double_mapper", "merge_order": 3}
    )
    assert "toy" in reg and reg.names() == ["toy"]
    assert reg.merge_order_map() == {"toy": 3}
    mapper = reg.get("toy").component("mapper")
    df = spark.createDataFrame([(1,)], ["v"])
    assert mapper(df).first().v == 2
    assert reg.get("toy").component("reconciler") is None


# ------------------------------------------------------------- validation
def test_validate_records(spark):
    from data_pipeline_spark.pipeline.validate import split_valid, validate_records

    rows = [
        # `_extras` proves the underscore exemption (validator.py:14-17)
        ("srcA", "ok", "Person",
         json.dumps({"id": "uri:ok", "type": "Person", "_label": "Fine",
                     "_extras": {"x": 1},
                     "identified_by": [{"type": "Name", "content": "Fine"}]})),
        ("srcA", "badtype", "Person",
         json.dumps({"id": "uri:bt", "type": "Martian"})),
        ("srcA", "mismatch", "Group",
         json.dumps({"id": "uri:mm", "type": "Person", "_label": "M"})),
        ("srcA", "noid", "Person",
         json.dumps({"type": "Person", "_label": "N"})),
        ("srcA", "noname", "Person",
         json.dumps({"id": "uri:nn", "type": "Person", "_label": "NN",
                     "identified_by": [{"type": "Name"}]})),
        # from_json is PERMISSIVE (all-null struct, not null doc) — the
        # unparseable rule must probe the raw string, not just doc
        ("srcA", "garbled", "Person", "{oops"),
        # per-class structural rules: required property, and the
        # additionalProperties check (class-specific allowances apply —
        # `born` is person-schema-only)
        ("srcA", "nolabel", "Material",
         json.dumps({"id": "uri:nl", "type": "Material", "broader": []})),
        ("srcA", "extraprops", "Person",
         json.dumps({"id": "uri:ep", "type": "Person", "_label": "E",
                     "born": {}, "shoe_size": 44, "favorite_color": "teal"})),
        # required = PRESENCE (JSON Schema semantics): a present-but-null
        # _label is the type checks' business, not a missing property
        ("srcA", "nulllabel", "Place",
         json.dumps({"id": "uri:0l", "type": "Place", "_label": None})),
    ]
    records = spark.createDataFrame(
        rows, "source string, identifier string, rectype string, data string"
    )
    errs = {r.identifier: list(r.errors) for r in validate_records(records).collect()}
    assert errs["ok"] == []
    assert errs["badtype"] == ["unknown record type", "type/rectype mismatch"]
    assert errs["mismatch"] == ["type/rectype mismatch"]
    assert errs["noid"] == ["missing id"]
    assert errs["noname"] == ["name without content"]
    assert errs["garbled"] == ["unparseable document"]
    assert errs["nolabel"] == ["missing required property: _label"]
    assert errs["extraprops"] == ["unexpected properties: favorite_color, shoe_size"]
    assert errs["nulllabel"] == []
    valid, quarantine = split_valid(records)
    assert valid.count() == 2 and quarantine.count() == 7


def test_repair_timespans(spark):
    from data_pipeline_spark.pipeline.patches import repair_timespans

    doc = {
        "id": "uri:x", "type": "Person",
        "born": {"type": "Birth",
                 "timespan": {"begin_of_the_begin": "early 12th century"}},
        "died": {"type": "Death",
                 "timespan": {"begin_of_the_begin": "not a date at all"}},
        "produced_by": {"timespan": {"begin_of_the_begin": "-0450",
                                      "end_of_the_end": "-0425"}},
    }
    records = spark.createDataFrame(
        [("s", "r1", json.dumps(doc)), ("s", "r2", json.dumps({"id": "uri:y"}))],
        "source string, identifier string, data string",
    )
    out = {r.identifier: json.loads(r.data) for r in repair_timespans(records).collect()}
    born = out["r1"]["born"]["timespan"]
    assert born["begin_of_the_begin"] == "1101-01-01T00:00:00"
    assert born["end_of_the_end"] == "1133-12-31T23:59:59"
    assert "timespan" not in out["r1"]["died"]  # unparsable stripped
    prod = out["r1"]["produced_by"]["timespan"]
    assert prod["begin_of_the_begin"] == "-0450-01-01T00:00:00"
    assert prod["end_of_the_end"] == "-0425-12-31T23:59:59"
    assert prod["_seconds_since_epoch_begin"] < 0
    assert out["r2"] == {"id": "uri:y"}  # untouched fast path


def test_load_llm_names_skips_bad_lines_and_long_labels(spark, tmp_path):
    """U5 loader twin of LlmNameIndexLoader.load: null parsed_output rows
    are the reference's 'bad' lines (skipped); names over 498 chars lose
    their label key but keep the lux_id key."""
    import json

    from data_pipeline_spark.pipeline.enrich import load_llm_names

    path = tmp_path / "names.jsonl"
    rows = [
        {"lux_id": "y1", "primary_name": "Roger King",
         "parsed_output": {"first_name": "Roger", "last_name": "King",
                           "middle_names": ["A."], "birth_year": 1945}},
        {"lux_id": "y2", "primary_name": "Bad Parse", "parsed_output": None},
        {"lux_id": "y3", "primary_name": "L" * 499,
         "parsed_output": {"first_name": "Long", "last_name": "Name"}},
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    got = {r.lux_id: r for r in load_llm_names(spark, str(path)).collect()}
    assert set(got) == {"y1", "y3"}  # null parsed_output skipped
    assert got["y1"].first_name == "Roger" and got["y1"].birth_year == 1945
    assert got["y3"].primary_name is None  # too long for the label key
    assert got["y3"].last_name == "Name"
