"""The wildcard-traversal sentinel (ADVICE r10): Rel(predicate=None) is
the unambiguous every-predicate form, emitted by the parser for `*(...)`
/ {"*": {...}}; the planner's `any_predicate` NAME mapping is only the
reference-surface alias and can be disabled (any_predicate=None) when an
edge relation has a genuine predicate literally named "any"."""

from __future__ import annotations

from data_pipeline_spark.plans.parser import Bool, Leaf, Rel, parse, parse_json
from data_pipeline_spark.plans.planner import SearchPlanner


def test_parser_star_is_wildcard_rel():
    ast = parse("*(name=x)")
    assert isinstance(ast, Rel) and ast.predicate is None and not ast.inverse
    assert isinstance(ast.child, Leaf)

    inv = parse("^*(name=x)")
    assert isinstance(inv, Rel) and inv.predicate is None and inv.inverse

    # multiple children -> implicit AND, same as named rels
    multi = parse("*(name=x, type=y)")
    assert multi.predicate is None and isinstance(multi.child, Bool)

    # a predicate literally named `any` still parses as a NAMED rel
    named = parse("any(name=x)")
    assert isinstance(named, Rel) and named.predicate == "any"


def test_parse_json_star_is_wildcard_rel():
    ast = parse_json({"*": {"name": "x"}})
    assert isinstance(ast, Rel) and ast.predicate is None and not ast.inverse
    inv = parse_json({"^*": {"name": "x"}})
    assert inv.predicate is None and inv.inverse
    named = parse_json({"any": {"name": "x"}})
    assert named.predicate == "any"


def _tiny_model(spark):
    entities = spark.createDataFrame(
        [("a", "X"), ("b", "X"), ("c", "X"), ("t", "Y")], ["id", "type"]
    )
    # edges: `any` is a GENUINE predicate here; `other` is a second one
    edges = spark.createDataFrame(
        [("a", "any", "t"), ("b", "other", "t")],
        ["subject", "predicate", "object"],
    )
    return entities, edges


def test_planner_star_traverses_every_predicate(spark):
    entities, edges = _tiny_model(spark)
    p = SearchPlanner(entities, edges)
    got = {r.id for r in p.plan("*(type=Y)").collect()}
    assert got == {"a", "b"}
    # the named surface alias compiles to the same wildcard by default
    assert {r.id for r in p.plan("any(type=Y)").collect()} == {"a", "b"}


def test_planner_genuine_any_predicate_filterable(spark):
    """With any_predicate=None the name `any` is an ordinary predicate —
    the collision the r10 ADVICE flagged — and `*` stays the wildcard."""
    entities, edges = _tiny_model(spark)
    p = SearchPlanner(entities, edges, any_predicate=None)
    assert {r.id for r in p.plan("any(type=Y)").collect()} == {"a"}
    assert {r.id for r in p.plan("other(type=Y)").collect()} == {"b"}
    assert {r.id for r in p.plan("*(type=Y)").collect()} == {"a", "b"}


def test_planner_star_inverse(spark):
    entities, edges = _tiny_model(spark)
    p = SearchPlanner(entities, edges, any_predicate=None)
    # entities pointed TO by X-typed matches, over any predicate
    assert {r.id for r in p.plan("^*(type=X)").collect()} == {"t"}
