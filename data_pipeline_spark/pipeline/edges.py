"""Document -> relational extraction (SURVEY §2.9 X1/X2/X5).

The reference flattens every merged record into RDF-ish triples + facet
columns for its search layer (sources/lux/marklogic/mapper.py:195-846 in
/root/reference) and serializes N-Triples for QLever
(sources/lux/qlever/mapper2.py). Spark restatement: one typed parse, then
explode-based projections into ``edges(subject, predicate, object)`` — the
first-class queryable model (SURVEY §1.5) that the search DSL traverses —
plus a boolean/id facet table and a ``format_string`` NT serializer (K6).
Everything is built-in expressions: a single scan, whole-stage codegen,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .envelope import with_doc


def _ref_edges(docs: DataFrame, field: str, predicate: str) -> DataFrame:
    return (
        docs.select(
            F.col("yuid").alias("subject"),
            F.explode(F.coalesce(F.col(f"doc.{field}"), F.array())).alias("o"),
        )
        .filter(F.col("o.id").isNotNull())
        .select(
            "subject", F.lit(predicate).alias("predicate"), F.col("o.id").alias("object")
        )
    )


def extract_edges(merged: DataFrame) -> DataFrame:
    """merged(yuid, rectype, data) -> edges(subject, predicate, object).

    Predicate inventory (X1 subset, structured like mapper.py:238-846):
    rdf:type, classified_as, equivalent, member_of, part_of, broader,
    agentOfProduction / placeOfProduction shortcut edges."""
    docs = with_doc(merged)
    rdf_type = docs.select(
        F.col("yuid").alias("subject"),
        F.lit("rdf:type").alias("predicate"),
        F.col("rectype").alias("object"),
    ).filter(F.col("object").isNotNull())

    shortcut_agent = (
        docs.select(
            F.col("yuid").alias("subject"),
            F.explode(F.coalesce(F.col("doc.produced_by.carried_out_by"), F.array())).alias("o"),
        )
        .filter(F.col("o.id").isNotNull())
        .select("subject", F.lit("agentOfProduction").alias("predicate"), F.col("o.id").alias("object"))
    )
    shortcut_place = (
        docs.select(
            F.col("yuid").alias("subject"),
            F.explode(F.coalesce(F.col("doc.produced_by.took_place_at"), F.array())).alias("o"),
        )
        .filter(F.col("o.id").isNotNull())
        .select("subject", F.lit("placeOfProduction").alias("predicate"), F.col("o.id").alias("object"))
    )

    return (
        rdf_type.unionByName(_ref_edges(docs, "classified_as", "classified_as"))
        .unionByName(_ref_edges(docs, "equivalent", "equivalent"))
        .unionByName(_ref_edges(docs, "member_of", "member_of"))
        .unionByName(_ref_edges(docs, "part_of", "part_of"))
        .unionByName(_ref_edges(docs, "broader", "broader"))
        .unionByName(shortcut_agent)
        .unionByName(shortcut_place)
        .dropDuplicates(["subject", "predicate", "object"])
    )


def extract_facets(merged: DataFrame) -> DataFrame:
    """X2 facet columns (marklogic/mapper.py:248-845 analog): per-entity
    booleans/ids derived in one pass."""
    docs = with_doc(merged)
    return docs.select(
        "yuid",
        F.col("rectype").alias("dataType"),
        (F.size(F.coalesce(F.col("doc.identified_by"), F.array())) > 0).alias("hasName"),
        F.col("doc.defined_by").isNotNull().alias("hasGeometry"),
        (F.size(F.coalesce(F.col("doc.equivalent"), F.array())) > 0).alias("hasEquivalents"),
        F.size(F.coalesce(F.col("doc.referred_to_by"), F.array())).alias("nStatements"),
    )


def extract_names_table(merged: DataFrame) -> DataFrame:
    """names(yuid, name_clean): the queryable names relation (SURVEY §7.1)."""
    from ..functions.strings import clean_name

    docs = with_doc(merged)
    return (
        docs.select(
            "yuid",
            F.explode(F.coalesce(F.col("doc.identified_by"), F.array())).alias("nm"),
        )
        .filter((F.col("nm.type") == "Name") & F.col("nm.content").isNotNull())
        .select("yuid", clean_name(F.col("nm.content")).alias("name_clean"))
        .distinct()
    )


def to_ntriples(edges: DataFrame, base: str = "https://lux.example/ns/") -> DataFrame:
    """X5/K6: edges -> N-Triples lines (one string column `nt`), ready for
    ``df.write.text`` (manage-data.py:221-250 analog). URIs pass through;
    non-URI objects become typed literals."""
    is_uri = F.col("object").rlike("^https?://")
    obj = F.when(
        is_uri, F.format_string("<%s>", F.col("object"))
    ).otherwise(F.format_string('"%s"', F.regexp_replace(F.col("object"), '"', '\\\\"')))
    subj = F.when(
        F.col("subject").rlike("^https?://"),
        F.format_string("<%s>", F.col("subject")),
    ).otherwise(F.format_string("<urn:yuid:%s>", F.col("subject")))
    return edges.select(
        F.format_string(
            "%s <%s%s> %s .", subj, F.lit(base), F.col("predicate"), obj
        ).alias("nt")
    )
