"""Record validation stage (SURVEY §1.4): schema enforcement + rule checks
emitting an ``errors ARRAY<STRING>`` column.

The reference optionally validates each record against per-class JSON
Schemas at acquire time and warns-but-continues
(process/validator.py:10-80, process/base/acquirer.py:58-86 in
/root/reference). Spark restatement: `from_json` already enforces the
structural schema (mistyped fields parse to NULL); this stage adds the
semantic rules as column expressions — no jsonschema library, no Python
loop, errors ride alongside the record so downstream stages can filter or
route to a quarantine sink without losing data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .envelope import with_doc

OK_RECORD_TYPES = (
    "HumanMadeObject", "Type", "Material", "Language", "Currency",
    "MeasurementUnit", "Person", "Group", "Set", "Place", "VisualItem",
    "LinguisticObject", "DigitalObject", "Activity", "Event", "Period",
)


def _rule(cond: Column, message: str) -> Column:
    return F.when(cond, F.lit(message))


def validate_records(records: DataFrame) -> DataFrame:
    """Attach ``errors: array<string>`` (empty = valid).

    Rules (the checks the reference's schemas + acquirer actually gate on):
    parseable document, id present, known class, type agrees with the
    envelope's rectype, names have content, equivalents carry ids."""
    docs = records if "doc" in records.columns else with_doc(records)
    # from_json is PERMISSIVE: malformed input yields an all-null struct,
    # NOT a null doc — so "unparseable" must probe the raw string with
    # try_parse_json (null doc still counts: null/absent data).
    unparseable = F.col("doc").isNull()
    if "data" in docs.columns:
        unparseable = unparseable | (
            F.col("data").isNotNull() & F.try_parse_json(F.col("data")).isNull()
        )
    checks = [
        _rule(unparseable, "unparseable document"),
        _rule(~unparseable & F.col("doc").isNotNull() & F.col("doc.id").isNull(), "missing id"),
        _rule(
            F.col("doc.type").isNotNull() & ~F.col("doc.type").isin(*OK_RECORD_TYPES),
            "unknown record type",
        ),
        _rule(
            F.col("doc.type").isNotNull()
            & F.col("rectype").isNotNull()
            & (F.col("doc.type") != F.col("rectype")),
            "type/rectype mismatch",
        ),
        _rule(
            F.exists(
                F.coalesce(F.col("doc.identified_by"), F.array()),
                lambda n: (n.type == "Name") & n.content.isNull(),
            ),
            "name without content",
        ),
        _rule(
            F.exists(
                F.coalesce(F.col("doc.equivalent"), F.array()),
                lambda e: e.id.isNull(),
            ),
            "equivalent without id",
        ),
    ]
    errors = F.filter(F.array(*checks), lambda x: x.isNotNull())
    return docs.withColumn("errors", errors)


def split_valid(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): route failed records to a side output instead
    of dropping them (the warn-and-continue contract)."""
    validated = records if "errors" in records.columns else validate_records(records)
    return (
        validated.filter(F.size("errors") == 0),
        validated.filter(F.size("errors") > 0),
    )
