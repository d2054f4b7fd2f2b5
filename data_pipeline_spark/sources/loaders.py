"""Dump loaders (S5/S6/S7): JSONL ingestion with pre-parse skip.

Reference behavior (process/base/loader.py:29-86 in /root/reference): stream
a gzipped JSONL dump, sniff the identifier from the RAW line before JSON
parsing, skip already-loaded records, then parse+upsert. The wikidata
variant (sources/general/wikidata/loader.py:39-103) adds slice parallelism
and a cheap property-line prefilter.

Spark restatement: ``spark.read.text`` keeps lines unparsed; the identifier
sniff is a pushed-down ``regexp_extract`` and the skip is a left-anti join
against existing keys — so fully-loaded files cost one column scan, never a
JSON parse. Only surviving lines hit ``from_json``. Slice parallelism is
native partitioning (S9); gzip is splittable per-file, so dumps should be
multi-file at scale (the reference's 24-way slices map to file splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the identifier sniff: first "id" (or configured key) field in the raw line
_DEFAULT_SNIFF = r'"id"\s*:\s*"([^"]+)"'


def sniff_new_records(
    lines: DataFrame,
    existing_keys: DataFrame | None,
    sniff_regex: str = _DEFAULT_SNIFF,
    prefilter: str | None = None,
) -> DataFrame:
    """lines(value) -> (identifier, value) for lines NOT already loaded.

    ``prefilter`` is a cheap raw-line regex dropped before anything else
    (the wikidata property-line filter P1); ``existing_keys(identifier)``
    is anti-joined — at scale that's a shuffle of keys only, the raw lines
    never move twice."""
    out = lines
    if prefilter:
        out = out.filter(~F.col("value").rlike(prefilter))
    out = out.select(
        F.regexp_extract("value", sniff_regex, 1).alias("identifier"), "value"
    ).filter(F.col("identifier") != "")
    if existing_keys is not None:
        out = out.join(existing_keys.select("identifier"), "identifier", "left_anti")
    return out


def load_jsonl_dump(
    spark: SparkSession,
    path: str,
    schema,
    existing_keys: DataFrame | None = None,
    sniff_regex: str = _DEFAULT_SNIFF,
    prefilter: str | None = None,
) -> DataFrame:
    """S5: gzipped/plain JSONL dump -> parsed records, skipping loaded ids.

    Returns (identifier, doc STRUCT, value raw-line). Corrupt lines
    surface as doc=NULL rows (PERMISSIVE) rather than failing the load,
    matching the reference's warn-and-continue (loader.py:63-66)."""
    lines = spark.read.text(path)
    fresh = sniff_new_records(lines, existing_keys, sniff_regex, prefilter)
    return fresh.withColumn("doc", F.from_json("value", schema))
