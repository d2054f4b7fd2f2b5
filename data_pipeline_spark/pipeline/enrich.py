"""Enrichment joins + name election (SURVEY §2.4 J11/J12, §2.5 A8).

- Metatype enrichment (J12, sources/lux/final/mapper.py:678-711 in
  /root/reference): a record's classification URIs join a curated
  ``metatypes(concept_uri, metatype_uri)`` table; matches append to the
  record's classifications. The reference does this per record with an LMDB
  cache; here it is a broadcast join over exploded classifications.
- License/lookup enrichment (J11, final/mapper.py:63-159) uses the same
  shape — any (key -> subtree) table joined and spliced; ``enrich_lookup``
  is the generic form.
- Primary-name election (A8, final/mapper.py:366-646): exactly one primary
  name per (entity, language), scored (language priority, primary-class
  bonus, shortness) with deterministic tiebreaks — a window row_number,
  the reference's 280-line Python loop as one rank expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .envelope import with_doc

LANG_PRIORITY = {"en": 100, "es": 60, "fr": 55, "de": 50, "nl": 45, "zh": 40}


def metatype_edges(merged: DataFrame, metatypes: DataFrame) -> DataFrame:
    """(yuid, metatype_uri): metatype assignments via broadcast join of the
    exploded classified_as set against the curated concept->metatype map."""
    docs = with_doc(merged)
    cls = docs.select(
        "yuid", F.explode(F.coalesce(F.col("doc.classified_as"), F.array())).alias("c")
    ).select("yuid", F.col("c.id").alias("concept_uri"))
    return (
        cls.join(F.broadcast(metatypes), "concept_uri")
        .select("yuid", "metatype_uri")
        .distinct()
    )


def enrich_lookup(
    records: DataFrame, lookup: DataFrame, key_col: str, lookup_key: str
) -> DataFrame:
    """J11 generic form: left-join a bounded enrichment table (licenses,
    LLM-parsed names, ...) onto records by an extracted key. The lookup
    side broadcasts; records never shuffle."""
    return records.join(
        F.broadcast(lookup), records[key_col] == lookup[lookup_key], "left"
    )


def enrich_wikimedia_licenses(access_points: DataFrame, licenses: DataFrame) -> DataFrame:
    """Concrete J11 (sources/lux/final/mapper.py:63-159 in /root/reference):
    validate + license-enrich image access points.

    ``access_points(record_uri, ap_id)`` -> (record_uri, ap, license_uri):

    - wikimedia Special:FilePath URLs are normalized (F11) and joined to
      ``licenses(filename, license_uri)`` by canonical filename —
      broadcast (curated, bounded); a wikimedia image with NO license row
      is dropped (the reference's `if do: ... else: continue`);
    - yale.edu access points pass through license-less;
    - anything else is dropped ("Trash them as we can't validate
      licenses");
    - cropped-variant preference: when a record has a cropped wikimedia
      image, its uncropped base variant (strip 'cropped', '%28%29',
      '%5B%5D', '_.' -> '.') is removed (mapper.py:144-153)."""
    from ..functions.strings import normalize_wikimedia_url, wikimedia_filename

    ap = F.col("ap_id")
    is_wm = F.lower(ap).contains("commons.wikimedia.org/wiki/special:filepath")
    is_yale = F.lower(ap).contains("yale.edu")
    norm = (
        access_points.select(
            "record_uri",
            F.when(is_wm, normalize_wikimedia_url(ap)).otherwise(ap).alias("ap"),
            is_wm.alias("is_wm"),
        )
        .filter(is_wm | is_yale)
        .dropDuplicates(["record_uri", "ap"])
    )
    wm = (
        norm.filter(F.col("is_wm"))
        .withColumn("filename", wikimedia_filename(F.col("ap")))
        .join(F.broadcast(licenses), "filename")
        .select("record_uri", "ap", "license_uri")
    )
    other = norm.filter(~F.col("is_wm")).select(
        "record_uri", "ap", F.lit(None).cast("string").alias("license_uri")
    )
    kept = wm.unionByName(other)

    base_of_cropped = (
        wm.filter(F.col("ap").contains("cropped"))
        .select(
            "record_uri",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.regexp_replace(F.col("ap"), "cropped", ""), "%28%29", ""),
                    "%5B%5D",
                    "",
                ),
                r"_\.",
                ".",
            ).alias("ap"),
        )
        .distinct()
    )
    return kept.join(base_of_cropped, ["record_uri", "ap"], "left_anti")


def elect_primary_names(merged: DataFrame) -> DataFrame:
    """A8: (yuid, lang, primary_name) — one winner per (entity, language).

    Score: primaryName classification +5, then language priority, then
    shorter wins (acronym demotion: all-caps single tokens rank last),
    then lexical tiebreak — the ordering of final/mapper.py:617-646
    restated as one window."""
    docs = with_doc(merged)
    names = (
        docs.select(
            "yuid",
            F.explode(F.coalesce(F.col("doc.identified_by"), F.array())).alias("nm"),
        )
        .filter((F.col("nm.type") == "Name") & F.col("nm.content").isNotNull())
        .select(
            "yuid",
            F.col("nm.content").alias("name"),
            F.coalesce(
                F.element_at(F.col("nm.language"), 1).getField("id"), F.lit("und")
            ).alias("lang_uri"),
            F.exists(
                F.coalesce(F.col("nm.classified_as"), F.array()),
                lambda c: c.id.endswith("primaryName"),
            ).alias("is_primary"),
        )
    )
    # F15: URI tail -> ISO 639-1 (3-letter ISO 639-2 codes, both B and T
    # variants, map through the reference's lang_three_to_two table —
    # a bare 2-char regex would turn '/eng' into 'ng')
    from ..functions.strings import normalize_lang

    lang = normalize_lang(F.col("lang_uri"))
    lang_prio = F.lit(0)
    for code, p in LANG_PRIORITY.items():
        lang_prio = F.when(lang == code, F.lit(p)).otherwise(lang_prio)
    is_acronym = F.col("name").rlike(r"^[A-Z0-9.]+$")
    score = (
        F.when(F.col("is_primary"), 5).otherwise(0)
        + lang_prio
        - F.when(is_acronym, 1000).otherwise(0)
    )
    w = W.partitionBy("yuid", lang).orderBy(
        F.desc(score), F.length("name"), "name"
    )
    return (
        names.withColumn("lang", lang)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("yuid", "lang", F.col("name").alias("primary_name"))
    )
