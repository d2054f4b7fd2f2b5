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


def elect_primary_names(
    merged: DataFrame, llm_names: DataFrame | None = None
) -> DataFrame:
    """A8: (yuid, lang, primary_name) — one winner per (entity, language).

    Score: primaryName classification +5, then language priority, then
    shorter wins (acronym demotion: all-caps single tokens rank last),
    then lexical tiebreak — the ordering of final/mapper.py:617-646
    restated as one window.

    ``llm_names`` (output of llm_person_names) injects the LLM-parsed
    primary as an extra English primary-classified candidate with a
    prepend bonus: the reference PREPENDS the LLM name to identified_by
    (final/mapper.py:322-326) so it wins the en election over any
    existing primary — restated as a +6 score (beats the +5 primary
    class at equal language, loses to nothing it didn't already beat)."""
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
            F.lit(False).alias("is_llm"),
        )
    )
    if llm_names is not None:
        names = names.unionByName(
            llm_names.filter(F.col("llm_primary").isNotNull()).select(
                "yuid",
                F.col("llm_primary").alias("name"),
                F.lit("en").alias("lang_uri"),
                F.lit(True).alias("is_primary"),
                F.lit(True).alias("is_llm"),
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
    # The acronym demotion never applies to LLM-injected names: the
    # reference PREPENDS the LLM primary unconditionally
    # (final/mapper.py:322-326), so an all-caps LLM parse must still win
    # the en election rather than rank behind every existing primary.
    score = (
        F.when(F.col("is_primary"), 5).otherwise(0)
        + F.when(F.col("is_llm"), 6).otherwise(0)
        + lang_prio
        - F.when(is_acronym & ~F.col("is_llm"), 1000).otherwise(0)
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


# ---------------------------------------------------------------------------
# U5: LLM-parsed person-name enrichment (the concrete names-table form)
# ---------------------------------------------------------------------------

# JSONL rows of LLM parse results (final/index_loader.py:26-60 in
# /root/reference): lux_id + primary_name are the two lookup keys, the
# parsed_output struct is the LLM's structured answer.
LLM_NAMES_RAW_SCHEMA = (
    "lux_id string, primary_name string,"
    " parsed_output struct<first_name: string, last_name: string,"
    " middle_names: array<string>, middle_initials: array<string>,"
    " birth_year: int, death_year: int, titles: array<string>,"
    " extra_info: array<string>>"
)


def load_llm_names(spark, path: str) -> DataFrame:
    """U5 names-table loader (LlmNameIndexLoader.load): rows with a null
    parsed_output are the reference's 'bad' lines and are skipped; names
    over 498 chars lose their label key (the reference refuses to index
    them by name but keeps the lux_id key)."""
    raw = spark.read.schema(LLM_NAMES_RAW_SCHEMA).json(path)
    p = F.col("parsed_output")
    return raw.filter(p.isNotNull()).select(
        "lux_id",
        F.when(F.length("primary_name") <= 498, F.col("primary_name")).alias(
            "primary_name"
        ),
        p.getField("first_name").alias("first_name"),
        p.getField("last_name").alias("last_name"),
        p.getField("middle_names").alias("middle_names"),
        p.getField("middle_initials").alias("middle_initials"),
        p.getField("birth_year").alias("birth_year"),
        p.getField("death_year").alias("death_year"),
    )


def llm_person_names(merged: DataFrame, names: DataFrame) -> DataFrame:
    """U5 concrete form (final/mapper.py:239-360): for Person records,
    consult the LLM-parsed-names table — by yuid first, falling back to
    the record's first primary-classified name content — and build the
    two names the reference prepends:

      primary: "{first} {middle }{last}"           (en, primaryName)
      sort:    "{last}, {first} {middle }({birth}-{death})"  (en, sortName)

    middle = joined middle_names, else joined middle_initials (both
    reference fallbacks); a row missing first or last name produces NO
    names (the reference logs and skips).  Birth/death years become
    born/died timespans ONLY when the record does not already carry one
    (the reference's `if birth and "born" not in data`).  Null years are
    treated as absent (the reference's str(None) would render the literal
    'None' into the sort name — an artifact, not a semantic, so it is not
    reproduced).

    Returns one row per enriched Person: (yuid, llm_primary, llm_sort,
    born_begin, born_end, died_begin, died_end) — the name columns feed
    elect_primary_names(llm_names=...), the timespan columns are the
    born/died patches."""
    docs = with_doc(merged).filter(F.col("doc.type") == "Person")
    label = F.trim(
        F.try_element_at(
            F.filter(
                F.coalesce(F.col("doc.identified_by"), F.array()),
                lambda n: (n.type == "Name")
                & n.content.isNotNull()
                & F.exists(
                    F.coalesce(n.classified_as, F.array()),
                    lambda c: c.id.endswith("primaryName"),
                ),
            ),
            F.lit(1),
        ).getField("content")
    )
    base = docs.select(
        "yuid",
        label.alias("label"),
        F.col("doc.born").isNotNull().alias("has_born"),
        F.col("doc.died").isNotNull().alias("has_died"),
    )
    n_cols = [
        "first_name", "last_name", "middle_names", "middle_initials",
        "birth_year", "death_year",
    ]

    def one_per_key(df: DataFrame, key: str) -> DataFrame:
        """Deterministic row election on key collisions: the max of the
        remaining columns as a struct.  dropDuplicates would keep a
        partition-order-dependent arbitrary row; the reference's dict
        loader is last-line-wins — file order is gone in a DataFrame, so
        a content-total-order stands in, stable across runs."""
        others = [c for c in df.columns if c != key]
        return (
            df.groupBy(key)
            .agg(F.max(F.struct(*[F.col(c) for c in others])).alias("_s"))
            .select(key, *[F.col(f"_s.{c}").alias(c) for c in others])
        )

    by_id = base.join(
        F.broadcast(one_per_key(names, "lux_id")),
        base["yuid"] == F.col("lux_id"),
        "left",
    )
    hit = by_id.filter(F.col("lux_id").isNotNull()).select(
        "yuid", "has_born", "has_died", *n_cols
    )
    fallback = (
        by_id.filter(F.col("lux_id").isNull())
        .select("yuid", "label", "has_born", "has_died")
        .join(
            F.broadcast(
                one_per_key(
                    names.filter(F.col("primary_name").isNotNull()),
                    "primary_name",
                )
            ),
            F.col("label") == F.col("primary_name"),
        )
        .select("yuid", "has_born", "has_died", *n_cols)
    )
    m = hit.unionByName(fallback)

    first = F.coalesce(F.col("first_name"), F.lit(""))
    last = F.coalesce(F.col("last_name"), F.lit(""))
    mid_names = F.trim(F.concat_ws(" ", F.coalesce(F.col("middle_names"), F.array())))
    mid_inits = F.trim(
        F.concat_ws(" ", F.coalesce(F.col("middle_initials"), F.array()))
    )
    middle = F.when(mid_names != "", mid_names).otherwise(mid_inits)
    middle_sp = F.when(middle != "", F.concat(middle, F.lit(" "))).otherwise(F.lit(""))
    birth = F.coalesce(F.col("birth_year").cast("string"), F.lit(""))
    death = F.coalesce(F.col("death_year").cast("string"), F.lit(""))
    birthdeath = (
        F.when((birth != "") & (death != ""), F.concat(F.lit("("), birth, F.lit("-"), death, F.lit(")")))
        .when(birth != "", F.concat(F.lit("("), birth, F.lit("-)")))
        .when(death != "", F.concat(F.lit("(-"), death, F.lit(")")))
        .otherwise(F.lit(""))
    )
    valid = (first != "") & (last != "")
    llm_primary = F.when(
        valid, F.trim(F.concat(first, F.lit(" "), middle_sp, last))
    )
    llm_sort = F.when(
        valid,
        F.trim(F.concat(last, F.lit(", "), first, F.lit(" "), middle_sp, birthdeath)),
    )
    birth4 = F.lpad(birth, 4, "0")
    death4 = F.lpad(death, 4, "0")
    add_born = (birth != "") & ~F.col("has_born")
    add_died = (death != "") & ~F.col("has_died")
    return m.select(
        "yuid",
        llm_primary.alias("llm_primary"),
        llm_sort.alias("llm_sort"),
        F.when(add_born, F.concat(birth4, F.lit("-01-01T00:00:00"))).alias("born_begin"),
        F.when(add_born, F.concat(birth4, F.lit("-12-31T23:59:59"))).alias("born_end"),
        F.when(add_died, F.concat(death4, F.lit("-01-01T00:00:00"))).alias("died_begin"),
        F.when(add_died, F.concat(death4, F.lit("-12-31T23:59:59"))).alias("died_end"),
    )
