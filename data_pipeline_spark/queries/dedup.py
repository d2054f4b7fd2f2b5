"""Scale-path deduplication operators: MinHash+LSH, SimHash, embedding
near-dup — each fully deterministic and oracle-checked.

Design note (the 100TB story): exact n-gram Jaccard (d06) self-joins the
full shingle inverted index — fine at small SF, quadratic in hot shingles
at scale. The MinHash/LSH pipeline here replaces that with a BOUNDED
candidate generation: 8 min-hash signatures per doc (one scan), banded into
4 two-row LSH buckets, so the only join is on (band, band_hash) — candidate
pairs are then verified with exact Jaccard computed ONLY for candidates.
Every primitive is an md5/substring expression available identically in
Spark and DuckDB (fixed-length lowercase hex compares like the number it
encodes), which is what makes the whole pipeline hash-verifiable across
engines — no RNG, no seed state.

The reference has no near-dup machinery (its dedupe family A3–A5/A9–A11 is
exact-key only, merger.py:750-898 in /root/reference); these operators are
the driver-mandated training-data-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query
from .text3 import _WS_SPLIT

N_SIGS = 8  # min-hash permutations
N_BANDS = 4  # bands of 2 rows each
ROWS_PER_BAND = N_SIGS // N_BANDS
JACCARD_T = 0.6


# ---------------------------------------------------------------------------
# shared Spark-side builders (used by the declared queries AND importable as
# library functions for arbitrary corpora)
# ---------------------------------------------------------------------------
_TIER_CACHE: dict[tuple[str, str, str, str, str], DataFrame] = {}


def _input_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Cheap identity of a tier's input table: (name, size, mtime_ns) of
    every file under <sf_dir>/<table>.parquet.  Regenerating testdata in
    place within one SparkSession changes the fingerprint and invalidates
    the memoized tiers instead of silently serving stale checkpoints."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    parts: list[str] = []
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, entry))
            parts.append(f"{entry}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts)


def clear_tier_cache() -> None:
    """Drop all memoized tiers (test-harness hook for in-place testdata
    regeneration; the checkpoint blocks are released with the refs)."""
    _TIER_CACHE.clear()


def _tier(
    spark: SparkSession, sf_dir: str, key: str, builder, table: str = "documents"
) -> DataFrame:
    """Session-scoped memo of a materialized (localCheckpoint) dedup tier.

    d07/d12/d13 are one pipeline staged as three queries: pairs build on
    candidates build on shingles.  In production each tier is a persisted
    table (SURVEY §7.1) that downstream stages READ, not recompute — this
    cache is the test-harness stand-in for that, keyed by application id
    (a new SparkContext never sees another context's checkpoint blocks)
    and by an input fingerprint (a testdata regen under the same path
    invalidates rather than serving stale tiers).  Every tier is a pure
    deterministic function of the input parquet (md5-based hashing, no
    RNG), so memoization cannot change results."""
    app = spark.sparkContext.applicationId
    fp = _input_fingerprint(sf_dir, table)
    # evict tiers of stopped contexts (their checkpoint blocks are gone;
    # keeping the DataFrames pins dead-session plan graphs) and of inputs
    # that changed under this sf_dir (stale data AND freed blocks) —
    # comparing fingerprints only within the SAME input table
    for stale in [
        k for k in _TIER_CACHE
        if k[0] != app or (k[1] == sf_dir and k[3] == table and k[4] != fp)
    ]:
        del _TIER_CACHE[stale]
    ck = (app, sf_dir, key, table, fp)
    df = _TIER_CACHE.get(ck)
    if df is None:
        df = builder().localCheckpoint()
        _TIER_CACHE[ck] = df
    return df


def _doc_arrays_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tier(
        spark, sf_dir, "doc_arrays",
        lambda: shingle_arrays_df(load_table(spark, sf_dir, "documents")),
    )


def _minhash_sigs_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc signature relation — ONE tier shared by the exact
    pairs family (d07/d12/d13) and the estimate tier (d33), so the
    shingle-explode + groupBy-min (the dominant md5 cost) runs once per
    session however the tiers compose."""
    def build() -> DataFrame:
        da = _doc_arrays_tier(spark, sf_dir)
        return minhash_signatures(da.select("id", F.explode("sh").alias("shingle")))

    return _tier(spark, sf_dir, "minhash_sigs", build)


def _verified_pairs_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-verified near-dup pairs: the tier d07 emits and d12/d13
    consume.

    Shuffle economics (r5 rewrite): per-doc shingle dedup is ROW-LOCAL
    (array_distinct), so the signature groupBy's partial aggregation
    combines each doc map-side and the exchange carries ~n_docs rows of
    partial mins instead of the full shingle relation — the previous
    explode->distinct->groupBy shape shuffled every shingle twice.
    Verification intersects the two docs' shingle ARRAYS per candidate
    pair (array_intersect, a JVM collection expression) instead of
    double-shuffling the exploded shingle index."""

    def build() -> DataFrame:
        da = _doc_arrays_tier(spark, sf_dir)
        sigs = _minhash_sigs_tier(spark, sf_dir)
        return verified_pairs_from_arrays(da, lsh_candidates(sigs), JACCARD_T)

    return _tier(spark, sf_dir, "pairs", build)


def shingle_arrays_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, sh): distinct 3-word shingles per document as a row-local
    array — set-identical to exploding + distinct (pinned by the
    unchanged DuckDB oracles), but the dedup costs no shuffle."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), _WS_SPLIT)
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                )
            ).alias("sh"),
        )
    )


def shingles_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle): distinct 3-word shingles per document (exploded
    library form — the streaming dedup path joins new docs' shingles
    against an accumulated index, so it needs the row relation).

    The global distinct is REQUIRED here even though shingle arrays are
    already row-locally deduped: an at-least-once feed can deliver the
    same doc_id twice in one batch, and the streaming consumer's
    count-based Jaccard (and its persisted index) would silently break
    on duplicated (id, shingle) rows (caught by review after the r5 tier
    rewrite dropped it)."""
    return (
        shingle_arrays_df(docs, id_col, text_col)
        .select("id", F.explode("sh").alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(id, s0..s{N_SIGS-1}): per-doc min-hash signature. One scan, one
    groupBy. Hash economy: one md5 yields four independent 8-hex-char
    permutation values (32 hex chars / 8), so 8 signatures cost 2 md5
    calls per shingle, not 8 — at 100TB the md5 work dominates this stage."""
    salted = [F.md5(F.col("shingle")), F.md5(F.concat(F.lit("x:"), F.col("shingle")))]
    mins = [
        F.min(F.substring(salted[i // 4], (i % 4) * 8 + 1, 8)).alias(f"s{i}")
        for i in range(N_SIGS)
    ]
    return shingles.groupBy("id").agg(*mins)


def band_hash_cols() -> list:
    """The N_BANDS band-hash expressions over a signature relation's
    s0..s{N_SIGS-1} columns — THE bucket-key construction, shared by
    bands_df (streaming index), lsh_candidates (batch join) and any
    future consumer, so the keys cannot drift."""
    return [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"s{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
            )
        )
        for b in range(N_BANDS)
    ]


def bands_df(sigs: DataFrame) -> DataFrame:
    """(id, band, bh): the LSH band keys of a signature relation — built
    from band_hash_cols, the ONE bucket-key construction both the batch
    candidate join and the streaming index (streaming/dedup_stream.py)
    share, so their keys cannot drift.

    The band fan-out is one explode of an inline struct array, not an
    N_BANDS-way unionAll: a union compiles one codegen class per branch
    per join side (8 here) and the one-time janino cost dominated the
    cold query wall-clock (measured on d08, same shape); the explode is
    a single compiled stage with identical rows."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bh.alias("bh"))
                    for b, bh in enumerate(band_hash_cols())
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def lsh_candidates(sigs: DataFrame) -> DataFrame:
    """(id_a, id_b): pairs sharing >=1 LSH band bucket, each emitted
    EXACTLY ONCE — from its first shared band — so there is no
    ``.distinct()`` exchange after the band join (the r5 shape shuffled
    the candidate volume a second time; on a near-identical corpus most
    qualifying pairs share all 4 bands, so that distinct processed the
    result 2-4x over).  Same trick as simhash_candidates: each side
    carries its full band-hash array (4 x 32 hex chars), and the join
    keeps band s only when every band t < s differs between the two docs
    — static per-band conjunctions, fully codegen.  Emission set is
    identical to the distinct form (pinned by the unchanged oracle)."""
    bh = band_hash_cols()
    bands = sigs.select(
        "id", F.array(*bh).alias("bhs"), F.posexplode(F.array(*bh)).alias("band", "bh")
    )
    a, b_ = bands.alias("a"), bands.alias("b")
    differs = [F.col("a.bhs")[t] != F.col("b.bhs")[t] for t in range(N_BANDS)]
    first_match = F.lit(False)
    for s in range(N_BANDS - 1, -1, -1):
        earlier_all_differ = F.lit(True)
        for t in range(s):
            earlier_all_differ = earlier_all_differ & differs[t]
        first_match = F.when(F.col("a.band") == s, earlier_all_differ).otherwise(first_match)
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(first_match)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )


def lsh_candidates_capped(sigs: DataFrame, bucket_cap: int = 64) -> DataFrame:
    """LSH candidates with a HARD per-bucket quadratic bound — the
    mega-family guard (VERDICT r9 #5).  A pathological near-dup family of
    B documents lands ALL of them in the same band buckets, so the plain
    band join emits B(B-1)/2 pairs (100k family = 5e9 pairs from one
    bucket).  This variant splits every over-cap bucket the way the
    semantic tier's capped_assignment does (operators/similarity.py:126):
    row_number over (md5(id), id) within the bucket, mod ceil(n/cap) —
    deterministic and EXACT (every sub-bucket holds at most ``bucket_cap``
    ids by construction), applied BEFORE the pair join so the quadratic
    stage never sees an unsplit bucket.  Per-bucket output is bounded by
    ceil(n/cap) * cap^2/2 — LINEAR in n at fixed cap.

    Connectivity contract (what the downstream CC consumers — d36's
    corpus clean, d12's dedup groups — actually need): each sub-bucket's
    minimum id is linked to the bucket minimum, so any two docs of a
    split bucket stay CC-connected through the spine IF the linking pairs
    survive verification.  For a genuine near-dup family they do (every
    member is near-dup with every other); for a hash-collision bucket of
    UNRELATED docs the spine edges fail verify exactly like the plain
    join's pairs would.  Pairs are a SUBSET of the uncapped candidate set
    plus the spine (property-tested in tests/test_scale_paths.py); the
    first-shared-band single-emission trick does not survive splitting
    (a pair suppressed in band s by the split may legally re-match in
    band t), so this path dedupes with a distinct over the now-bounded
    volume."""
    bh = band_hash_cols()
    bands = sigs.select("id", F.posexplode(F.array(*bh)).alias("band", "bh"))
    wb = Window.partitionBy("band", "bh")
    wo = wb.orderBy(F.md5(F.col("id").cast("string")), "id")
    split = bands.select(
        "id", "band", "bh",
        (
            (F.row_number().over(wo) - 1)
            % F.ceil(
                F.count(F.lit(1)).over(wb).cast("double") / bucket_cap
            ).cast("bigint")
        ).alias("sub"),
    )
    a = split.select("band", "bh", "sub", F.col("id").alias("id_a"))
    b = split.select("band", "bh", "sub", F.col("id").alias("id_b"))
    pairs = (
        a.join(b, ["band", "bh", "sub"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    sub_mins = split.groupBy("band", "bh", "sub").agg(F.min("id").alias("sid"))
    spine = (
        sub_mins.withColumn(
            "bmin", F.min("sid").over(Window.partitionBy("band", "bh"))
        )
        .filter(F.col("sid") != F.col("bmin"))
        .select(
            F.least("sid", "bmin").alias("id_a"),
            F.greatest("sid", "bmin").alias("id_b"),
        )
    )
    return pairs.unionByName(spine).distinct()


def tiered_pairs_capped(docs: DataFrame, bucket_cap: int = 64) -> DataFrame:
    """The d35 layered verify over the CAPPED candidate set — the hot-
    bucket route for corpora with mega near-dup families.  Identical
    estimate/borderline/exact thresholds (tiered_pairs_from), only the
    candidate generation differs."""
    da = shingle_arrays_df(docs)
    sigs = minhash_signatures(da.select("id", F.explode("sh").alias("shingle")))
    cands = lsh_candidates_capped(sigs, bucket_cap)
    return tiered_pairs_from(da, signature_estimate_pairs(sigs, cands))


def verified_pairs_from_arrays(
    doc_sh: DataFrame, candidates: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidates only, via array_intersect on the two
    docs' shingle arrays: two candidate-bounded equi-joins (the small
    candidate side broadcasts under AQE) and a row-local set intersect —
    no shuffle of the shingle relation at all.  Arrays are already
    distinct, so size(array_intersect) IS the set intersection size."""
    a = doc_sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = doc_sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    n_both = F.size(F.array_intersect("sh_a", "sh_b"))
    denom = F.size("sh_a") + F.size("sh_b") - n_both
    jac = F.round(n_both.cast("double") / denom, 6)
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# oracle SQL generators (same constructions in DuckDB dialect)
# ---------------------------------------------------------------------------
def _shingles_sql(src: str = "documents") -> str:
    """The 3-word-shingle CTE over any (doc_id, text) relation — ``src``
    parameterized so the d41 composed build can shingle the substring-
    CLEANED text with the same construction the raw-document oracles
    pin."""
    return f"""
    shingles AS (
        SELECT DISTINCT doc_id AS id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
            FROM (SELECT doc_id,
                         regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\f\r]+') AS toks
                  FROM {src})
            WHERE len(toks) >= 3
        )
    )
"""


_SHINGLES_SQL = _shingles_sql()


def _sig_sql() -> str:
    def src(i: int) -> str:
        return "md5(shingle)" if i < 4 else "md5('x:' || shingle)"

    mins = ",\n               ".join(
        f"MIN(substr({src(i)}, {(i % 4) * 8 + 1}, 8)) AS s{i}" for i in range(N_SIGS)
    )
    return f"sigs AS (SELECT id, {mins} FROM shingles GROUP BY id)"


def _bands_sql() -> str:
    parts = []
    for b in range(N_BANDS):
        cols = " || '|' || ".join(f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        parts.append(f"SELECT id, {b} AS band, md5({cols}) AS bh FROM sigs")
    return "bands AS (" + " UNION ALL ".join(parts) + ")"


MINHASH_ORACLE = f"""
    WITH {_SHINGLES_SQL},
    {_sig_sql()},
    {_bands_sql()},
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM shingles GROUP BY id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_both
        FROM cands c
        JOIN shingles sa ON c.id_a = sa.id
        JOIN shingles sb ON c.id_b = sb.id AND sa.shingle = sb.shingle
        GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b,
           ROUND(CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both), 6) AS jaccard
    FROM inter JOIN sizes na ON id_a = na.id
               JOIN sizes nb ON id_b = nb.id
    WHERE ROUND(CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both), 6) >= {JACCARD_T}
"""


@query("d07_minhash_lsh_pairs", oracle=MINHASH_ORACLE, survey="dedup-minhash-lsh")
def d07_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection, verified: shingle -> 8 signature
    mins -> 4 LSH bands -> bucket join -> exact Jaccard on candidates only.
    At 100TB the band join touches ~n_docs*4 rows instead of the shingle
    index square; everything is md5/substr inside whole-stage codegen."""
    # shingles feed signatures, sizes and both sides of the intersection
    # join (4 subtree reuses); localCheckpoint materializes the tier once
    # — measured 2.4s -> 1.9s at sf0.1 (r1's "recompute beats cache" was
    # about .cache()'s block-store read path, not checkpointing).
    return _verified_pairs_tier(spark, sf_dir)


DEDUP_GROUPS_ORACLE = f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_sig_sql()},
    {_bands_sql()},
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM shingles GROUP BY id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_both
        FROM cands c
        JOIN shingles sa ON c.id_a = sa.id
        JOIN shingles sb ON c.id_b = sb.id AND sa.shingle = sb.shingle
        GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes na ON id_a = na.id JOIN sizes nb ON id_b = nb.id
        WHERE ROUND(CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both), 6) >= {JACCARD_T}
    ),
    sym AS (SELECT id_a AS s, id_b AS d FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    walk(node, label) AS (
        SELECT s, s FROM sym
        UNION
        SELECT e.d, w.label FROM walk w JOIN sym e ON w.node = e.s
        WHERE w.label < e.d
    )
    SELECT node AS doc_id, MIN(label) AS keeper_doc_id
    FROM walk GROUP BY node
"""


@query("d12_dedup_groups", oracle=DEDUP_GROUPS_ORACLE, survey="dedup-groups,J5,J7")
def d12_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION: LSH-verified near-dup pairs -> connected
    components -> one keeper per group (min doc_id). This is the full
    corpus-cleaning composition — candidate generation, verification,
    transitive grouping — each stage the scale-path form, pinned against a
    recursive-CTE oracle."""
    from ..pipeline.closure import connected_components

    pairs = _verified_pairs_tier(spark, sf_dir)
    comps = connected_components(pairs.select("id_a", "id_b"), src="id_a", dst="id_b")
    return comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("keeper_doc_id")
    )


CORPUS_CLEAN_ORACLE = f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_sig_sql()},
    {_bands_sql()},
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM shingles GROUP BY id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_both
        FROM cands c
        JOIN shingles sa ON c.id_a = sa.id
        JOIN shingles sb ON c.id_b = sb.id AND sa.shingle = sb.shingle
        GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes na ON id_a = na.id JOIN sizes nb ON id_b = nb.id
        WHERE ROUND(CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both), 6) >= {JACCARD_T}
    ),
    sym AS (SELECT id_a AS s, id_b AS d FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    walk(node, label) AS (
        SELECT s, s FROM sym
        UNION
        SELECT e.d, w.label FROM walk w JOIN sym e ON w.node = e.s
        WHERE w.label < e.d
    ),
    groups AS (SELECT node AS doc_id, MIN(label) AS keeper FROM walk GROUP BY node),
    quality AS (
        SELECT doc_id FROM (
          SELECT doc_id,
                 len(regexp_split_to_array(trim(text, ' '), '[ \t\n\f\r]+')) AS n_tokens,
                 len(list_filter(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\f\r]+'),
                                 t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop
          FROM documents
        ) WHERE n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5
    )
    SELECT q.doc_id FROM quality q
    LEFT JOIN groups g ON q.doc_id = g.doc_id
    WHERE g.doc_id IS NULL OR g.keeper = q.doc_id
"""


@query("d13_corpus_clean", oracle=CORPUS_CLEAN_ORACLE, survey="dedup-groups,quality-score")
def d13_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-cleaning pipeline: quality gate (length + stopword
    ratio) AND near-dup removal (keep only group keepers). What a 100TB
    training-data prep job actually runs — every stage is the scale-path
    form; the only materialization is the shingle tier (reused by 4
    subtrees — a persisted table in production)."""
    from ..pipeline.closure import connected_components

    docs = load_table(spark, sf_dir, "documents")

    toks = F.split(F.trim(F.col("text")), _WS_SPLIT)
    low_toks = F.split(F.lower(F.trim(F.col("text"))), _WS_SPLIT)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(low_toks, lambda t: t.isin("the", "a", "of", "and")))
    quality = docs.filter(
        (n_tokens >= 20) & ((n_stop.cast("double") / n_tokens) < 0.5)
    ).select("doc_id")

    pairs = _verified_pairs_tier(spark, sf_dir)
    groups = connected_components(
        pairs.select("id_a", "id_b"), src="id_a", dst="id_b"
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("keeper"))

    return (
        quality.join(groups, "doc_id", "left")
        .filter(F.col("keeper").isNull() | (F.col("keeper") == F.col("doc_id")))
        .select("doc_id")
    )


EST_T = 0.5  # signature-agreement threshold for the estimate tier

_EST_AGREE = " + ".join(
    f"(CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END)" for i in range(N_SIGS)
)

MINHASH_ESTIMATE_ORACLE = f"""
    WITH {_SHINGLES_SQL},
    {_sig_sql()},
    {_bands_sql()},
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
    )
    SELECT c.id_a, c.id_b,
           CAST(({_EST_AGREE}) AS DOUBLE) / {N_SIGS} AS est_jaccard
    FROM cands c
    JOIN sigs a ON c.id_a = a.id
    JOIN sigs b ON c.id_b = b.id
    WHERE CAST(({_EST_AGREE}) AS DOUBLE) / {N_SIGS} >= {EST_T}
"""


@query(
    "d33_minhash_estimate_pairs",
    oracle=MINHASH_ESTIMATE_ORACLE,
    survey="dedup-minhash-lsh",
)
def d33_minhash_estimate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs with ESTIMATED Jaccard — the verify-free tier for
    the regime the 30x scaling run exposed (SCALE.md round 6): d07's
    exact verification must carry each candidate's shingle ARRAYS
    (KBs/doc) through a shuffle, so at dense near-dup multiplicity the
    verify exchange dominates.  Here similarity is the signature
    agreement fraction — the estimator MinHash signatures exist for —
    so the candidate join carries 8 fixed 8-hex values (64 bytes) per
    side regardless of document size.  Standard 100TB practice: run
    this tier first, exact-verify (d07) only borderline pairs.
    Deterministic end-to-end (md5 signatures), hash-oracled.

    The estimate relation itself is the shared ``est_pairs`` tier
    (_estimate_pairs_tier) that d35's layered verify also reads — d33
    is the tier filtered at EST_T, so the estimator has exactly one
    definition and a session running both queries computes it once."""
    return _estimate_pairs_tier(spark, sf_dir).filter(
        F.col("est_jaccard") >= EST_T
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit, word-level)
# ---------------------------------------------------------------------------
N_BITS = 32
HAMMING_T = 3


def simhash_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): 32-bit word-level SimHash. Bit j of a word's md5-hex
    prefix votes +1/-1; the sign of each bit-sum forms the fingerprint.
    32 bits (not 16): at 100TB the fingerprint must discriminate — a
    16-bit hash leaves only 16 values per 4-bit band, so candidate
    buckets grow quadratically dense; 8-bit bands give 256 values and
    ~16x sparser buckets for the same pigeonhole-exact guarantee."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), _WS_SPLIT)
    # Per-doc word dedup is ROW-LOCAL (array_distinct) so the 32-sum
    # groupBy fully combines each doc map-side — the exchange carries
    # ~n_docs partial rows, not the word relation.  The previous
    # explode -> distinct -> groupBy shape shuffled every (id, word) row
    # twice; measured 6.3s -> ~1.5s tier build at sf0.1.  (A pure
    # higher-order-function form — aggregate() with an array accumulator,
    # no explode at all — measured 3x SLOWER than this: lambda HOFs run
    # interpreted per element, outside whole-stage codegen, while
    # explode + md5 + partial agg stay codegen end-to-end.)
    words = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(F.array_remove(toks, ""))).alias("w"),
        )
        # one hex->long conversion per word; bits extract with integer
        # shift/mask instead of 32 per-row substring+conv string ops
        # (measured ~15% off the tier build at sf0.1)
        .withColumn("v", F.conv(F.substring(F.md5(F.col("w")), 1, N_BITS // 4), 16, 10).cast("long"))
    )
    # Packed accumulators (r16 opt, VERDICT r15 #7): two 32-bit ones-counts
    # per long instead of 32 separate ±1 sums — halves the aggregation
    # buffer (33 -> 17 slots) and the partial rows crossing the exchange.
    # Exact sign equivalence: the old vote sum is 2*ones_j - n_words, so
    # b_j > 0  <=>  2*ones_j > n_words; counts are integers, no rounding.
    # 32-bit fields cannot overflow (ones <= distinct words per doc < 2^31)
    # and the long sum stays under 2^63 for any doc below ~2e9 words.
    sums = []
    for p in range(N_BITS // 2):
        bit_lo = F.shiftright(F.col("v"), N_BITS - 1 - 2 * p).bitwiseAND(F.lit(1))
        bit_hi = F.shiftright(F.col("v"), N_BITS - 2 - 2 * p).bitwiseAND(F.lit(1))
        sums.append(F.sum(bit_lo + F.shiftleft(bit_hi, 32)).alias(f"p{p}"))
    sums.append(F.count(F.lit(1)).alias("nw"))
    agg = words.groupBy("id").agg(*sums)
    # flat shift-add, not a 32-branch CASE chain: the deep when/otherwise
    # tree cost ~2.5s of one-time janino compilation per session
    # (measured); boolean-cast + shiftleft compiles in half the time and
    # evaluates identically (2*ones_j > n_words -> bit j set)
    sim = None
    for j in range(N_BITS):
        ones = F.shiftright(F.col(f"p{j // 2}"), 32 * (j % 2)).bitwiseAND(
            F.lit(0xFFFFFFFF)
        )
        term = F.shiftleft((ones * 2 > F.col("nw")).cast("long"), j)
        sim = term if sim is None else sim + term
    return agg.select("id", sim.cast("bigint").alias("simhash"))


def _simhash_sql() -> str:
    digit = lambda j: f"(strpos('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1)"
    bit = lambda j: f"(CAST(floor({digit(j)} / {2 ** (3 - j % 4)}) AS BIGINT) % 2)"
    sums = ", ".join(f"SUM({bit(j)} * 2 - 1) AS b{j}" for j in range(N_BITS))
    val = " + ".join(f"CASE WHEN b{j} > 0 THEN {2**j} ELSE 0 END" for j in range(N_BITS))
    return f"""
    words AS (
        SELECT DISTINCT doc_id AS id, w FROM (
            SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\f\r]+')) AS w
            FROM documents) WHERE w <> ''
    ),
    hashed AS (SELECT id, substr(md5(w), 1, {N_BITS // 4}) AS h FROM words),
    agg AS (SELECT id, {sums} FROM hashed GROUP BY id),
    sims AS (SELECT id, CAST({val} AS BIGINT) AS simhash FROM agg)
    """


SIMHASH_ORACLE = f"""
    WITH {_simhash_sql()}
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sims a JOIN sims b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
"""


N_SEGMENTS = 4  # 32 bits -> 4 segments of 8 bits; Hamming<=3 => >=1 equal


def simhash_candidates(sims: DataFrame) -> DataFrame:
    """(id_a, id_b, hamming): verified near-dup pairs via segment banding.
    EXACT for Hamming <= 3 by pigeonhole — 3 differing bits cannot touch
    all 4 segments, so every qualifying pair shares >=1 (segment_idx,
    segment_value) bucket — identical results to the all-pairs form while
    the only join key is the bucket: ~n*4 rows each side, never a theta
    self-join. 8-bit segments keep buckets sparse (256 values each)."""
    seg_bits = N_BITS // N_SEGMENTS
    # one explode, not an N_SEGMENTS-way unionAll — see lsh_candidates on
    # why (union branches each compile their own codegen class; the
    # one-time compile cost dominated this query's cold wall-clock)
    segs = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        (F.shiftright(F.col("simhash"), seg_bits * s) % (2**seg_bits)).alias(
                            "segval"
                        ),
                    )
                    for s in range(N_SEGMENTS)
                ]
            )
        ).alias("sv"),
    ).select("id", "simhash", F.col("sv.seg").alias("seg"), F.col("sv.segval").alias("segval"))
    a, b = segs.alias("a"), segs.alias("b")
    # Hamming verify INSIDE the candidate select: bit_count + filter in
    # codegen, never a shuffle.  Each surviving pair is emitted EXACTLY
    # ONCE — from its first shared segment (the filter keeps segment s
    # only when no segment t < s also matches, computable from the two
    # fingerprints alone) — so there is no .distinct() exchange at all.
    # A near-identical corpus makes this matter: at sf0.1 most qualifying
    # pairs share all 4 segments, so the old distinct processed the
    # result volume 2-4x over.
    hamming = F.bit_count(F.expr("a.simhash ^ b.simhash"))
    xor = F.expr("a.simhash ^ b.simhash")
    seg_differs = [
        (F.shiftright(xor, t * seg_bits) % (2**seg_bits)) != 0
        for t in range(N_SEGMENTS)
    ]
    # "no segment before this one also matched" — static per-segment
    # conjunctions, fully codegen (the joined segment itself matches by
    # the equi-join condition)
    first_match = F.lit(False)
    for s in range(N_SEGMENTS - 1, -1, -1):
        earlier_all_differ = F.lit(True)
        for t in range(s):
            earlier_all_differ = earlier_all_differ & seg_differs[t]
        first_match = F.when(F.col("a.seg") == s, earlier_all_differ).otherwise(first_match)
    return (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.segval") == F.col("b.segval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(first_match)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_T)
    )


@query("d08_simhash_pairs", oracle=SIMHASH_ORACLE, survey="dedup-simhash")
def d08_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 32-bit fingerprints, Hamming distance <= 3.
    Scale path: segment-banded candidate join (pigeonhole-exact superset,
    see simhash_candidates) + Hamming verify on candidates only — same
    results as the all-pairs oracle, no O(n^2) self-join in the plan.

    The fingerprint tier is materialized once (localCheckpoint via the
    session tier cache): the banded union references sims 4x per side and
    Catalyst does not CSE across union branches — without this, the
    word-explode aggregation runs 8x (measured). At 100TB the fingerprint
    tier is a persisted table, which is exactly this shape."""
    sims = _tier(
        spark, sf_dir, "simhash",
        lambda: simhash_df(load_table(spark, sf_dir, "documents")),
    )
    return simhash_candidates(sims)


# ---------------------------------------------------------------------------
# SimHash, 64-bit — the production fingerprint width (SCALE.md round 6:
# 8-bit segments over a 32-bit hash concentrated 55% of a template corpus
# into one bucket; 16-bit segments over 64 bits re-sparsify)
# ---------------------------------------------------------------------------
N_BITS64 = 64
SEG64 = 4  # 16-bit segments; Hamming <= 3 => >= 1 equal (pigeonhole)


def simhash64_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): 64-bit word-level SimHash — same construction as
    simhash_df but over the first 16 md5 hex chars, assembled from two
    32-bit conv() words (a single 16-hex conv overflows BIGINT's signed
    range and nulls out).  Bit 63's shift-add term is Long.MIN — the
    fingerprint is the two's-complement 64-bit value, identical in
    DuckDB (bit_count/xor verified two's-complement there)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), _WS_SPLIT)
    h = F.md5(F.col("w"))
    words = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(F.array_remove(toks, ""))).alias("w"),
        )
        .select(
            "id",
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("v0"),
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("v1"),
        )
    )
    # same packed-accumulator shape as simhash_df (r16): 64 ±1 sums ->
    # 32 packed ones-count longs + one word count, exact sign equivalence
    def bit_at(j: int):
        word = F.col("v0") if j < 32 else F.col("v1")
        return F.shiftright(word, 31 - j % 32).bitwiseAND(F.lit(1))

    sums = []
    for p in range(N_BITS64 // 2):
        sums.append(
            F.sum(bit_at(2 * p) + F.shiftleft(bit_at(2 * p + 1), 32)).alias(f"p{p}")
        )
    sums.append(F.count(F.lit(1)).alias("nw"))
    agg = words.groupBy("id").agg(*sums)
    sim = None
    for j in range(N_BITS64):
        ones = F.shiftright(F.col(f"p{j // 2}"), 32 * (j % 2)).bitwiseAND(
            F.lit(0xFFFFFFFF)
        )
        term = F.shiftleft((ones * 2 > F.col("nw")).cast("long"), j)
        sim = term if sim is None else sim + term
    return agg.select("id", sim.cast("bigint").alias("simhash"))


def _simhash64_sql(src: str = "documents") -> str:
    digit = lambda j: f"(strpos('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1)"
    bit = lambda j: f"(CAST(floor({digit(j)} / {2 ** (3 - j % 4)}) AS BIGINT) % 2)"
    sums = ", ".join(f"SUM({bit(j)} * 2 - 1) AS b{j}" for j in range(N_BITS64))
    terms = [
        f"CASE WHEN b{j} > 0 THEN {2**j if j < 63 else '(-9223372036854775807 - 1)'} ELSE 0 END"
        for j in range(N_BITS64)
    ]
    val = " + ".join(terms)
    return f"""
    words AS (
        SELECT DISTINCT doc_id AS id, w FROM (
            SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\f\r]+')) AS w
            FROM {src}) WHERE w <> ''
    ),
    hashed AS (SELECT id, substr(md5(w), 1, {N_BITS64 // 4}) AS h FROM words),
    agg AS (SELECT id, {sums} FROM hashed GROUP BY id),
    sims AS (SELECT id, CAST({val} AS BIGINT) AS simhash FROM agg)
    """


SIMHASH64_ORACLE = f"""
    WITH {_simhash64_sql()}
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sims a JOIN sims b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
"""


def simhash64_candidates(sims: DataFrame) -> DataFrame:
    """simhash_candidates for 64-bit fingerprints: 16-bit segment
    banding (pigeonhole-exact for Hamming <= 3), first-shared-segment
    single emission.  Segment values extract with shiftrightunsigned +
    mask — plain shiftright/% would sign-extend fingerprints with bit 63
    set into negative segment values."""
    seg_bits = N_BITS64 // SEG64
    mask = F.lit((1 << seg_bits) - 1)
    segs = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftrightunsigned(F.col("simhash"), seg_bits * s)
                        .bitwiseAND(mask)
                        .alias("segval"),
                    )
                    for s in range(SEG64)
                ]
            )
        ).alias("sv"),
    ).select("id", "simhash", F.col("sv.seg").alias("seg"), F.col("sv.segval").alias("segval"))
    a, b = segs.alias("a"), segs.alias("b")
    hamming = F.bit_count(F.expr("a.simhash ^ b.simhash"))
    xor = F.expr("a.simhash ^ b.simhash")
    seg_differs = [
        F.shiftrightunsigned(xor, t * seg_bits).bitwiseAND(mask) != 0
        for t in range(SEG64)
    ]
    first_match = F.lit(False)
    for s in range(SEG64 - 1, -1, -1):
        earlier_all_differ = F.lit(True)
        for t in range(s):
            earlier_all_differ = earlier_all_differ & seg_differs[t]
        first_match = F.when(F.col("a.seg") == s, earlier_all_differ).otherwise(first_match)
    return (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.segval") == F.col("b.segval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(first_match)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_T)
    )


@query("d34_simhash64_pairs", oracle=SIMHASH64_ORACLE, survey="dedup-simhash")
def d34_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs, Hamming <= 3 — the production
    fingerprint width: 16-bit segments give 65,536 values per band, so
    the template-corpus concentration that piled 55% of 32-bit
    fingerprints into one 8-bit segment bucket (SCALE.md round 6)
    re-sparsifies, and Hamming<=3 classes shrink to genuine near-dups.
    Same pigeonhole-exact banding + single-emission shape as d08."""
    sims = _tier(
        spark, sf_dir, "simhash64",
        lambda: simhash64_df(load_table(spark, sf_dir, "documents")),
    )
    return simhash64_candidates(sims)


SIMHASH_GROUPS_ORACLE = f"""
    WITH {_simhash_sql()}
    SELECT id AS doc_id,
           MIN(id) OVER (PARTITION BY simhash) AS keeper_doc_id
    FROM sims
"""


@query(
    "d32_simhash_groups", oracle=SIMHASH_GROUPS_ORACLE, survey="dedup-simhash,dedup-groups"
)
def d32_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-fingerprint SimHash grouping: every document keyed to the
    min doc_id of its 32-bit fingerprint class — the LINEAR-OUTPUT dedup
    action for the dense-corpus regime the 30x scaling run exposed
    (SCALE.md round 6): when near-dup classes are large, the d08 pairs
    relation is O(class^2) BY NATURE, while this grouping stays one
    window over one shuffle at any density.  Exact-simhash match is the
    word-order-robust middle ground between d02's exact text fingerprint
    and d08's Hamming<=3 pairs.  Shares d08's fingerprint tier."""
    sims = _tier(
        spark, sf_dir, "simhash",
        lambda: simhash_df(load_table(spark, sf_dir, "documents")),
    )
    from pyspark.sql import Window as W

    return sims.select(
        F.col("id").alias("doc_id"),
        F.min("id").over(W.partitionBy("simhash")).alias("keeper_doc_id"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------
COS_T = 0.45

_COS = """
    list_sum(list_transform(range(1, len(a.emb) + 1), i -> a.emb[i] * b.emb[i]))
    / (sqrt(list_sum(list_transform(a.emb, x -> x * x)))
       * sqrt(list_sum(list_transform(b.emb, x -> x * x))))
"""

# Exact all-pairs twin: NOT the driver oracle (see _emb_lsh_oracle) — used
# by the local recall test, which pins the LSH path's recall against it.
EMB_EXACT_SQL = f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS}, 6) AS cos_sim
    FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
    WHERE ROUND({_COS}, 6) >= {COS_T}
"""


EMB_DIM = 64
EMB_PLANES = 5  # per-table signature bits
EMB_TABLES = 8  # independent plane sets


def _emb_sig_select_sql(src: str) -> str:
    """The per-table sign-LSH signature selects over relation ``src``,
    with the deterministic md5-derived hyperplanes
    (operators/similarity._plane) baked in as SQL literals — shared by
    the d09 and v05 oracles so the plane scheme cannot drift between
    them."""
    from ..operators.similarity import _plane

    sig_selects = []
    for t in range(EMB_TABLES):
        bits = []
        for j in range(EMB_PLANES):
            plane = "[" + ",".join(
                "1" if c > 0 else "-1" for c in _plane(j, EMB_DIM, t)
            ) + "]::DOUBLE[]"
            bits.append(
                f"CASE WHEN list_dot_product(emb, {plane}) >= 0 "
                "THEN '1' ELSE '0' END"
            )
        sig_selects.append(
            f"SELECT vec_id, {t} AS t, concat({', '.join(bits)}) AS sig FROM {src}"
        )
    return "\nUNION ALL\n".join(sig_selects)


def _emb_flips_sql() -> list[str]:
    """The Hamming-1 multiprobe signature set (the signature itself plus
    each single-bit flip) as SQL expressions over a ``sig`` column."""
    flips = ["sig"]
    for j in range(1, EMB_PLANES + 1):
        flips.append(
            f"concat(substr(sig, 1, {j - 1}), "
            f"CASE substr(sig, {j}, 1) WHEN '1' THEN '0' ELSE '1' END, "
            f"substr(sig, {j + 1}, {EMB_PLANES - j}))"
        )
    return flips


def _emb_lsh_oracle() -> str:
    """DuckDB twin of the d09 scale path, generated from the SAME
    deterministic md5-derived hyperplanes (operators/similarity._plane)
    baked in as SQL literals — the two sides cannot drift, and the gate
    pins the operator's SEMANTICS (sign-LSH candidates + exact-cosine
    verify) rather than a dataset-dependent recall property of the test
    corpus (an exact-all-pairs oracle asserts recall == 1.0, which a
    testdata regeneration could break without any code bug)."""
    sigs_sql = _emb_sig_select_sql("vecs")
    flips = _emb_flips_sql()

    return f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    ),
    sigs AS (
        {sigs_sql}
    ),
    probes AS (
        SELECT vec_id, t, unnest([{", ".join(flips)}]) AS sig FROM sigs
    ),
    cands AS (
        SELECT DISTINCT p.vec_id AS id_a, s.vec_id AS id_b
        FROM probes p JOIN sigs s
          ON p.t = s.t AND p.sig = s.sig AND p.vec_id < s.vec_id
    ),
    pairs AS (
        SELECT c.id_a, c.id_b, a.emb AS aemb, b.emb AS bemb
        FROM cands c
        JOIN vecs a ON a.vec_id = c.id_a
        JOIN vecs b ON b.vec_id = c.id_b
    )
    SELECT id_a, id_b,
           ROUND(list_dot_product(aemb, bemb)
                 / (sqrt(list_dot_product(aemb, aemb))
                    * sqrt(list_dot_product(bemb, bemb))), 6) AS cos_sim
    FROM pairs
    WHERE ROUND(list_dot_product(aemb, bemb)
                / (sqrt(list_dot_product(aemb, aemb))
                   * sqrt(list_dot_product(bemb, bemb))), 6) >= {COS_T}
"""


def embedding_signatures(emb: DataFrame) -> DataFrame:
    """(id, t, sig): the sign-LSH signatures of ALL tables in ONE pass
    over the embeddings — one struct-array explode instead of
    EMB_TABLES separate scans each re-evaluating the interpreted
    signature fold (the r5 review-flagged perf target).  This is the
    relation a production index persists, partitioned by (t, sig)."""
    from ..operators.similarity import lsh_signature

    structs = [
        F.struct(
            F.lit(t).alias("t"),
            lsh_signature("emb", EMB_DIM, EMB_PLANES, t).alias("sig"),
        )
        for t in range(EMB_TABLES)
    ]
    return emb.select("id", F.explode(F.array(*structs)).alias("ts")).select(
        "id", F.col("ts.t").alias("t"), F.col("ts.sig").alias("sig")
    )


def hamming1_flips(n_bits: int = EMB_PLANES, col: str = "sig"):
    """Array column of 1 + n_bits signature strings: the original plus
    every 1-bit flip — the Hamming<=1 multiprobe set.  ONE construction
    shared by the batch candidates (candidates_from_signatures) and the
    streaming probe (similarity_stream.probe_candidates) so the
    multiprobe scheme cannot drift between the two paths the v05 gate
    pins together."""
    return F.array(
        F.col(col),
        *[
            F.concat(
                F.substring(F.col(col), 1, j),
                F.when(F.substring(F.col(col), j + 1, 1) == "1", "0").otherwise("1"),
                F.substring(F.col(col), j + 2, n_bits - j - 1),
            )
            for j in range(n_bits)
        ],
    )


def candidates_from_signatures(sigs: DataFrame) -> DataFrame:
    """(id_a, id_b): unordered pairs colliding in >=1 sign-LSH table at
    Hamming <= 1 (multiprobe), from a (id, t, sig) signature relation —
    probe side carries 1+EMB_PLANES signatures per (vector, table),
    index side one, and the single (t, sig) equi-join replaces the old
    per-table join union — never an O(n^2) theta self-join."""
    probe = sigs.select("id", "t", F.explode(hamming1_flips()).alias("sig"))
    return (
        probe.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def embedding_lsh_candidates(emb: DataFrame) -> DataFrame:
    """(id_a, id_b): sign-LSH candidate pairs (see
    candidates_from_signatures; this form computes the signatures
    inline — d09 materializes them as a tier instead).

    Tuning note (measured on the synthetic testdata): COS_T=0.45 means a
    ~63-degree angular radius — at that radius NO exact bucketing scheme
    can prune (triangle-inequality cluster pruning admits 100% of pairs;
    measured), so this is the standard recall-tuned LSH path.  With
    5 planes x 8 tables x multiprobe-1, measured recall vs the exact
    all-pairs twin is 1.0 at both test SFs; the driver oracle pins the
    SCHEME (same plane literals in DuckDB, _emb_lsh_oracle) and
    tests/test_operators.py pins recall >= 0.95 against EMB_EXACT_SQL —
    candidates stay bounded by collisions either way.  At a production
    near-dup threshold (>=0.9) per-plane
    collision rises to ~0.85 and n_planes scales with log(corpus), making
    the candidate volume collapse far below n^2."""
    return candidates_from_signatures(embedding_signatures(emb))


@query("d09_embedding_neardup", oracle=_emb_lsh_oracle(), survey="dedup-embedding")
def d09_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, scale path: sign-LSH bucket
    candidates + exact cosine verify on candidates only.  The embeddings
    projection and the 8-table signature relation are materialized tiers
    (one scan each — the signature fold previously re-evaluated on both
    sides of all 8 table branches and the verify re-scanned the parquet
    twice; at 100TB both are persisted tables, the index one partitioned
    by (t, sig)).  The ORACLE replicates the same deterministic LSH
    scheme in DuckDB from shared plane literals (_emb_lsh_oracle), so the
    gate is dataset-independent; recall against the exact all-pairs twin
    (EMB_EXACT_SQL) is pinned separately by tests/test_operators.py.
    Cosine stays JVM-side via zip_with/aggregate."""
    from .vector import cosine_expr

    emb = _tier(
        spark, sf_dir, "emb",
        lambda: load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
        ),
        table="embeddings",
    )
    sigs = _tier(
        spark, sf_dir, "emb_sigs",
        lambda: embedding_signatures(emb),
        table="embeddings",
    )
    cands = candidates_from_signatures(sigs)
    a = emb.select(F.col("id").alias("id_a"), F.col("emb").alias("qemb"))
    b = emb.select(F.col("id").alias("id_b"), F.col("emb").alias("nemb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(cosine_expr("qemb", "nemb"), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= COS_T)
    )


# ---------------------------------------------------------------------------
# Tiered verification + the production corpus-clean composition
# (SCALE.md round 6: exact verification's cost at density is the
# candidate-with-shingle-array intermediate crossing an exchange; the
# signature-agreement estimate is 3.6x cheaper at 30x with the same
# yield.  The production path layers them: estimate first, exact verify
# ONLY the borderline band.)
# ---------------------------------------------------------------------------
EST_ACCEPT = 0.875  # >= 7 of 8 signatures agree: accept on the estimate alone
EST_REJECT = 0.375  # <= 2 of 8 agree: reject without touching shingle arrays


def tiered_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, sim, method): near-dup pairs through the LAYERED
    verify — signature-agreement estimate on every LSH candidate (fixed
    64-byte payload per side), exact array-intersect Jaccard ONLY for
    the borderline band EST_REJECT <= est < EST_ACCEPT.  Document-sized
    shingle arrays cross the verify exchange for borderline candidates
    alone; clear accepts and clear rejects never touch them — at 30x
    density that is the difference between d33's 39.9 s and d07's
    143.3 s (SCALE.md round 6), with the borderline re-check recovering
    exact-verify precision where the 8-signature estimate is noisy."""
    return tiered_pairs_from(
        _doc_arrays_tier(spark, sf_dir), _estimate_pairs_tier(spark, sf_dir)
    )


def tiered_pairs_from(da: DataFrame, est_df: DataFrame) -> DataFrame:
    """The layered-verify branch structure over ANY shingle-array
    relation ``da(id, sh)`` and estimate relation ``est_df(id_a, id_b,
    est_jaccard)`` — ONE definition shared by d35/d36 (raw documents)
    and d41 (substring-cleaned text), so the accept/borderline/reject
    thresholds cannot drift between the stage and the composition."""
    accepted = est_df.filter(F.col("est_jaccard") >= EST_ACCEPT).select(
        "id_a", "id_b",
        F.col("est_jaccard").alias("sim"),
        F.lit("estimate").alias("method"),
    )
    border = est_df.filter(
        (F.col("est_jaccard") >= EST_REJECT) & (F.col("est_jaccard") < EST_ACCEPT)
    ).select("id_a", "id_b")
    exact = verified_pairs_from_arrays(da, border, JACCARD_T).select(
        "id_a", "id_b",
        F.col("jaccard").alias("sim"),
        F.lit("exact").alias("method"),
    )
    return accepted.unionByName(exact)


def _estimate_pairs_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, est_jaccard) for every LSH candidate — the relation
    both the accept branch and the borderline branch of the tiered
    verify read, so it materializes once (in production: the candidate
    table a verify job writes and downstream stages filter)."""

    def build() -> DataFrame:
        sigs = _minhash_sigs_tier(spark, sf_dir)
        return signature_estimate_pairs(sigs, lsh_candidates(sigs))

    return _tier(spark, sf_dir, "est_pairs", build)


def signature_estimate_pairs(sigs: DataFrame, cands: DataFrame) -> DataFrame:
    """(id_a, id_b, est_jaccard): the signature-agreement Jaccard
    estimate over candidate pairs — fixed 64-byte payload per side
    (N_SIGS 8-hex mins), never a document array.  ONE definition shared
    by the document est tier (d33/d35/d36) and the d41 composed build."""
    a = sigs.select(
        F.col("id").alias("id_a"),
        *[F.col(f"s{i}").alias(f"sa{i}") for i in range(N_SIGS)],
    )
    b = sigs.select(
        F.col("id").alias("id_b"),
        *[F.col(f"s{i}").alias(f"sb{i}") for i in range(N_SIGS)],
    )
    agree = None
    for i in range(N_SIGS):
        term = (F.col(f"sa{i}") == F.col(f"sb{i}")).cast("int")
        agree = term if agree is None else agree + term
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (agree.cast("double") / N_SIGS).alias("est_jaccard"))
    )


_TIERED_SQL = f"""
    est AS (
        SELECT c.id_a, c.id_b,
               CAST(({_EST_AGREE}) AS DOUBLE) / {N_SIGS} AS est_jaccard
        FROM cands c
        JOIN sigs a ON c.id_a = a.id
        JOIN sigs b ON c.id_b = b.id
    ),
    accepted AS (
        SELECT id_a, id_b, est_jaccard AS sim, 'estimate' AS method
        FROM est WHERE est_jaccard >= {EST_ACCEPT}
    ),
    border AS (
        SELECT id_a, id_b FROM est
        WHERE est_jaccard >= {EST_REJECT} AND est_jaccard < {EST_ACCEPT}
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM shingles GROUP BY id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_both
        FROM border c
        JOIN shingles sa ON c.id_a = sa.id
        JOIN shingles sb ON c.id_b = sb.id AND sa.shingle = sb.shingle
        GROUP BY c.id_a, c.id_b
    ),
    exact AS (
        SELECT id_a, id_b,
               ROUND(CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both), 6) AS sim,
               'exact' AS method
        FROM inter JOIN sizes na ON id_a = na.id
                   JOIN sizes nb ON id_b = nb.id
        WHERE ROUND(CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both), 6) >= {JACCARD_T}
    ),
    tier_pairs AS (
        SELECT * FROM accepted UNION ALL SELECT * FROM exact
    )
"""

TIERED_PAIRS_ORACLE = f"""
    WITH {_SHINGLES_SQL},
    {_sig_sql()},
    {_bands_sql()},
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
    ),
    {_TIERED_SQL}
    SELECT id_a, id_b, sim, method FROM tier_pairs
"""


@query(
    "d35_tiered_pairs", oracle=TIERED_PAIRS_ORACLE, survey="dedup-minhash-lsh"
)
def d35_tiered_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layered verify as a declared relation (see
    tiered_verified_pairs): estimate-accept at >= EST_ACCEPT (7 of 8
    signatures), exact-verify only the borderline band, reject below
    EST_REJECT (2 of 8) with no array work at all.  Every branch is
    deterministic (md5 signatures, array_intersect Jaccard), so the
    whole tier hash-oracles."""
    return tiered_verified_pairs(spark, sf_dir)


def fingerprint_star_edges(sims: DataFrame) -> DataFrame:
    """(id_a, id_b): LINEAR star edges on exact fingerprint equality —
    each doc points at the min doc_id of its simhash class, one window
    over one shuffle, output linear in docs.  The ONLY safe way to feed
    fingerprint agreement into a connected-components pass (SCALE.md
    round 7: raw Hamming<=k PAIRS cost their quadratic volume wherever
    consumed; no exact sparsification of a fuzzy-class graph exists)."""
    w = Window.partitionBy("simhash")
    return (
        sims.select(
            F.col("id").alias("id_b"),
            F.min("id").over(w).alias("id_a"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
    )


CORPUS_CLEAN_TIERED_ORACLE = f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_sig_sql()},
    {_bands_sql()},
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
    ),
    {_TIERED_SQL},
    {_simhash64_sql()},
    sim_edges AS (
        SELECT keeper AS id_a, id AS id_b FROM (
            SELECT id, MIN(id) OVER (PARTITION BY simhash) AS keeper FROM sims
        ) WHERE id <> keeper
    ),
    all_pairs AS (
        SELECT id_a, id_b FROM tier_pairs
        UNION
        SELECT id_a, id_b FROM sim_edges
    ),
    sym AS (SELECT id_a AS s, id_b AS d FROM all_pairs
            UNION SELECT id_b, id_a FROM all_pairs),
    walk(node, label) AS (
        SELECT s, s FROM sym
        UNION
        SELECT e.d, w.label FROM walk w JOIN sym e ON w.node = e.s
        WHERE w.label < e.d
    ),
    groups AS (SELECT node AS doc_id, MIN(label) AS keeper FROM walk GROUP BY node),
    quality AS (
        SELECT doc_id FROM (
          SELECT doc_id,
                 len(regexp_split_to_array(trim(text, ' '), '[ \t\n\f\r]+')) AS n_tokens,
                 len(list_filter(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\f\r]+'),
                                 t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop
          FROM documents
        ) WHERE n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5
    )
    SELECT q.doc_id FROM quality q
    LEFT JOIN groups g ON q.doc_id = g.doc_id
    WHERE g.doc_id IS NULL OR g.keeper = q.doc_id
"""


@query(
    "d36_corpus_clean_tiered",
    oracle=CORPUS_CLEAN_TIERED_ORACLE,
    survey="dedup-groups,dedup-simhash,dedup-minhash-lsh,quality-score",
)
def d36_corpus_clean_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION corpus-clean composition, rewired onto the round-6
    scale tiers (the r6 verdict's top item): near-dup edges come from
    (a) the tiered MinHash verify (d35 — estimate-accept, borderline
    exact only) and (b) LINEAR star edges on exact 64-bit SimHash
    fingerprint equality (each doc -> the min doc_id of its fingerprint
    class — one window, output linear in docs).  Their union feeds one
    connected-components pass; the quality gate + keeper election are
    unchanged from d13.

    Measured negative result that shaped (b) (SCALE.md round 7): the
    first form of this composition unioned d34's Hamming<=3 PAIRS into
    the CC — and measured SLOWER than the exact d13 at 30x (218.2 s vs
    184.7 s), because the 31.4M-pair relation dominated the CC's edge
    input: the output-quadratic the r6 run diagnosed had just moved one
    stage downstream.  Dense fuzzy-match classes cost their pair volume
    WHEREVER they are consumed; the composition therefore takes the
    word-order-robust exact-fingerprint groups (linear by construction)
    from the SimHash side and leaves genuine fuzzy near-dups to the
    Jaccard tier, which bounds them by verified similarity.  d13 remains
    the exact-verified correctness twin; d34's pairs relation remains
    the declared analysis query for when pairs ARE the product."""
    from ..pipeline.closure import connected_components

    docs = load_table(spark, sf_dir, "documents")

    toks = F.split(F.trim(F.col("text")), _WS_SPLIT)
    low_toks = F.split(F.lower(F.trim(F.col("text"))), _WS_SPLIT)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(low_toks, lambda t: t.isin("the", "a", "of", "and")))
    quality = docs.filter(
        (n_tokens >= 20) & ((n_stop.cast("double") / n_tokens) < 0.5)
    ).select("doc_id")

    tier_pairs = tiered_verified_pairs(spark, sf_dir).select("id_a", "id_b")
    sims64 = _tier(
        spark, sf_dir, "simhash64",
        lambda: simhash64_df(load_table(spark, sf_dir, "documents")),
    )
    edges = tier_pairs.unionByName(fingerprint_star_edges(sims64))

    groups = connected_components(edges, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("keeper")
    )
    return (
        quality.join(groups, "doc_id", "left")
        .filter(F.col("keeper").isNull() | (F.col("keeper") == F.col("doc_id")))
        .select("doc_id")
    )


# ---------------------------------------------------------------------------
# d41: the full production training-data build — exact-substring removal
# FIRST (Lee et al. 2021 order: near-dup fingerprints see cleaned text),
# then the tiered near-dup clean, then the quality gate
# ---------------------------------------------------------------------------


def _d41_oracle() -> str:
    from .text4 import _CLEAN_SQL, _SPANS_SQL

    return f"""
    WITH RECURSIVE {_SPANS_SQL},
    {_CLEAN_SQL},
    documents_clean AS (
        SELECT d.doc_id, COALESCE(a.clean_text, '') AS text
        FROM toked d LEFT JOIN clean_agg a USING (doc_id)
    ),
    {_shingles_sql("documents_clean")},
    {_sig_sql()},
    {_bands_sql()},
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
    ),
    {_TIERED_SQL},
    {_simhash64_sql("documents_clean")},
    sim_edges AS (
        SELECT keeper AS id_a, id AS id_b FROM (
            SELECT id, MIN(id) OVER (PARTITION BY simhash) AS keeper FROM sims
        ) WHERE id <> keeper
    ),
    all_pairs AS (
        SELECT id_a, id_b FROM tier_pairs
        UNION
        SELECT id_a, id_b FROM sim_edges
    ),
    sym AS (SELECT id_a AS s, id_b AS d FROM all_pairs
            UNION SELECT id_b, id_a FROM all_pairs),
    walk(node, label) AS (
        SELECT s, s FROM sym
        UNION
        SELECT e.d, w.label FROM walk w JOIN sym e ON w.node = e.s
        WHERE w.label < e.d
    ),
    groups AS (SELECT node AS doc_id, MIN(label) AS keeper FROM walk GROUP BY node),
    quality AS (
        SELECT doc_id, n_tokens FROM (
          SELECT doc_id,
                 len(regexp_split_to_array(trim(text, ' '), '[ \t\n\f\r]+')) AS n_tokens,
                 len(list_filter(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\f\r]+'),
                                 t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop
          FROM documents_clean
        ) WHERE n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5
    )
    SELECT q.doc_id, c.text AS clean_text,
           CAST(q.n_tokens AS BIGINT) AS n_clean_tokens
    FROM quality q
    JOIN documents_clean c USING (doc_id)
    LEFT JOIN groups g ON q.doc_id = g.doc_id
    WHERE g.doc_id IS NULL OR g.keeper = q.doc_id
"""


def _d41_cleaned_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text): the substring-CLEANED corpus — d39's removal
    output renamed to the (doc_id, text) shape every downstream stage
    consumes.  Materialized once; shingling, simhash and the quality
    gate all read it (in production: the cleaned-text table the
    substring pass writes)."""
    from .text4 import substring_dedup_clean

    return _tier(
        spark, sf_dir, "d41_cleaned",
        lambda: substring_dedup_clean(load_table(spark, sf_dir, "documents")).select(
            "doc_id", F.col("clean_text").alias("text")
        ),
    )


@query(
    "d41_training_data_build",
    oracle=_d41_oracle(),
    survey="dedup-substring,dedup-minhash-lsh,dedup-simhash,dedup-groups,quality-score",
)
def d41_training_data_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END production training-data build, composed in the
    Lee et al. (2021) order: exact duplicate-substring REMOVAL first
    (d39 — so every downstream fingerprint sees cleaned text), then the
    tiered near-dup clean (d36's machinery: layered MinHash verify +
    linear SimHash64 star edges -> one connected-components pass +
    keeper election), then the quality gate — (doc_id, clean_text,
    n_clean_tokens), one row per SURVIVING document: what actually
    ships to the tokenizer.

    Every stage is the SAME definition as its standalone query
    (substring_dedup_clean, tiered_pairs_from, signature_estimate_pairs,
    fingerprint_star_edges), applied to the cleaned relation — the
    composition adds no new operator semantics, only the order.  Scale
    shape: the cleaned tier is written once and read by three
    scan-shaped consumers; all near-dup machinery keeps its measured
    30x/100x posture (SCALE.md rounds 6-8) because the input shape
    (doc_id, text) is unchanged — only shorter."""
    from ..pipeline.closure import connected_components

    cleaned = _d41_cleaned_tier(spark, sf_dir)
    da = _tier(spark, sf_dir, "d41_arrays", lambda: shingle_arrays_df(cleaned))
    sigs = _tier(
        spark, sf_dir, "d41_sigs",
        lambda: minhash_signatures(da.select("id", F.explode("sh").alias("shingle"))),
    )
    est = _tier(
        spark, sf_dir, "d41_est",
        lambda: signature_estimate_pairs(sigs, lsh_candidates(sigs)),
    )
    tier_pairs = tiered_pairs_from(da, est).select("id_a", "id_b")
    sims64 = _tier(spark, sf_dir, "d41_simhash64", lambda: simhash64_df(cleaned))
    edges = tier_pairs.unionByName(fingerprint_star_edges(sims64))
    groups = connected_components(edges, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("keeper")
    )

    toks = F.split(F.trim(F.col("text")), _WS_SPLIT)
    low_toks = F.split(F.lower(F.trim(F.col("text"))), _WS_SPLIT)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(low_toks, lambda t: t.isin("the", "a", "of", "and")))
    quality = cleaned.filter(
        (n_tokens >= 20) & ((n_stop.cast("double") / n_tokens) < 0.5)
    ).select("doc_id", n_tokens.cast("bigint").alias("n_clean_tokens"))

    return (
        quality.join(groups, "doc_id", "left")
        .filter(F.col("keeper").isNull() | (F.col("keeper") == F.col("doc_id")))
        .join(cleaned, "doc_id")
        .select("doc_id", F.col("text").alias("clean_text"), "n_clean_tokens")
    )


def _d47_oracle() -> str:
    from .text2 import SPLIT_TRAIN_LT, SPLIT_VAL_LT

    return f"""
    WITH built AS ({_d41_oracle()}),
    fp AS (
        SELECT doc_id, n_clean_tokens,
               md5(regexp_replace(lower(trim(clean_text)), '[ \\t\\n\\f\\r]+', ' ', 'g'))
                 AS group_fp
        FROM built
    ),
    b AS (
        SELECT doc_id, n_clean_tokens,
               CAST(CAST(('0x' || substr(md5(group_fp), 1, 2)) AS UBIGINT)
                    AS BIGINT) AS bucket
        FROM fp
    )
    SELECT CASE WHEN bucket < {SPLIT_TRAIN_LT} THEN 'train'
                WHEN bucket < {SPLIT_VAL_LT} THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_clean_tokens) AS BIGINT) AS n_tokens
    FROM b
    GROUP BY 1
"""


@query(
    "d47_training_split_manifest",
    oracle=_d47_oracle(),
    survey="split-leakage-safe,token-count,dedup-substring,dedup-groups",
)
def d47_training_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAST stage of the training-data story: d41's surviving
    cleaned corpus routed through the d46 leakage-safe split (assignment
    hashed from the cleaned-content fingerprint, RNG-free) and rolled up
    into the manifest a trainer actually reads — (split, n_docs,
    n_tokens).  Composition only: d41 supplies the survivors (its tiers
    are shared, so this costs one extra scan-side projection + a 3-row
    aggregate), the d46 expressions supply the split, and token
    accounting sums the already-computed n_clean_tokens.  At 100 TB the
    per-doc split column is written with the shards (shuffle-free, like
    d46); this manifest is its bounded per-split rollup."""
    from .text2 import SPLIT_TRAIN_LT, SPLIT_VAL_LT

    built = d41_training_data_build(spark, sf_dir)
    fp = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("clean_text"))), r"[ \t\n\f\r]+", " ")
    )
    b = built.select(
        "n_clean_tokens",
        F.conv(F.substring(F.md5(fp), 1, 2), 16, 10).cast("long").alias("bucket"),
    )
    split = (
        F.when(F.col("bucket") < SPLIT_TRAIN_LT, F.lit("train"))
        .when(F.col("bucket") < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        b.select(split.alias("split"), "n_clean_tokens")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_clean_tokens").cast("bigint").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming-similarity batch twin gate (the continuous ANN probe's
# expressions, driver-verified — VERDICT r6 #5)
# ---------------------------------------------------------------------------
_V05_MOD = 4  # vec_id % 4 == 0 plays the arriving micro-batch


def _v05_oracle() -> str:
    """DuckDB twin of the streaming similarity probe: the corpus splits
    into an arriving batch (vec_id % _V05_MOD == 0) and the persisted
    index (the rest); the batch's signatures multiprobe the index at
    Hamming<=1 and candidates exact-cosine verify — the DIRECTED form of
    the d09 scheme, from the same plane literals."""
    flips = _emb_flips_sql()
    return f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    ),
    newv AS (SELECT * FROM vecs WHERE vec_id % {_V05_MOD} = 0),
    idxv AS (SELECT * FROM vecs WHERE vec_id % {_V05_MOD} <> 0),
    new_sigs AS (
        {_emb_sig_select_sql("newv")}
    ),
    idx_sigs AS (
        {_emb_sig_select_sql("idxv")}
    ),
    probes AS (
        SELECT vec_id, t, unnest([{", ".join(flips)}]) AS sig FROM new_sigs
    ),
    cands AS (
        SELECT DISTINCT p.vec_id AS new_id, s.vec_id AS corpus_id
        FROM probes p JOIN idx_sigs s
          ON p.t = s.t AND p.sig = s.sig AND p.vec_id <> s.vec_id
    )
    SELECT c.new_id, c.corpus_id,
           ROUND(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
    FROM cands c
    JOIN newv a ON a.vec_id = c.new_id
    JOIN idxv b ON b.vec_id = c.corpus_id
    WHERE ROUND(list_dot_product(a.emb, b.emb)
                / (sqrt(list_dot_product(a.emb, a.emb))
                   * sqrt(list_dot_product(b.emb, b.emb))), 6) >= {COS_T}
"""


@query(
    "v05_stream_similarity_gate",
    oracle=_v05_oracle(),
    survey="similarity-ann-lsh,dedup-embedding,R5",
)
def v05_stream_similarity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming embedding-similarity probe's batch-equivalent path,
    as a declared gate (the d27 pattern: a deterministic split plays the
    two sides): vec_id % 4 == 0 is the arriving micro-batch, the rest
    the persisted index, and the match runs through THE SAME
    probe_matches expressions streaming/similarity_stream.py executes
    per micro-batch (directed Hamming-1 multiprobe + exact-cosine
    verify) — so the continuous ANN probe is driver-hash-verified
    through its batch twin, like the rest of the streaming family."""
    from ..streaming.similarity_stream import probe_matches

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    newv = emb.filter(F.col("id") % _V05_MOD == 0)
    idxv = emb.filter(F.col("id") % _V05_MOD != 0)
    return probe_matches(
        newv, embedding_signatures(newv), embedding_signatures(idxv), idxv
    )


# ---------------------------------------------------------------------------
# d48: incremental corpus refresh — the per-crawl admission gate a
# continuously-ingested training corpus runs: exact dedup against the
# previous build's fingerprint index (d27), quality gating (d41's gate),
# and NEAR-dup rejection against the previous build's SimHash64 index —
# all with cost proportional to the delta + two fingerprint-sized indexes,
# never the previous corpus text
# ---------------------------------------------------------------------------

_D48_PREV_MOD = 4  # doc_id % 4 == 0 plays the previously-ingested corpus
# Planted near-duplicates: SimHash64 hashes the DISTINCT word set, so a
# word-order permutation of the same vocabulary is a guaranteed near-dup
# (identical simhash) that is NOT an exact dup (different normalized md5).
_D48_NEARPREV_MOD = 31  # prev gets _W ordered, delta gets _W reversed
_D48_NEARBATCH_MOD = 37  # delta-only: two permutations of _X by doc_id parity
_D48_W = (
    "amber basalt cobalt dunes ember flint garnet heath iris jasper krait "
    "lotus maple nectar onyx prism quartz rivet slate topaz umber vortex"
)
_D48_X = (
    "anchor bison cedar dagger eagle falcon gecko harbor ingot jackal kelp "
    "lantern marble nickel osprey pebble quiver russet saffron tundra "
    "urchin willow"
)
_D48_W_REV = " ".join(reversed(_D48_W.split()))
_D48_X_REV = " ".join(reversed(_D48_X.split()))


def _d48_oracle() -> str:
    from .text4 import _BATCHDUP_MOD, _SHARED_MOD

    ws = r"[ \t\n\f\r]+"
    return f"""
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % {_SHARED_MOD} = 0
                    THEN 'shared boilerplate page ' || CAST(doc_id % 3 AS VARCHAR)
                    WHEN doc_id % {_BATCHDUP_MOD} = 0 AND doc_id % {_D48_PREV_MOD} != 0
                    THEN 'batch duplicate page'
                    WHEN doc_id % {_D48_NEARPREV_MOD} = 0
                    THEN CASE WHEN doc_id % {_D48_PREV_MOD} = 0
                              THEN '{_D48_W}' ELSE '{_D48_W_REV}' END
                    WHEN doc_id % {_D48_NEARBATCH_MOD} = 0 AND doc_id % {_D48_PREV_MOD} != 0
                    THEN CASE WHEN doc_id % 2 = 0
                              THEN '{_D48_X}' ELSE '{_D48_X_REV}' END
                    ELSE text END AS text
        FROM documents
    ),
    {_simhash64_sql('planted')},
    feat AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text, ' ')), '{ws}', ' ', 'g')) AS fp,
               len(regexp_split_to_array(trim(text, ' '), '{ws}')) AS n_tokens,
               len(list_filter(regexp_split_to_array(lower(trim(text, ' ')), '{ws}'),
                               t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop,
               (doc_id % {_D48_PREV_MOD} = 0) AS is_prev
        FROM planted
    ),
    joined AS (
        SELECT f.doc_id, f.fp, f.n_tokens, f.n_stop, f.is_prev, s.simhash
        FROM feat f JOIN sims s ON s.id = f.doc_id
    ),
    prev_fp AS (SELECT DISTINCT fp FROM joined WHERE is_prev),
    prev_sim AS (SELECT DISTINCT simhash FROM joined WHERE is_prev),
    lvl1 AS (
        SELECT j.*, (p.fp IS NOT NULL) AS seen_prev
        FROM joined j LEFT JOIN prev_fp p ON j.fp = p.fp
        WHERE NOT j.is_prev
    ),
    lvl2 AS (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM lvl1 WHERE NOT seen_prev
    ),
    lvl3 AS (
        SELECT *, (n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5)
                  AS quality_ok
        FROM lvl2 WHERE rn = 1
    ),
    lvl4 AS (
        SELECT l.*, (q.simhash IS NOT NULL) AS near_prev
        FROM lvl3 l LEFT JOIN prev_sim q ON l.simhash = q.simhash
        WHERE l.quality_ok
    ),
    lvl5 AS (
        SELECT *, MIN(doc_id) OVER (PARTITION BY simhash) AS keeper
        FROM lvl4 WHERE NOT near_prev
    ),
    sel AS (
        SELECT doc_id, n_tokens, 'in_prev_build' AS reason FROM lvl1 WHERE seen_prev
        UNION ALL
        SELECT doc_id, n_tokens, 'dup_in_batch' FROM lvl2 WHERE rn > 1
        UNION ALL
        SELECT doc_id, n_tokens, 'low_quality' FROM lvl3 WHERE NOT quality_ok
        UNION ALL
        SELECT doc_id, n_tokens, 'near_dup_prev' FROM lvl4 WHERE near_prev
        UNION ALL
        SELECT doc_id, n_tokens, 'near_dup_batch' FROM lvl5 WHERE doc_id <> keeper
        UNION ALL
        SELECT doc_id, n_tokens, 'admitted' FROM lvl5 WHERE doc_id = keeper
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, reason,
           (reason = 'admitted') AS admitted
    FROM sel
"""


def refresh_verdicts(
    delta: DataFrame, prev_fp: DataFrame, prev_sim: DataFrame
) -> DataFrame:
    """The d48 admission chain as a reusable operator over persisted
    indexes — the production call shape: ``delta`` is
    (doc_id, fp, n_tokens, n_stop, simhash) for the arriving batch only,
    ``prev_fp`` (fp) and ``prev_sim`` (simhash) are the previous build's
    stored fingerprint indexes.  Returns one (doc_id, n_tokens, reason,
    admitted) verdict per delta document; see d48 for the verdict order.
    Cost: one window + one join per index on delta-sized data — nothing
    here scales with the previous corpus except the index join sides."""
    lvl1 = (
        delta.join(prev_fp.withColumn("_pf", F.lit(True)), "fp", "left")
        .withColumn("seen_prev", F.coalesce("_pf", F.lit(False)))
        .drop("_pf")
    )
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    lvl2 = lvl1.filter(~F.col("seen_prev")).withColumn("rn", F.row_number().over(w_fp))
    lvl3 = lvl2.filter(F.col("rn") == 1).withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 20)
        & ((F.col("n_stop").cast("double") / F.col("n_tokens")) < 0.5),
    )
    lvl4 = (
        lvl3.filter("quality_ok")
        .join(prev_sim.withColumn("_ps", F.lit(True)), "simhash", "left")
        .withColumn("near_prev", F.coalesce("_ps", F.lit(False)))
        .drop("_ps")
    )
    lvl5 = lvl4.filter(~F.col("near_prev")).withColumn(
        "keeper", F.min("doc_id").over(Window.partitionBy("simhash"))
    )

    def slice_(df: DataFrame, cond, reason: str) -> DataFrame:
        return df.filter(cond).select(
            "doc_id", "n_tokens", F.lit(reason).alias("reason")
        )

    sel = (
        slice_(lvl1, F.col("seen_prev"), "in_prev_build")
        .unionByName(slice_(lvl2, F.col("rn") > 1, "dup_in_batch"))
        .unionByName(slice_(lvl3, ~F.col("quality_ok"), "low_quality"))
        .unionByName(slice_(lvl4, F.col("near_prev"), "near_dup_prev"))
        .unionByName(slice_(lvl5, F.col("doc_id") != F.col("keeper"), "near_dup_batch"))
        .unionByName(slice_(lvl5, F.col("doc_id") == F.col("keeper"), "admitted"))
    )
    return sel.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "reason",
        (F.col("reason") == "admitted").alias("admitted"),
    )


def refresh_features(docs: DataFrame) -> DataFrame:
    """(doc_id, fp, n_tokens, n_stop, simhash) — everything the refresh
    verdict chain needs, from one text scan joined with the SimHash64
    aggregate.  Shared by the d48 gate (over the planted split) and the
    scale tool (over a replica split); the admitted side of a production
    refresh appends exactly these columns to the two indexes."""
    toks = F.split(F.trim(F.col("text")), _WS_SPLIT)
    low_toks = F.split(F.lower(F.trim(F.col("text"))), _WS_SPLIT)
    feat = docs.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), _WS_SPLIT, " ")
        ).alias("fp"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(low_toks, lambda t: t.isin("the", "a", "of", "and"))).alias(
            "n_stop"
        ),
    )
    sims = simhash64_df(docs)
    return feat.join(sims, feat.doc_id == sims.id).drop("id")


@query(
    "d48_incremental_refresh",
    oracle=_d48_oracle(),
    survey="dedup-incremental,dedup-simhash,quality-score",
)
def d48_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus REFRESH — the composed per-crawl admission gate
    (d27's exact incremental dedup widened with d41's quality gate and a
    near-dup check against the previous build): every delta document
    gets exactly one verdict, in production order — cheapest first —
    (1) exact fingerprint in the previous build -> in_prev_build,
    (2) not the first of its exact class within the batch -> dup_in_batch,
    (3) fails the quality gate -> low_quality (no fingerprint work is
    spent on documents the gate would drop),
    (4) SimHash64 equal to a previous-build fingerprint -> near_dup_prev,
    (5) SimHash64 class already has a lower-id batch survivor ->
        near_dup_batch,
    else admitted.  doc_id % 4 == 0 plays the previous corpus.

    Planted fixtures make every verdict reachable on the synthetic
    corpus: d27's shared-boilerplate (% 23) and batch-duplicate (% 29)
    exact plants, plus word-PERMUTATION plants for the near-dup paths —
    SimHash64 hashes the distinct word SET, so a reordering of the same
    22 words is a guaranteed near-dup (identical fingerprint) that no
    exact check catches (% 31 spans prev/delta; % 37 is delta-only,
    two orderings by doc_id parity).

    Scale shape: the previous build contributes ONLY two indexes — a
    16-byte exact fingerprint relation and an 8-byte SimHash64 relation
    (both persisted by the previous refresh; rebuilt here from the
    deterministic prev split so the oracle can replay them).  The delta
    pays one text scan (fingerprint + simhash + quality in one pass),
    two index equi-joins and two windows; nothing ever re-reads the
    previous corpus text, so a daily refresh costs O(delta + indexes)
    regardless of corpus age — the same contract as d27, extended to
    near-dups."""
    from .text4 import _BATCHDUP_MOD, _SHARED_MOD

    docs = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(
            k % _SHARED_MOD == 0,
            F.concat(F.lit("shared boilerplate page "), (k % 3).cast("string")),
        )
        .when(
            (k % _BATCHDUP_MOD == 0) & (k % _D48_PREV_MOD != 0),
            F.lit("batch duplicate page"),
        )
        .when(
            k % _D48_NEARPREV_MOD == 0,
            F.when(k % _D48_PREV_MOD == 0, F.lit(_D48_W)).otherwise(F.lit(_D48_W_REV)),
        )
        .when(
            (k % _D48_NEARBATCH_MOD == 0) & (k % _D48_PREV_MOD != 0),
            F.when(k % 2 == 0, F.lit(_D48_X)).otherwise(F.lit(_D48_X_REV)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    planted = _tier(spark, sf_dir, "d48_planted", lambda: planted)
    joined = refresh_features(planted).withColumn(
        "is_prev", F.col("doc_id") % _D48_PREV_MOD == 0
    )
    prev_fp = joined.filter("is_prev").select("fp").distinct()
    prev_sim = joined.filter("is_prev").select("simhash").distinct()
    delta = joined.filter(~F.col("is_prev")).drop("is_prev")
    return refresh_verdicts(delta, prev_fp, prev_sim)


_D52_CAP = 4  # small enough that sf0.01 buckets actually split

_D52_ORACLE = f"""
    WITH {_SHINGLES_SQL},
    {_sig_sql()},
    {_bands_sql()},
    split AS (
        SELECT id, band, bh,
               (row_number() OVER (PARTITION BY band, bh
                                   ORDER BY md5(CAST(id AS VARCHAR)), id) - 1)
               % CAST(CEIL(CAST(COUNT(*) OVER (PARTITION BY band, bh) AS DOUBLE)
                           / {_D52_CAP}) AS BIGINT) AS sub
        FROM bands
    ),
    sub_mins AS (
        SELECT band, bh, sub, MIN(id) AS sid FROM split GROUP BY band, bh, sub
    ),
    spine AS (
        SELECT LEAST(sid, bmin) AS id_a, GREATEST(sid, bmin) AS id_b
        FROM (SELECT band, bh, sid,
                     MIN(sid) OVER (PARTITION BY band, bh) AS bmin
              FROM sub_mins)
        WHERE sid != bmin
    ),
    cands AS (
        SELECT DISTINCT id_a, id_b FROM (
            SELECT a.id AS id_a, b.id AS id_b
            FROM split a
            JOIN split b ON a.band = b.band AND a.bh = b.bh
                        AND a.sub = b.sub AND a.id < b.id
            UNION ALL
            SELECT id_a, id_b FROM spine
        )
    ),
    {_TIERED_SQL}
    SELECT id_a, id_b, sim, method FROM tier_pairs
"""


@query("d52_capped_tier_pairs", oracle=_D52_ORACLE, survey="dedup-minhash-lsh,skew")
def d52_capped_tier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mega-family-capped candidate path (lsh_candidates_capped) as a
    driver gate: band buckets larger than the cap split into exact
    row_number-mod sub-buckets BEFORE the pair join (hard per-bucket
    quadratic bound — a 100k-member near-dup family emits linear
    candidates, measured in SCALE.md round 10), with the sub-minimum
    spine keeping split buckets CC-connected.  The oracle replays the
    split (same md5 order, same ceil arithmetic), the spine, and the
    d35 layered verify over the capped candidate set — byte parity or
    red.  Cap pinned to {_D52_CAP} so sf0.01 buckets genuinely split."""
    docs = load_table(spark, sf_dir, "documents")
    return tiered_pairs_capped(docs, bucket_cap=_D52_CAP)


_D53_ORACLE = f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_sig_sql()},
    {_bands_sql()},
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM shingles GROUP BY id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_both
        FROM cands c
        JOIN shingles sa ON c.id_a = sa.id
        JOIN shingles sb ON c.id_b = sb.id AND sa.shingle = sb.shingle
        GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes na ON id_a = na.id JOIN sizes nb ON id_b = nb.id
        WHERE ROUND(CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both), 6) >= {JACCARD_T}
    ),
    sym AS (SELECT id_a AS s, id_b AS d FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    walk(node, label) AS (
        SELECT s, s FROM sym
        UNION
        SELECT e.d, w.label FROM walk w JOIN sym e ON w.node = e.s
        WHERE w.label < e.d
    ),
    comp AS (SELECT node, MIN(label) AS comp FROM walk GROUP BY node),
    tok AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r]+')) AS n_tokens
        FROM documents
    ),
    keepers AS (
        SELECT comp, doc_id AS keeper, n_tokens AS keeper_tokens FROM (
            SELECT c.comp, c.node AS doc_id, t.n_tokens,
                   row_number() OVER (PARTITION BY c.comp
                                      ORDER BY t.n_tokens DESC, c.node) AS rn
            FROM comp c JOIN tok t ON t.doc_id = c.node
        ) WHERE rn = 1
    )
    SELECT c.node AS doc_id,
           k.keeper AS keeper_doc_id,
           c.node = k.keeper AS kept
    FROM comp c JOIN keepers k ON c.comp = k.comp
"""


@query(
    "d53_quality_keeper_election",
    oracle=_D53_ORACLE,
    survey="dedup-groups,quality-score",
)
def d53_quality_keeper_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper election: d12's dedup groups, but each
    cluster keeps its BEST member — highest token count, doc_id tiebreak
    — instead of the min id.  This is what production corpus cleans
    actually do (keep the longest/highest-quality copy of a near-dup
    family, not an arbitrary one); the min-id form (d12) remains the
    cheap variant when members are interchangeable.  Same LSH-verified
    pair tier and closure; one extra broadcast-able token-count join and
    a per-component argmax window.  At 100 TB the window partitions by
    component (bounded groups), never globally."""
    from pyspark.sql import Window as W

    from ..pipeline.closure import connected_components

    pairs = _verified_pairs_tier(spark, sf_dir)
    comps = connected_components(
        pairs.select("id_a", "id_b"), src="id_a", dst="id_b"
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("comp"))
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+")).alias("n_tokens"),
    )
    scored = comps.join(tok, "doc_id")
    w = W.partitionBy("comp").orderBy(F.desc("n_tokens"), "doc_id")
    keepers = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("comp", F.col("doc_id").alias("keeper_doc_id"))
    )
    return comps.join(keepers, "comp").select(
        "doc_id",
        "keeper_doc_id",
        (F.col("doc_id") == F.col("keeper_doc_id")).alias("kept"),
    )
