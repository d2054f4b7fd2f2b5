"""Incremental/CDC operators (SURVEY §2.11 R1–R6) in deterministic batch form.

The streaming twins live in data_pipeline_spark/streaming/ (Structured
Streaming with watermarks); these declared-query forms are the exact batch
semantics the streaming path must agree with, checked against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import empty_relation, load_table
from .registry import query


@query(
    "r05_first_change_per_key",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
        SELECT event_id, user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    survey="R5,S2",
)
def r05_first_change_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-dedupe (R5, harvester.py:219-222: first change per ident wins):
    dropDuplicates made deterministic via an explicit total order."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.select("event_id", "user_id", "event_type", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "r03_change_classification",
    oracle="""
    SELECT CASE WHEN event_type IN ('signup') THEN 'create'
                WHEN event_type IN ('click', 'view') THEN 'update'
                WHEN event_type IN ('error') THEN 'delete'
                ELSE 'refresh' END AS change,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
    survey="R3",
)
def r03_change_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-type classification (R3, harvester.py:190-203): CDC column
    derivation via a when-chain, then per-class counts."""
    ev = load_table(spark, sf_dir, "events")
    change = (
        F.when(F.col("event_type").isin("signup"), "create")
        .when(F.col("event_type").isin("click", "view"), "update")
        .when(F.col("event_type").isin("error"), "delete")
        .otherwise("refresh")
    )
    return (
        ev.select(change.alias("change"), "user_id")
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "r06_skip_if_fresher",
    oracle="""
    WITH latest AS (SELECT user_id, MAX(ts) AS max_ts FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, e.ts
    FROM events e JOIN latest l ON e.user_id = l.user_id
    WHERE epoch_us(l.max_ts) - epoch_us(e.ts) <= 86400000000
    """,
    survey="R6,R1",
)
def r06_skip_if_fresher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness gate (R6, harvester.py:242-251: skip if cache newer):
    keep only events within 1 day of each key's watermark."""
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(F.max("ts").alias("max_ts"))
    e = ev.alias("e")
    return (
        e.join(latest.alias("l"), "user_id")
        .filter(F.col("e.ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .select("event_id", "user_id", F.col("e.ts").alias("ts"))
    )


@query(
    "r01_watermark_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    GROUP BY 1, 2
    """,
    survey="R1,R2",
)
def r01_watermark_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation — the batch twin of the
    streaming watermark path (streaming/ingest.py). F.window() emits the
    same hour buckets as DuckDB's time_bucket."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") >= "2024-01-10 00:00:00")
        .groupBy(F.window("ts", "1 hour").getField("start").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
        )
    )


@query(
    "j13_asof_last_click",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts AS click_ts,
               COUNT(*) AS n_clicks,
               CAST(MAX(value) AS DOUBLE) AS click_value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts,
               CAST(value AS DOUBLE) AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
           c.click_ts AS asof_click_ts, c.n_clicks, c.click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    survey="asof-join,P4",
)
def j13_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase event annotated with the user's
    most recent click at or before it (operators/asof.asof_join — the
    union+window formulation, one shuffle, no range-join blowup).  The
    oracle is DuckDB's native ASOF LEFT JOIN, so the custom operator is
    hash-checked against a reference implementation of the semantics.
    The right side is pre-aggregated to one row per (user, ts) —
    required for a deterministic match on both engines."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.max("value").cast("double").alias("click_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").cast("double").alias("purchase_value")
    )
    return asof_join(purchases, clicks, on="user_id", left_time="ts", right_time="click_ts")


@query(
    "rj01_inflight_lineitems",
    oracle="""
    WITH days AS (SELECT DISTINCT o_orderdate AS d FROM orders),
    iv AS (
        SELECT l_shipdate,
               l_shipdate + INTERVAL ((l_linenumber % 20) + 1) DAY AS l_receiptdate
        FROM lineitem
    )
    SELECT d, COUNT(*) AS n_in_flight
    FROM days JOIN iv
      ON d >= l_shipdate AND d <= l_receiptdate
    GROUP BY d
    """,
    survey="range-join,P4",
)
def rj01_inflight_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join at scale: for every order date, how many lineitems were
    in flight (shipped, not yet received) that day — a point-in-interval
    join restated as a month-bin equi-join + containment filter
    (operators/range_join.range_join; a theta BETWEEN join would be a
    BroadcastNestedLoopJoin, quadratic at 100TB). The receipt date is
    synthesized deterministically from the line number (this testdata
    carries no receiptdate column); the oracle runs the same semantics
    as a plain BETWEEN join (DuckDB's IEJoin)."""
    from ..operators.range_join import range_join

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate",
        F.expr(
            "l_shipdate + make_dt_interval((l_linenumber % 20) + 1, 0, 0, 0)"
        ).alias("l_receiptdate"),
    )
    days = orders.select(F.col("o_orderdate").alias("d")).distinct()
    joined = range_join(days, li, "d", "l_shipdate", "l_receiptdate")
    return joined.groupBy("d").agg(F.count(F.lit(1)).alias("n_in_flight"))


@query(
    "r04_apply_changes",
    oracle="""
    SELECT 'u' || c_custkey AS object_uri,
           CASE
             -- k%4=0: update with fresher payload -> replaced
             WHEN c_custkey % 4 = 0 THEN 'v2'
             -- k%4=1: delete WITH inbound reference -> vetoed, row survives
             WHEN c_custkey % 4 = 1 THEN 'v1'
             -- k%4=3: stale update (older than cache) -> kept cache row
             ELSE 'v1'
           END AS v
    FROM customer
    WHERE c_custkey % 4 <> 2  -- k%4=2: unreferenced delete -> row gone
    """,
    survey="R4,R6,R8,K3",
)
def r04_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-application semantics (streaming/ingest.apply_changes)
    through the driver gate: fresher updates replace (R6), stale updates
    are skipped (R6), deletes cascade ONLY when nothing references the
    target (R4/R8 inbound-reference veto via edges anti-join). One
    synthesized cache/feed/edges triple per customer key, golden
    survivors."""
    from ..streaming.ingest import apply_changes

    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    uri = F.concat(F.lit("u"), k.cast("string"))
    cache = c.select(
        uri.alias("object_uri"),
        F.lit("2026-01-15 00:00:00").cast("timestamp").alias("record_time"),
        F.lit("v1").alias("data"),
    )
    changes = c.select(
        k.alias("seq"),
        F.when(k % 4 == 3, "2026-01-01 00:00:00")
        .otherwise("2026-02-01 00:00:00")
        .cast("timestamp")
        .alias("end_time"),
        F.when(k % 4 == 0, "update")
        .when(k % 4 == 3, "update")
        .otherwise("delete")
        .alias("change"),
        uri.alias("object_uri"),
        F.when(k % 4 == 0, "v2").when(k % 4 == 3, "v0").alias("payload"),
    )
    # inbound reference protects k%4==1 targets only
    edges = (
        c.filter(k % 4 == 1)
        .select(
            F.lit("subj").alias("subject"),
            F.lit("refers").alias("predicate"),
            uri.alias("object"),
        )
    )
    out = apply_changes(cache, changes, edges=edges)
    return out.select("object_uri", F.col("data").alias("v"))


@query(
    "k01_upsert_merge",
    oracle="""
    SELECT 'k' || c_custkey AS key,
           CASE WHEN c_custkey % 3 = 0 THEN 'new' ELSE 'old' END AS v
    FROM customer
    UNION ALL
    SELECT 'extra' || c_custkey, 'new' FROM customer WHERE c_custkey % 5 = 0
    """,
    survey="K1,K2",
)
def k01_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 upsert semantics (sinks/exports.merge_upsert — the engine's
    INSERT..ON CONFLICT DO UPDATE) through the driver gate: same-key rows
    are replaced by updates, unmatched keys survive, brand-new keys
    insert. Golden union oracle."""
    from ..sinks.exports import merge_upsert

    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    key = F.concat(F.lit("k"), k.cast("string"))
    existing = c.select(key.alias("key"), F.lit("old").alias("v"))
    updates = (
        c.filter(k % 3 == 0)
        .select(key.alias("key"), F.lit("new").alias("v"))
        .unionByName(
            c.filter(k % 5 == 0).select(
                F.concat(F.lit("extra"), k.cast("string")).alias("key"),
                F.lit("new").alias("v"),
            )
        )
    )
    return merge_upsert(existing, updates, "key")


@query(
    "rj02_overlapping_order_windows",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, n_name, o_orderdate
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT a.n_name, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM o a JOIN o b
      ON a.n_name = b.n_name AND a.o_orderkey < b.o_orderkey
     AND a.o_orderdate < b.o_orderdate + INTERVAL 7 DAY
     AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
    GROUP BY a.n_name
    """,
    survey="range-join-overlap",
)
def rj02_overlapping_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join through the bin-bucketed operator: pairs of
    orders from the same nation whose 7-day fulfilment windows
    intersect, counted per nation.  The oracle is the literal theta
    self-join; the Spark side runs operators/range_join.overlap_join —
    both sides explode to week bins keyed by (nation, bin), pairs meet
    on the equi-key, each pair emits once from its first shared bin, and
    the exact overlap predicate filters the residue.  At scale the
    candidate volume is bounded by per-(nation, week) co-residency, and
    the shuffle key carries the grouping dimension, so no theta join and
    no dedupe exchange exist anywhere in the plan."""
    from ..operators.range_join import overlap_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    o = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "o_orderkey", "n_name",
            F.col("o_orderdate").cast("timestamp").alias("w_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS"))
            .cast("timestamp").alias("w_end"),
        )
    )
    a = o.select(
        F.col("o_orderkey").alias("a_key"), "n_name",
        F.col("w_start").alias("a_start"), F.col("w_end").alias("a_end"),
    )
    b = o.select(
        F.col("o_orderkey").alias("b_key"), "n_name",
        F.col("w_start").alias("b_start"), F.col("w_end").alias("b_end"),
    )
    pairs = overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end",
        bin_seconds=7 * 86400, keys=("n_name",),
    ).filter(F.col("a_key") < F.col("b_key"))
    return pairs.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


@query(
    "r11_incremental_build",
    oracle="""
    SELECT 'K' || c_custkey AS comp_key,
           CASE c_custkey % 10 WHEN 0 THEN 'B' WHEN 1 THEN 'U' ELSE 'A' END
             || c_custkey AS label,
           CAST(CASE c_custkey % 10 WHEN 0 THEN 2 WHEN 2 THEN 4 ELSE 3 END
                AS BIGINT) AS n_names
    FROM customer
    """,
    survey="R1,R4,R5,R7,R8,A1,J5,J7",
)
def r11_incremental_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end incremental rebuild (VERDICT r9 #4): the
    reference's test_updates.py:78-309 flow — crawl feed -> watermark ->
    admission -> blast-radius slice rebuild -> splice — as ONE gate over
    the real pipeline (pipeline/incremental.py), the way d41 composes the
    dedup stages.

    Prev build: srcA_k ~ srcB_k pair components for every customer, each
    record named [K<k>, <src>name<k>].  Change feed (k = c_custkey):
    - k%10==0: DELETE srcA_k        -> entity shrinks to srcB (label B<k>)
    - k%10==1: UPDATE srcA_k        -> label U<k>, names [K<k>, Uname<k>]
    - k%10==2: CREATE srcN_k linking srcA_k -> component grows to 3
    - k%10==3: stale DELETE below the R1 watermark -> MUST be ignored
    - else: untouched -> final row comes from the SPLICE, not the rebuild
    The oracle states the final corpus analytically: any watermark leak
    (3-class turns into 0-class), blast-radius miss (2-class loses srcB's
    names), splice error (duplicate or lost untouched rows) or fold drift
    breaks a row."""
    from ..pipeline.build import run_build
    from ..pipeline.incremental import incremental_build

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    k = F.col("c_custkey")
    ks = k.cast("string")

    def rec(src: str, label_prefix: str, extra_name: str, link_to: str | None):
        uri = F.concat(F.lit(f"https://fixture.test/{src}/"), ks)
        fields = [
            uri.alias("id"),
            F.lit("Person").alias("type"),
            F.concat(F.lit(label_prefix), ks).alias("_label"),
            F.array(
                F.struct(
                    F.lit("Name").alias("type"),
                    F.concat(F.lit("K"), ks).alias("content"),
                ),
                F.struct(
                    F.lit("Name").alias("type"),
                    F.concat(F.lit(extra_name), ks).alias("content"),
                ),
            ).alias("identified_by"),
        ]
        if link_to is not None:
            fields.append(
                F.array(
                    F.struct(
                        F.concat(
                            F.lit(f"https://fixture.test/{link_to}/"), ks
                        ).alias("id"),
                        F.lit("Person").alias("type"),
                    )
                ).alias("equivalent")
            )
        return F.to_json(F.struct(*fields))

    def envelope(src: str, data):
        return cust.select(
            F.lit(src).alias("source"),
            ks.alias("identifier"),
            F.lit("Person").alias("rectype"),
            F.lit("2026-01-01T00:00:00").alias("record_time"),
            F.lit("create").alias("change"),
            data.alias("data"),
        )

    prev_records = envelope("srcA", rec("srcA", "A", "Aname", "srcB")).unionByName(
        envelope("srcB", rec("srcB", "B", "Bname", None))
    )
    indexes = {
        "name_index": empty_relation(spark, "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": empty_relation(spark, "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": empty_relation(spark, "uri_a string, uri_b string"),
        "different_from": empty_relation(spark, "uri_a string, uri_b string"),
    }
    order = {"srcA": 0, "srcB": 1, "srcN": 2}
    prev = run_build(spark, prev_records, indexes, merge_order=order)

    a_uri = F.concat(F.lit("https://fixture.test/srcA/"), ks)
    n_uri = F.concat(F.lit("https://fixture.test/srcN/"), ks)
    m = k % 10
    changes = (
        cust.filter(m.isin(0, 1, 2, 3))
        .select(
            k.alias("seq"),
            F.when(m == 3, F.lit("2026-01-10T00:00:00"))
            .otherwise(F.lit("2026-02-01T00:00:00"))
            .cast("timestamp")
            .alias("end_time"),
            F.when(m.isin(0, 3), F.lit("delete"))
            .when(m == 1, F.lit("update"))
            .otherwise(F.lit("create"))
            .alias("change"),
            F.when(m == 2, n_uri).otherwise(a_uri).alias("object_uri"),
            F.when(m == 1, rec("srcA", "U", "Uname", "srcB"))
            .when(m == 2, rec("srcN", "N", "Nname", "srcA"))
            .alias("payload"),
        )
    )
    inc = incremental_build(
        spark,
        prev_records,
        changes,
        indexes,
        idmap_prev=prev["idmap"],
        prev_merged=prev["merged"],
        merge_order=order,
        last_harvest="2026-01-15T00:00:00",
    )
    names_schema = "identified_by array<struct<type:string,content:string>>"
    return inc["merged_full"].select(
        F.get_json_object(F.col("data"), "$.identified_by[0].content").alias("comp_key"),
        F.get_json_object(F.col("data"), "$._label").alias("label"),
        F.size(F.from_json(F.col("data"), names_schema).identified_by)
        .cast("long")
        .alias("n_names"),
    )


@query(
    "r12_entity_stream_fold",
    oracle="""
    SELECT 'K' || c_custkey AS comp_key,
           CASE c_custkey % 10 WHEN 0 THEN 'B' WHEN 1 THEN 'V' ELSE 'A' END
             || c_custkey AS label,
           CAST(CASE c_custkey % 10 WHEN 0 THEN 2 WHEN 2 THEN 4 ELSE 3 END
                AS BIGINT) AS n_names
    FROM customer
    """,
    survey="R1,R4,R5,R7,A1,J5,J7,stream-state",
)
def r12_entity_stream_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING incremental path and its delta (merge-on-read) state
    layout as one driver gate (round 12): r11_incremental_build proves
    the batch operator; this runs the real `stream_entity_builds` — two
    crawl FILES become two micro-batches through the checkpoint
    machinery, each writing a blast-sized delta, and the returned rows
    come out of `latest_state`'s fold (base + both deltas,
    last-writer-wins).

    Same pair corpus and change classes as r11 (k = c_custkey), split so
    the fold has real winner-over-winner work:
    - crawl 1: k%10==1 UPDATE srcA (label U<k>); k%10==0 DELETE srcA
    - crawl 2: k%10==1 UPDATE srcA AGAIN (label V<k> — crawl 2's delta
      must beat crawl 1's through the fold); k%10==2 CREATE srcN linking
      srcA; k%10==3 stale DELETE below the R1 watermark (must be vetoed)
    The oracle states the folded corpus analytically: a fold
    ordering bug (V turns into U), a tombstone bug (0-class keeps srcA's
    names), a watermark leak (3-class becomes 0-class) or a lost
    untouched row breaks it.  State/checkpoint dirs are fresh per
    invocation (tempfile), so retries and the driver's re-run cannot
    cross-contaminate; the workdir is reclaimed before returning (the
    result is materialized first — it read the state parquet lazily)."""
    import os
    import shutil
    import tempfile

    from ..streaming.entity_stream import (
        init_state,
        latest_state,
        stream_entity_builds,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    k = F.col("c_custkey")
    ks = k.cast("string")

    def rec(src: str, label_prefix: str, extra_name: str, link_to: str | None):
        uri = F.concat(F.lit(f"https://fixture.test/{src}/"), ks)
        fields = [
            uri.alias("id"),
            F.lit("Person").alias("type"),
            F.concat(F.lit(label_prefix), ks).alias("_label"),
            F.array(
                F.struct(
                    F.lit("Name").alias("type"),
                    F.concat(F.lit("K"), ks).alias("content"),
                ),
                F.struct(
                    F.lit("Name").alias("type"),
                    F.concat(F.lit(extra_name), ks).alias("content"),
                ),
            ).alias("identified_by"),
        ]
        if link_to is not None:
            fields.append(
                F.array(
                    F.struct(
                        F.concat(
                            F.lit(f"https://fixture.test/{link_to}/"), ks
                        ).alias("id"),
                        F.lit("Person").alias("type"),
                    )
                ).alias("equivalent")
            )
        return F.to_json(F.struct(*fields))

    def envelope(src: str, data):
        return cust.select(
            F.lit(src).alias("source"),
            ks.alias("identifier"),
            F.lit("Person").alias("rectype"),
            F.lit("2026-01-01T00:00:00").alias("record_time"),
            F.lit("create").alias("change"),
            data.alias("data"),
        )

    records = envelope("srcA", rec("srcA", "A", "Aname", "srcB")).unionByName(
        envelope("srcB", rec("srcB", "B", "Bname", None))
    )
    indexes = {
        "name_index": empty_relation(spark, "source string, name_clean string, target_identifier string, rectype string"),
        "uri_index": empty_relation(spark, "source string, ext_uri string, target_identifier string, rectype string"),
        "same_as": empty_relation(spark, "uri_a string, uri_b string"),
        "different_from": empty_relation(spark, "uri_a string, uri_b string"),
    }
    order = {"srcA": 0, "srcB": 1, "srcN": 2}

    a_uri = F.concat(F.lit("https://fixture.test/srcA/"), ks)
    n_uri = F.concat(F.lit("https://fixture.test/srcN/"), ks)
    m = k % 10
    crawl1 = cust.filter(m.isin(0, 1)).select(
        k.alias("seq"),
        F.lit("2026-02-01T00:00:00").cast("timestamp").alias("end_time"),
        F.when(m == 0, F.lit("delete")).otherwise(F.lit("update")).alias("change"),
        a_uri.alias("object_uri"),
        F.when(m == 1, rec("srcA", "U", "Uname", "srcB")).alias("payload"),
    )
    crawl2 = cust.filter(m.isin(1, 2, 3)).select(
        k.alias("seq"),
        F.when(m == 3, F.lit("2026-01-10T00:00:00"))
        .otherwise(F.lit("2026-02-02T00:00:00"))
        .cast("timestamp")
        .alias("end_time"),
        F.when(m == 3, F.lit("delete"))
        .when(m == 1, F.lit("update"))
        .otherwise(F.lit("create"))
        .alias("change"),
        F.when(m == 2, n_uri).otherwise(a_uri).alias("object_uri"),
        F.when(m == 1, rec("srcA", "V", "Vname", "srcB"))
        .when(m == 2, rec("srcN", "N", "Nname", "srcA"))
        .alias("payload"),
    )

    work = tempfile.mkdtemp(prefix="r12_stream_gate_")
    feed_dir = os.path.join(work, "feed")
    os.makedirs(feed_dir)
    for i, crawl in enumerate((crawl1, crawl2)):
        tmp = os.path.join(work, f"stage{i}")
        crawl.coalesce(1).write.json(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(feed_dir, f"crawl{i}.json")
        os.rename(os.path.join(tmp, part), dst)
        # FileStreamSource orders micro-batches by mtime — pin crawl order
        os.utime(dst, (1000 + i, 1000 + i))

    state_dir = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    init_state(spark, records, indexes, state_dir, merge_order=order)
    q = stream_entity_builds(
        spark, feed_dir, state_dir, ckpt, indexes,
        merge_order=order, last_harvest="2026-01-15T00:00:00",
    )
    q.awaitTermination(600)

    names_schema = "identified_by array<struct<type:string,content:string>>"
    out = latest_state(spark, state_dir, ckpt)["merged"].select(
        F.get_json_object(F.col("data"), "$.identified_by[0].content").alias("comp_key"),
        F.get_json_object(F.col("data"), "$._label").alias("label"),
        F.size(F.from_json(F.col("data"), names_schema).identified_by)
        .cast("long")
        .alias("n_names"),
    )
    # materialize, then reclaim the corpus-scale workdir (ADVICE r12:
    # the gate runs at least twice per round — verify + bench — and each
    # run leaked full state tiers + feed + checkpoint into /tmp).  A
    # driver-local copy is fine: the gate corpus is fixture-sized by
    # construction (customer keys mod 10).
    rows = out.collect()
    shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)
