"""Relational operator surface (SURVEY §2.1/2.3–2.7) over the testdata star schema.

Each query is the Spark-first restatement of a reference operator family:
scans with pushdown (S8–S12), filters (P1–P8), equality joins incl. broadcast
(J1–J12 analogs), aggregations (A1–A17), windows/top-k (W1–W7) and set ops
(T1–T4). Reference citations are in the docstrings (file:line into
/root/reference); implementations are independent DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, query, sql_dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation family (A1/A2/A14: merger.py's fold == groupBy+agg)
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A2,A14,S8",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped fold: the record-merge aggregation family
    (merger.py:670-1022) restated as groupBy+agg with exact decimal sums.
    Map-side partial aggregation keeps the shuffle tiny at 100TB."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    disc = price * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(price).alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey="J1,J9,A2,W6,W7",
)
def q02_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped join+agg+top-k. customer auto-broadcasts from
    stats at test SF; at 100TB it scales with the data, so no forced
    hint — AQE picks the join strategy (the LMDB-index join pattern of
    reconciler.py:197-274 only broadcasts BOUNDED curated indexes)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q03_order_priority_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    survey="J1,T3,A14",
)
def q03_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped semi-join (EXISTS): the reconcile 'has index entry'
    gate (P3, process/base/reconciler.py:16-45) is exactly a left-semi join."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q04_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    survey="J2,J9,A2",
)
def q04_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join. Fixed-size dims (region/nation) are
    hinted broadcast; customer/supplier scale with SF so their strategy is
    left to stats/AQE — at test SF they broadcast, at 100TB they degrade
    gracefully to shuffled joins. Only orders⋈lineitem must shuffle."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q05_revenue_forecast",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.09
      AND l_quantity < 24
    """,
    survey="P1,S10,A2",
)
def q05_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped scan+filter+scalar agg; every predicate reaches the
    parquet scan (PushedFilters), the loader-prefilter pattern (P1,
    wikidata/loader.py:27-32)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q06_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    survey="J9,A14",
)
def q06_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped outer join + double aggregation (histogram of
    per-entity reference counts — the refCtr pattern, marklogic/mapper.py)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q07_parts_by_brand",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_parts,
           {sql_dsum('p_retailprice')} AS total_price,
           MAX(p_size) AS max_size
    FROM part WHERE p_type NOT LIKE 'MEDIUM%'
    GROUP BY p_brand
    """,
    survey="S11,P1,A2",
)
def q07_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-filtered scan + group (S11: iter_records_type,
    postgres.py:357-400) with a negative LIKE prefilter."""
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(~F.col("p_type").startswith("MEDIUM"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum(F.col("p_retailprice")).alias("total_price"),
            F.max("p_size").alias("max_size"),
        )
    )


@query(
    "p06_reference_stub",
    oracle="""
    SELECT doc_id, source, lang FROM documents
    """,
    survey="P6",
)
def p06_reference_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record projection to a reference stub (P6, mapper.py:291-303:
    reduce to {id, type, _label}): a pure column-pruned select — the scan
    must read only 3 of 5 columns (ReadSchema shows the pruning)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", "source", "lang")


# --------------------------------------------------------------------------
# Scan family (S9–S12)
# --------------------------------------------------------------------------
@query(
    "s09_sliced_scan",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM (
        SELECT o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
        FROM orders
    ) WHERE rn % 24 = 7
    """,
    survey="S9,W1",
)
def s09_sliced_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 24-way modulo-row_number partitioner
    (postgres.py:281-317) reproduced literally — in Spark this is normally
    just repartition(N), kept here as the declared-window form."""
    orders = _t(spark, sf_dir, "orders")
    w = W.orderBy("o_orderkey")
    return (
        orders.select("o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") % 24 == 7)
        .drop("rn")
    )


@query(
    "s10_records_since",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
    """,
    survey="S10,R2",
)
def s10_records_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-filtered scan (iter_records_since, postgres.py:319-341);
    the predicate pushes to parquet row-group stats → partition pruning."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("ts") >= "2024-01-20 00:00:00").select(
        "event_id", "ts", "user_id", "event_type"
    )


@query(
    "s11_type_scan",
    oracle="""
    SELECT event_type, COUNT(*) AS n, CAST(MIN(value) AS DOUBLE) AS min_value
    FROM events WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    """,
    survey="S11",
)
def s11_type_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-discriminator scan: the Concept IN-list variant of
    iter_records_type (postgres.py:357-400)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("value").cast("double").alias("min_value"))
    )


@query(
    "s12_point_prefix_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_name LIKE 'Customer#00000001%'
    """,
    survey="S12",
)
def s12_point_prefix_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point/prefix lookup (get/get_like, postgres.py:225-260) as a
    pushed-down StartsWith filter."""
    cust = _t(spark, sf_dir, "customer")
    return cust.filter(F.col("c_name").startswith("Customer#00000001")).select(
        "c_custkey", "c_name", "c_acctbal"
    )


# --------------------------------------------------------------------------
# Window / top-k family (W1–W7, A6–A8, W4)
# --------------------------------------------------------------------------
@query(
    "w03_first_lineitem_per_order",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM (
        SELECT l_orderkey, l_linenumber, l_shipdate,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_shipdate, l_linenumber) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
    survey="A6,W2,W3",
)
def w03_first_lineitem_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pick-best-per-group (timespan pick-best A6, merger.py:542-622):
    deterministic min-by via window with total-order tiebreak."""
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return (
        li.select("l_orderkey", "l_linenumber", "l_shipdate", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "w04_top_customer_per_nation",
    oracle="""
    SELECT n_name, c_name, c_acctbal FROM (
        SELECT n_name, c_name, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY n_name
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn = 1
    """,
    survey="A7,W4",
)
def w04_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by-with-score (geometry pick-best A7, merger.py:177-244):
    argmax per group with deterministic tiebreak."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        joined.select("n_name", "c_name", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "w05_top3_customers_per_segment",
    oracle="""
    SELECT c_mktsegment, c_name, c_acctbal, rk FROM (
        SELECT c_mktsegment, c_name, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_name) AS rk
        FROM customer
    ) WHERE rk <= 3
    """,
    survey="A8,W3",
)
def w05_top3_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-name election (A8, final/mapper.py:366-646): scored ranking
    within (entity, language) groups; here (segment) with top-3."""
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_name")
    return (
        cust.select("c_mktsegment", "c_name", "c_acctbal", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "w06_top10_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    survey="W6,W7",
)
def w06_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (page/limit W6): Spark runs this as per-partition top-k
    + a final tiny merge (TakeOrderedAndProject), no full sort at scale."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "w08_running_user_value",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    """,
    survey="W1,A12",
)
def w08_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate per key (cumulative fold — the incremental
    reference-count accumulation pattern, reference_manager.py:100-139)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(30,6)")).over(w).cast("double").alias("running_value"),
    )


# --------------------------------------------------------------------------
# Aggregation extras (A12–A17)
# --------------------------------------------------------------------------
@query(
    "a12_min_value_per_user",
    oracle="""
    SELECT user_id, CAST(MIN(value) AS DOUBLE) AS min_value, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    survey="A12",
)
def a12_min_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-distance aggregation (A12, reference_manager.py:100-139):
    groupBy key, keep minimum observed value."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("value").cast("double").alias("min_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "a13_event_types_per_user",
    oracle="""
    SELECT user_id,
           STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types,
           COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
    survey="A13,T1",
)
def a13_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metatype accumulation (A13, collect_set per key,
    reference_manager.py:162-168) — emitted as a sorted joined string so the
    hash is array-order-independent."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "a15_latest_timestamp",
    oracle="""
    SELECT MAX(ts) AS latest, MIN(ts) AS earliest, COUNT(*) AS n
    FROM events
    """,
    survey="A14,A15",
)
def a15_latest_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark seed (A15: latest(), postgres.py:202-210) — max/min/count
    in one pass."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.max("ts").alias("latest"), F.min("ts").alias("earliest"), F.count(F.lit(1)).alias("n")
    )


@query(
    "a17_source_spam_guard",
    oracle="""
    SELECT source, COUNT(*) AS n_docs
    FROM documents GROUP BY source HAVING COUNT(*) > 20
    """,
    survey="A17",
)
def a17_source_spam_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-prefix spam guard (A17, collector.py:201-218): count per
    prefix/source, distrust groups above a threshold."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 20)
    )


# --------------------------------------------------------------------------
# Set operations (T1–T4)
# --------------------------------------------------------------------------
@query(
    "t01_union_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    survey="T1",
)
def t01_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalents-union (T1, reconciler.py:198-212): DF union + distinct."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@query(
    "t02_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01')
    """,
    survey="T2",
)
def t02_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-difference for deletes (T2, update_manager.py:147-181): left
    anti join — the scalable NOT IN. Scoped to orders since a cutoff so
    the result is non-empty on the synthetic data (every customer has
    SOME order; a 0-row gate would be vacuously green)."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "t04_nations_in_both",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    survey="T4",
)
def t04_nations_in_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intersection veto (T4, collector.py:228-233)."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


# --------------------------------------------------------------------------
# Non-equi date-proximity predicate (P4)
# --------------------------------------------------------------------------
@query(
    "p04_date_proximity_pairs",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_close_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
    WHERE ABS(epoch_us(b.ts) - epoch_us(a.ts)) <= 3600000000
    GROUP BY a.user_id
    """,
    survey="P4,J5",
)
def p04_date_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-plausibility join (P4, collector.py:35-106: |year_a-year_b|<=10):
    the reference applies the range predicate after an entity-key equi-join,
    which generates O(k^2) candidates per key before filtering — a straggler
    task on any hot key at scale.  Bounded form (the range_join.py bin
    pattern applied to point-point proximity): bucket ts to the hour and
    equi-join on (user_id, bin), probing each left event against its own
    and both adjacent bins.  Any pair within 1h differs by at most one bin,
    and each pair meets in exactly one probe (b's bin is unique), so the
    result is identical while candidates are bounded by per-(user, hour)
    co-residency instead of per-user totals."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    hour_bin = F.date_trunc("hour", F.col("ts"))
    one_hour = F.expr("INTERVAL 1 HOUR")
    a = ev.withColumn(
        "probe_bin",
        F.explode(F.array(hour_bin - one_hour, hour_bin, hour_bin + one_hour)),
    ).alias("a")
    b = ev.withColumn("bin", hour_bin).alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.probe_bin") == F.col("b.bin")),
        )
        .filter(
            (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("b.ts") >= F.col("a.ts") - one_hour)
            & (F.col("b.ts") <= F.col("a.ts") + one_hour)
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_close_pairs"))
    )
