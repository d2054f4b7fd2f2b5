"""Third relational batch: pivot, multiset set-ops, lead/lag windows —
plan families rounding out the §2.5–2.7 coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, query, sql_dsum

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "a23_pivot_segments",
    oracle=f"""
    SELECT n_name,
           {", ".join(f"CAST(SUM(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS {s.lower()}" for s in SEGMENTS)}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    survey="A2,A13,X2",
)
def a23_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-nation customer counts fanned into one column per market
    segment (the facet-column extraction shape X2 as a relational pivot).
    Spark's pivot with explicit values = one aggregation pass, no second
    distinct-scan."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    out = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", list(SEGMENTS))
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "n_name", *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in SEGMENTS]
    )
    return renamed


@query(
    "t05_except_all_lineitems",
    oracle="""
    SELECT l_orderkey FROM lineitem
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    survey="T2,T3",
)
def t05_except_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): multiplicity-aware removal — the
    exact form of the update-set diffs (T2) when duplicates matter."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return li.exceptAll(returned)


@query(
    "w10_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           date_diff('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev
    FROM orders
    """,
    survey="W1,W2,R6",
)
def w10_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window: days since the customer's previous order — the
    freshness-comparison shape (R6) as an analytic column. NULL for each
    customer's first order, exactly as the oracle's LAG."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("bigint").alias(
            "days_since_prev"
        ),
    )


@query(
    "w11_ntile_quartiles",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
    survey="W1,W3,A8",
)
def w11_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: balance quartiles with a deterministic total order
    (the scored-ranking family A8 as equal-frequency banding)."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "a24_conditional_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT CASE WHEN o_totalprice > 200000 THEN o_custkey END) AS big_spenders,
           COUNT(DISTINCT o_custkey) AS all_customers
    FROM orders GROUP BY o_orderpriority
    """,
    survey="A13,A14",
)
def a24_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional distinct-count: distinct customers filtered inside the
    aggregate (metatype-accumulation A13 with a predicate gate)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct(
            F.when(F.col("o_totalprice") > 200000, F.col("o_custkey"))
        ).alias("big_spenders"),
        F.countDistinct("o_custkey").alias("all_customers"),
    )


@query(
    "q20_part_promotion",
    oracle="""
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 50
    )
    ORDER BY s_suppkey
    """,
    survey="J9,T3,A2,P1",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved >50 units of any 'small%'
    part — nested IN decorrelated to groupBy + semi-join."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    movers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "q21_sole_supplier_orders",
    oracle="""
    SELECT l_suppkey AS suppkey, COUNT(DISTINCT l_orderkey) AS n_sole_orders
    FROM lineitem a
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem b
        WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey
    )
    GROUP BY l_suppkey
    """,
    survey="J9,T2,T3,A14",
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's correlation core: orders supplied by exactly one
    supplier — NOT EXISTS on a self-referencing condition decorrelated
    into a per-order distinct count + semi-join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    sole = per_order.filter(F.col("n_supp") == 1).select("l_orderkey")
    return (
        li.join(sole, "l_orderkey", "left_semi")
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.countDistinct("l_orderkey").alias("n_sole_orders"))
    )


@query(
    "s08_tier_counts",
    oracle="""
    SELECT 'customer' AS tier, COUNT(*) AS n FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'documents', COUNT(*) FROM documents
    UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
    """,
    survey="S8,A14",
)
def s08_tier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan cardinalities per cache tier (S8 iter_records + A14
    counts, postgres.py:166-171): count-star reads only parquet footers."""
    rows = None
    for t in ("customer", "orders", "lineitem", "documents", "embeddings"):
        one = (
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(t).alias("tier"), "n")
        )
        rows = one if rows is None else rows.unionAll(one)
    return rows


@query(
    "f06_display_year",
    oracle="""
    SELECT o_orderkey,
           CAST(regexp_extract(strftime(o_orderdate, '%Y-%m-%d'), '^(-?\\d+)', 1) AS BIGINT) AS display_year
    FROM orders
    """,
    survey="F6,F7",
)
def f06_display_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Display-year extraction from ISO strings (F6, mapper_utils.py:
    130-143) — the sign-preserving regex form that also handles the BCE
    strings Spark timestamps can't hold."""
    from ..functions.dates import year_of

    orders = load_table(spark, sf_dir, "orders")
    iso = F.date_format("o_orderdate", "yyyy-MM-dd")
    return orders.select("o_orderkey", year_of(iso).alias("display_year"))


@query(
    "f04_timespan_defaults",
    oracle="""
    SELECT event_id,
           COALESCE(CASE WHEN event_id % 2 = 0 THEN NULL
                         ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END,
                    '-9999-01-01T00:00:00') AS begin_iso,
           COALESCE(CASE WHEN event_id % 3 = 0 THEN NULL
                         ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END,
                    '9999-12-31T23:59:59') AS end_iso
    FROM events
    """,
    survey="F4",
)
def f04_timespan_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timespan sentinel defaults (F4, final/mapper.py:665-676): missing
    begin/end bounds fill with the +/-9999 sentinels so range queries
    always have comparable endpoints."""
    ev = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    begin = F.when(F.col("event_id") % 2 == 0, F.lit(None)).otherwise(iso)
    end = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(iso)
    return ev.select(
        "event_id",
        F.coalesce(begin, F.lit("-9999-01-01T00:00:00")).alias("begin_iso"),
        F.coalesce(end, F.lit("9999-12-31T23:59:59")).alias("end_iso"),
    )


@query(
    "a27_stat_moments",
    oracle="""
    WITH g AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           SQRT((sxx - sx * sx / n) / (n - 1)) AS std_qty
    FROM g
    """,
    survey="A13",
)
def a27_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments (sample mean/variance/stddev) per group
    (A13 merge-aggregation family; reference summarize.go computes the
    same moments natively). Built from exact decimal sums of x and x^2 so
    the result is order-independent — the two-pass numeric stability and
    engine-portability concerns of stddev_samp() are sidestepped by
    deriving the moments from exact accumulators, then doing the final
    division/sqrt in IEEE double (correctly-rounded, identical bits in
    any engine). Map-side partial aggregation applies; one shuffle on the
    group key at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(qty).alias("sx"),
        dsum(qty * qty).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / n) / (n - 1)
    return g.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("std_qty"),
    )


@query(
    "a28_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND e.ts >= v.t1 AND e.ts <= v.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id
        FROM events e
        JOIN c ON e.user_id = c.user_id
        JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts >= c.t2 AND e.ts <= v.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    )
    SELECT 1 AS step, 'view' AS event_type, CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
    """,
    survey="W-family,sequential-pattern",
)
def a28_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase within 7 days
    of the user's FIRST view) — the sequential-pattern aggregate every
    event-analytics engine ships.  Step k counts users whose first
    step-k event follows their step-(k-1) anchor in event TIME, not just
    existence — so the join chain carries the anchors (t1, t2) forward
    and each stage is one aggregate + one broadcast-or-shuffled
    equi-join on user_id.  At 100 TB the events scan is pruned to the
    three funnel event types (PushedFilters on event_type) and every
    stage shuffles only (user_id, anchor) pairs — never raw events.
    MIN anchors make the result deterministic; counts are exact."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    horizon = F.col("t1") + F.expr("INTERVAL 7 DAYS")
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") <= horizon))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") <= horizon))
        .select("user_id")
        .distinct()
    )

    def row(step: int, etype: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(etype).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return row(1, "view", v).unionByName(row(2, "click", c)).unionByName(
        row(3, "purchase", p)
    )


@query(
    "a29_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(floor(date_diff('day', f.cohort_week,
                                    CAST(date_trunc('week', e.ts) AS DATE)) / 7)
                    AS BIGINT) AS week_k
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_k,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size
    FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_k, s.cohort_size
    """,
    survey="A-family,cohort-analytics",
)
def a29_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts — the second classic event-analytics
    aggregate next to a28's funnel: users are cohorted by the Monday of
    their first event's week, and each (cohort_week, week_k) cell counts
    users from that cohort active k weeks later, with the cohort size
    alongside (the retention ratio is the caller's one division).
    Deterministic throughout: MIN first-event, date_trunc to Monday,
    integer week arithmetic, exact counts.

    Scale shape: one aggregate to cohort users (shuffle on user_id), one
    user_id equi-join to tag activity, one distinct + count on
    (cohort, week) — the distinct is the only corpus-sized exchange and
    it carries 3 small columns.  At 100 TB the firsts relation is the
    user dimension (bounded by users, not events) and the cohort cells
    are a few hundred rows."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    week = lambda c: F.date_trunc("week", c).cast("date")
    firsts = events.groupBy("user_id").agg(F.min(week(F.col("ts"))).alias("cohort_week"))
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(week(F.col("ts")), F.col("cohort_week")) / 7
            ).cast("bigint").alias("week_k"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        activity.groupBy("cohort_week", "week_k")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "cohort_week")
        .select("cohort_week", "week_k", "n_active", F.col("cohort_size").cast("bigint").alias("cohort_size"))
    )
