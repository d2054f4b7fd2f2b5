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
           {", ".join(f"SUM(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END) AS {s.lower()}" for s in SEGMENTS)}
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
