"""Range (interval-containment) join — point-in-interval matching without
a theta join.

Spark executes ``p BETWEEN start AND end`` joins as
BroadcastNestedLoopJoin / cartesian-per-key — quadratic and
memory-hostile at scale.  The standard scale-path restatement is BIN
BUCKETING: intervals explode to every fixed-width bin they overlap,
points map to exactly ONE bin, the join becomes an equi-join on the bin,
and the containment predicate filters the residue.  Because a point
belongs to a single bin, each qualifying (point, interval) pair is
produced exactly once — no dedupe pass.

Cost: |intervals| x avg_bins_per_interval + |points| shuffled on the bin
key; candidate pairs are bounded by bin co-residency instead of the
cross product.  Pick a bin width comparable to the typical interval
length (here: month granularity for day-scale shipping windows, so
~1-2 bins per interval).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: str = "1 month",
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them
    (``start <= p <= end``, inclusive).  Timestamp columns; returns all
    columns of both inputs.  Degenerate/invalid intervals (end < start)
    produce no rows, matching the SQL BETWEEN predicate.

    ``bin_width`` must be a single calendar unit ("1 month", "1 day", ...):
    points are truncated onto the unit grid while interval bins step from
    each interval's own truncated start, so a multi-unit width ("2 weeks")
    would put the two sides on misaligned grids and silently drop matches.
    """
    parts = bin_width.split()
    if len(parts) != 2 or parts[0] != "1":
        raise ValueError(
            f"bin_width must be '1 <unit>' (got {bin_width!r}): points and "
            "intervals share a grid only when the bin stride equals the "
            "truncation unit"
        )

    def trunc(c: Column) -> Column:
        unit = bin_width.split()[-1].rstrip("s")
        return F.date_trunc(unit, c)

    iv = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                trunc(F.col(start_col)),
                trunc(F.col(end_col)),
                F.expr(f"interval {bin_width}"),
            )
        ),
    )
    pt = points.withColumn("_bin", trunc(F.col(point_col)))
    return (
        pt.join(iv, "_bin")
        .filter(
            (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )
