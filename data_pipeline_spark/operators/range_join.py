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


def _bin_bounds(s: str, e: str, bin_seconds: int) -> tuple[Column, Column]:
    """(lo, hi) epoch-bin indices the interval [s, e) touches — the ONE
    definition of the bin-boundary rule, used by both the long/short
    classifier (nbins) and the candidate explode (bins), which must
    agree or 'short' intervals could fan out past the max_bins cap.

    Fractional-second safe: timestamps cast to double epoch seconds
    (unix_timestamp would truncate, silently unbinning an interval whose
    sub-second tail crosses a bin edge).  Half-open end: an interval
    ending EXACTLY on a bin edge does not touch that bin ->
    ceil(e/bin) - 1 (== floor for interior ends, edge-exclusive on the
    boundary)."""
    lo = F.floor(F.col(s).cast("double") / bin_seconds)
    hi = F.ceil(F.col(e).cast("double") / bin_seconds) - 1
    return lo, hi


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


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
    keys: tuple[str, ...] = (),
    max_bins: int | None = None,
) -> DataFrame:
    """Interval-OVERLAP join: every (left, right) pair whose half-open
    intervals intersect (``ls < re AND rs < le``) — the two-sided sibling
    of range_join's point-in-interval.

    Scale shape: both sides explode to the fixed-width epoch bins their
    interval touches and meet on the bin — an equi-join whose candidates
    are bounded by bin co-residency, never a theta join.  A pair sharing
    several bins is emitted ONCE: only from the FIRST shared bin, which
    is max(first_bin_left, first_bin_right) — the d08 first-shared-
    segment trick, so no dedupe exchange.  ``keys`` are equi-join columns
    carried alongside the bin (e.g. a grouping dimension), so candidates
    co-reside per (key, bin).  Pick ``bin_seconds`` near the typical
    interval length: shorter bins multiply the fan-out, longer bins
    admit more false candidates for the residual predicate.

    ``max_bins`` is the long-interval cap for HEAVY-TAILED length
    distributions (SCALE.md round 7): an interval touching more than
    ``max_bins`` bins would explode into that many rows — a single
    year-long outlier at minute bins is ~526k rows in one task's
    lineage.  With the cap set, over-long intervals leave the bin path
    entirely and meet the other side through a broadcast join instead
    (long outliers are FEW under the heavy-tail assumption — that is
    what makes them broadcastable).  The pair space partitions exactly:
    short x short through bins, long-left x all-right and short-left x
    long-right through the broadcast — disjoint and complete, results
    identical (property-tested).  None (default) keeps the pure bin
    path for bounded-length intervals like rj02's fixed 7-day windows.

    Self-joins: rename the columns of at least one side first (as rj02
    does) — both inputs' columns survive into the residual filter, so
    shared names throw AMBIGUOUS_REFERENCE at analysis time.
    """
    lf = left.filter(F.col(left_end) > F.col(left_start))
    rf = right.filter(F.col(right_end) > F.col(right_start))
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )

    def nbins(s: str, e: str) -> Column:
        # same _bin_bounds as the explode — the long/short classifier
        # and the actual bin fan-out cannot drift apart
        lo, hi = _bin_bounds(s, e, bin_seconds)
        return F.greatest(hi, lo) - lo + 1

    if max_bins is None:
        return _binned_overlap(
            lf, rf, left_start, left_end, right_start, right_end, bin_seconds, keys
        ).filter(overlap)

    l_long = nbins(left_start, left_end) > max_bins
    r_long = nbins(right_start, right_end) > max_bins

    def bcast(small: DataFrame, big: DataFrame) -> DataFrame:
        # keys equi-join (column-merging, same shape as the bin path's
        # name-list join) with the broadcast-bounded small side; the
        # overlap predicate is the residual.  With no keys this is a
        # broadcast nested-loop — bounded by the few-outliers premise.
        if keys:
            j = big.join(F.broadcast(small), list(keys))
        else:
            j = big.join(F.broadcast(small), F.lit(True))
        return j.filter(overlap)

    short = _binned_overlap(
        lf.filter(~l_long), rf.filter(~r_long),
        left_start, left_end, right_start, right_end, bin_seconds, keys,
    ).filter(overlap)
    long_left = bcast(lf.filter(l_long), rf)              # long-L x all-R
    long_right = bcast(rf.filter(r_long), lf.filter(~l_long))  # short-L x long-R
    return short.unionByName(long_left).unionByName(long_right)


def _binned_overlap(
    lf: DataFrame,
    rf: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
    keys: tuple[str, ...],
) -> DataFrame:
    """The bin-bucketed candidate join (callers apply the exact overlap
    residual): explode to epoch bins, meet on (bin, keys), emit each
    pair once from its first shared bin."""

    def bins(s: str, e: str, lo_alias: str) -> tuple[Column, Column]:
        lo, hi = _bin_bounds(s, e, bin_seconds)
        return lo.alias(lo_alias), F.sequence(lo, F.greatest(lo, hi))

    llo, lbins = bins(left_start, left_end, "_llo")
    rlo, rbins = bins(right_start, right_end, "_rlo")
    lx = lf.select("*", llo, F.explode(lbins).alias("_bin"))
    rx = rf.select("*", rlo, F.explode(rbins).alias("_bin"))
    return (
        lx.join(rx, ["_bin", *keys])
        .filter(F.col("_bin") == F.greatest(F.col("_llo"), F.col("_rlo")))
        .drop("_bin", "_llo", "_rlo")
    )
