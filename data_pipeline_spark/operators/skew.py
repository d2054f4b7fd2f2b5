"""Skew-mitigation primitives for 100TB joins/aggregations.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew
at runtime, but two cases still need explicit salting:

- **skewed groupBy** where one key holds a large share of rows (the
  refCtr/top-k-exclusion problem — marklogic/mapper.py's most-referenced
  entities): two-phase aggregate via a salt column;
- **skewed broadcast-probe joins** where hot keys overload single tasks:
  replicate the small side per salt.

Both helpers are pure dataflow (no conf changes) and deterministic given
the salt count: the salt derives from a hash of the full row's key plus a
uniform spread column, never from rand() — reruns produce identical
partitioning, which keeps the engine's everything-is-reproducible contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, spread_cols: list[str], n_salts: int = 16) -> DataFrame:
    """Attach a deterministic `_salt` in [0, n_salts): hash of the spread
    columns (any columns that vary within the hot key — a row id, a
    timestamp). Deterministic: same rows -> same salts."""
    return df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in spread_cols]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    spread_cols: list[str],
    partial: list[Column],
    final: Callable[[DataFrame], DataFrame],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation:

    phase 1 groups by (key, salt) — hot keys fan out over n_salts tasks;
    phase 2 groups by key over the tiny partial result. ``partial`` are the
    phase-1 aggregate columns; ``final`` folds the partials (it receives
    the phase-1 frame grouped-ready).

    Example (count per possibly-hot key):
        salted_agg(df, ["k"], ["row_id"],
                   [F.count(F.lit(1)).alias("c")],
                   lambda p: p.groupBy("k").agg(F.sum("c").alias("c")))
    """
    phase1 = (
        salted(df, spread_cols, n_salts)
        .groupBy(*group_cols, "_salt")
        .agg(*partial)
    )
    return final(phase1.drop("_salt"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    spread_cols: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salts, join on (key..., salt). Output == plain join on
    `key` (verified in tests); cost = small side x n_salts, which is the
    point — the small side is bounded, the hot key no longer is.
    ``key`` may be a single column name or a list (composite equi-key).

    When the "small" side ISN'T bounded (both relations scale with the
    corpus and only a few keys are hot), use ``hot_key_salted_join``
    instead — blanket replication multiplies the whole right side by
    n_salts.

    ``how`` must preserve the right side's multiplicity-per-match
    (inner/left/semi/anti): an outer form that emits UNMATCHED right
    rows would emit each one once per salt replica — rejected rather
    than silently duplicated."""
    if how in ("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"):
        raise ValueError(
            f"salted_join cannot preserve unmatched right rows under {how!r}: "
            "the right side is replicated per salt"
        )
    keys = [key] if isinstance(key, str) else list(key)
    b = salted(big, spread_cols, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")


def hot_key_salted_join(
    big: DataFrame,
    right: DataFrame,
    key: str | list[str],
    spread_cols: list[str],
    n_salts: int = 16,
    hot_threshold: int = 1000,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for TWO corpus-scale sides: split the key space
    into hot (frequency on the probe side above ``hot_threshold``) and
    cold, salt only the hot slice, plain shuffle-join the cold remainder.

    ``salted_join`` replicates the entire right relation n_salts times —
    fine when it is a bounded curated index, ruinous when it is an
    authority file that scales with the corpus.  Here the replication
    cost is (right rows under hot keys) x n_salts, which by construction
    is a handful of celebrity keys, so the right side stays ~1x while
    the hot keys still fan out over n_salts tasks.

    The split is a partition of the key space (hot-vs-cold is decided per
    key, never per row), so hot⋈hot ∪ cold⋈cold == the plain join for any
    key-equi ``how`` — proven equal in tests/test_operators.py and, on
    the real reconcile chain, tests/test_pipeline_scale.py.

    Cost: one extra count-aggregate pass over ``big`` (map-side combined,
    so the hot key cannot skew it) + two broadcast semi/anti-joins per
    side against the tiny hot-key relation.
    """
    keys = [key] if isinstance(key, str) else list(key)
    hot = (
        big.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_freq"))
        .filter(F.col("_freq") > hot_threshold)
        .select(*keys)
    )
    hot_b = F.broadcast(hot)
    big_hot = big.join(hot_b, keys, "left_semi")
    big_cold = big.join(hot_b, keys, "left_anti")
    right_hot = right.join(hot_b, keys, "left_semi")
    right_cold = right.join(hot_b, keys, "left_anti")
    return salted_join(
        big_hot, right_hot, keys, spread_cols, n_salts, how
    ).unionByName(big_cold.join(right_cold, keys, how))
