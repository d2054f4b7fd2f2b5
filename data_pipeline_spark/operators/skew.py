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
    ``key`` may be a single column name or a list (composite equi-key)."""
    keys = [key] if isinstance(key, str) else list(key)
    b = salted(big, spread_cols, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")
