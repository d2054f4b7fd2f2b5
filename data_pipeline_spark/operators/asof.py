"""As-of (point-in-time) join — a first-class custom operator.

For each left row, attach the single right row with the greatest
``right_time <= left_time`` for the same key: the join every
training-data / feature-store pipeline needs for point-in-time
correctness (no feature leakage from the future).  Spark has no native
ASOF JOIN; the naive formulations are a non-equi range join (quadratic
blowup per key) or per-key ``collect_list`` (OOM on hot keys).

Scale-path formulation here: UNION + WINDOW —

1. tag right rows 0 and left rows 1, union them on (key, time, tag);
2. one window per key ordered by (time, tag): ``last(payload,
   ignorenulls=True)`` over unbounded-preceding..current carries the
   most recent right payload forward;
3. keep the left rows.

One shuffle on the key, linear in |left| + |right|, no join explosion,
and skew behaves exactly like any window (AQE-manageable).  Right rows
sort before left rows at equal time, so the match is inclusive
(``<=``), matching DuckDB's ASOF JOIN semantics (the test oracle).

The right side should be unique per (key, right_time) — pre-aggregate
if needed; residual ties resolve deterministically by a hash of the
serialized payload (a scalar sort key, so payloads may contain
non-orderable types like maps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
) -> DataFrame:
    """Backward as-of join: left columns + right payload columns (null
    when the key has no right row at or before the left time).

    ``on`` column name(s) must be present on both sides; every right
    column except the keys and ``right_time`` becomes a payload column
    (``right_time`` itself is re-emitted as ``asof_{right_time}``)."""
    keys = [on] if isinstance(on, str) else list(on)
    internal = {"_t", "_tag", "_payload", "_tie", "_asof", f"asof_{right_time}"}
    clash = internal & set(left.columns) | internal & set(right.columns)
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(clash)}; rename them "
            "on the inputs first"
        )
    payload_cols = [c for c in right.columns if c not in (*keys, right_time)]

    payload = F.struct(
        F.col(right_time).alias(f"asof_{right_time}"),
        *[F.col(c) for c in payload_cols],
    )
    r = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        payload.alias("_payload"),
        # Scalar tie-break: orders duplicate (key, right_time) right rows
        # deterministically without requiring the payload struct itself to
        # be orderable (maps etc. fail window-sort analysis).
        F.xxhash64(F.to_json(payload)).alias("_tie"),
    )
    l = left.select(
        *left.columns,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        W.partitionBy(*keys)
        .orderBy("_t", "_tag", F.col("_tie").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out_cols = [
        *left.columns,
        F.col(f"_asof.asof_{right_time}").alias(f"asof_{right_time}"),
        *[F.col(f"_asof.{c}").alias(c) for c in payload_cols],
    ]
    return filled.filter(F.col("_tag") == 1).select(*out_cols)
