"""Registry of declared queries (SURVEY §2 coverage ledger).

Determinism contract for oracle hash-matching (driver compares Spark vs
DuckDB cell values):

- Never emit a raw float aggregate whose value depends on accumulation
  order (double sums differ in low bits across engines/partitionings).
  Cast the summand to DECIMAL first — decimal addition is exact and
  order-independent — then cast the final aggregate back to DOUBLE.
- MIN/MAX/any-pick of stored doubles is exact (same bits both engines).
- Every top-k / LIMIT has a total-order tie-break (unique key last).
- Arrays are emitted as sorted, joined strings (engines disagree on
  array rendering, not on strings).
- Timestamps compare fine with session TZ pinned to UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    survey: str = ""  # SURVEY §2 operator ids this exercises, e.g. "A2,A14"
    doc: str = field(default="")


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None, survey: str = ""):
    """Decorator registering a declared query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name, fn, oracle, survey, doc=(fn.__doc__ or ""))
        return fn

    return deco


def dsum(col):
    """Order-independent sum of a double expression: exact decimal
    accumulation, final result as double (identical bits both engines)."""
    from pyspark.sql import functions as F

    return F.sum(col.cast("decimal(30,6)")).cast("double")


# SQL-side twin of dsum for oracle strings.
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"
