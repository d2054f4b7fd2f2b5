"""DuckDB-oracle comparison harness — the engine-portable correctness
check the external driver (and tests/oracle_harness) runs: every
declared query's Spark result vs its ANSI-SQL oracle on the same
parquet, columns sorted by name, rows in emitted order, cells via
canonical string repr (floats repr -> bit-exact, Decimals normalized).
Exposed as a product surface via `python -m data_pipeline_spark verify`.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def canon_rows(col_names, rows, sort_rows: bool = False):
    """Canonical form: columns sorted by name; rows kept in emitted order
    (driver behavior) unless sort_rows=True (order-insensitive debugging)."""
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    if sort_rows:
        out.sort()
    return sorted(c for c in col_names), out


def compare(spark_df, con, sql: str, order_sensitive: bool = True):
    """Return (ok, message) comparing a Spark DataFrame and a DuckDB query."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()

    if order_sensitive and list(s_cols) != list(d_cols):
        return False, f"column ORDER mismatch (total-order wrapper relies on parity): spark={list(s_cols)} duckdb={list(d_cols)}"

    sc, sr = canon_rows(s_cols, s_rows, sort_rows=not order_sensitive)
    dc, dr = canon_rows(d_cols, d_rows, sort_rows=not order_sensitive)
    if sc != dc:
        return False, f"column mismatch: spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return False, f"rowcount mismatch: spark={len(sr)} duckdb={len(dr)}"
    if sr != dr:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:5]
        return False, f"value/order mismatch, first diffs: {diffs}"
    return True, f"ok ({len(sr)} rows)"
