"""Oracle output-type parity with the driver's hasher.

The driver materializes both sides through pandas/Arrow before hashing.
DuckDB's SUM(integer) returns HUGEINT (int128), which pandas renders as
float64 (`3.0`), while Spark emits int64 (`3`) — equal values, different
hashes.  This is exactly what turned `q12_priority_by_status` and
`a23_pivot_segments` red in CORRECTNESS_r02 while the fetchall-based local
gate stayed green.  Rule codified here: an oracle may never emit a type
pandas widens lossily (HUGEINT/UHUGEINT) or renders engine-specifically
(DECIMAL must be cast to DOUBLE/BIGINT before emission); and each oracle
column's type class (int/float/bool/text/temporal/nested) must equal the
Spark column's class.
"""

from __future__ import annotations

import pytest

from data_pipeline_spark.queries import QUERIES

from .conftest import SF_ORACLE, query_params
from .oracle_harness import duckdb_con

FORBIDDEN = {"HUGEINT", "UHUGEINT"}

_CLASS = {
    "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
    "UTINYINT": "i", "USMALLINT": "i", "UINTEGER": "i", "UBIGINT": "i",
    "FLOAT": "f", "DOUBLE": "f",
    "BOOLEAN": "b",
    "VARCHAR": "s",
    "DATE": "d", "TIMESTAMP": "t", "TIMESTAMP WITH TIME ZONE": "t",
}

_SPARK_CLASS = {
    "tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
    "float": "f", "double": "f",
    "boolean": "b",
    "string": "s",
    "date": "d", "timestamp": "t", "timestamp_ntz": "t",
}


def _duck_class(t: str) -> str:
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST")):
        return "n"
    return _CLASS.get(t, t)


def _spark_class(t: str) -> str:
    if t.startswith("decimal"):
        return "DECIMAL"
    if t.startswith(("array", "struct", "map")):
        return "n"
    return _SPARK_CLASS.get(t, t)


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize(
    "name", query_params(sorted(n for n, q in QUERIES.items() if q.oracle))
)
def test_oracle_types_hash_safe(spark, con, name):
    q = QUERIES[name]
    desc = con.execute(f"DESCRIBE {q.oracle}").fetchall()
    duck_types = {row[0]: row[1] for row in desc}

    bad = {c: t for c, t in duck_types.items() if t in FORBIDDEN or t.startswith("DECIMAL")}
    assert not bad, (
        f"{name}: oracle emits pandas-lossy types {bad}; "
        "CAST to BIGINT/DOUBLE before the final SELECT"
    )

    spark_types = dict(q.spark_fn(spark, SF_ORACLE).dtypes)
    assert set(spark_types) == set(duck_types), (
        f"{name}: column set mismatch spark={sorted(spark_types)} duck={sorted(duck_types)}"
    )
    mismatch = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if _spark_class(spark_types[c]) != _duck_class(duck_types[c])
    }
    assert not mismatch, f"{name}: type-class mismatch {mismatch}"
