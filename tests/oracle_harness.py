"""Local twin of the driver's DuckDB-oracle comparison.

The implementation moved to ``data_pipeline_spark.oracle`` (round 11) so
the CLI can expose it as `python -m data_pipeline_spark verify`; this
module stays as the import path every test (and the verify skill) uses.
"""

from __future__ import annotations

from data_pipeline_spark.oracle import (  # noqa: F401
    TABLES,
    _canon,
    canon_rows,
    compare,
    duckdb_con,
)
