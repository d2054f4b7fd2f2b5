"""Sinks (SURVEY §2.2): upsert-merge onto parquet tiers, sharded JSONL /
N-Triples / CSV exports."""

from .exports import (  # noqa: F401
    export_csv,
    export_jsonl,
    export_ntriples,
    merge_upsert,
    write_upsert_parquet,
)
