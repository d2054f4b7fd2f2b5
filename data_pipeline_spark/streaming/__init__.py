"""Incremental / streaming ingestion (SURVEY §2.11 R1–R8): the
ActivityStreams change-feed semantics in both deterministic-batch and
Structured-Streaming form."""

from .ingest import apply_changes, stream_changes  # noqa: F401
