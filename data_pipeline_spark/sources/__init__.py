"""Source connectors (SURVEY §2.1): dump loaders, harvest-feed ingestion.
The HTTP fetcher family (S1–S4) is a connector concern — at scale it's a
mapPartitions with a pooled session per partition; here the batch/streaming
loaders that feed the engine are implemented and tested."""

from .loaders import load_jsonl_dump, sniff_new_records  # noqa: F401
