"""Bulk HTTP sink (SURVEY §2.2 K5): batched multipart-style POST loading
with bounded per-partition concurrency.

The reference uploads merged docs to its search layer in batches of 200
with <=3 concurrent uploader threads (run-load.py:21-63,
storage/marklogic/rest.py:15-38,213-237 in /root/reference). Spark
restatement: ``foreachPartition`` — each partition builds batches and posts
them with a small thread pool; total concurrency = partitions x
``max_threads``, so the cluster-wide rate is controlled by repartition
count, not driver loops. The HTTP transport is injectable (and the
`requests` import lazy) so the sink is testable offline and swappable for
any REST search layer.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame


def _default_poster(endpoint: str):
    """Build a poster bound to ``endpoint`` using requests (lazy import —
    only executors that actually post need it installed)."""

    def post(batch: list[dict[str, Any]]) -> None:
        import json

        import requests  # noqa: PLC0415  (deliberate lazy import)

        resp = requests.post(
            endpoint,
            data=json.dumps(batch),
            headers={"Content-Type": "application/json"},
            timeout=60,
        )
        resp.raise_for_status()

    return post


def load_http(
    df: DataFrame,
    endpoint: str | None = None,
    batch_size: int = 200,
    max_threads: int = 3,
    poster: Callable[[list[dict[str, Any]]], None] | None = None,
) -> None:
    """POST every row (as a dict) to the endpoint in batches.

    ``poster`` overrides the transport (tests inject a collector; real
    deployments may sign requests, use sessions, etc.)."""
    if poster is None:
        if endpoint is None:
            raise ValueError("either endpoint or poster is required")
        poster = _default_poster(endpoint)

    def handle_partition(rows: Iterator) -> None:
        from concurrent.futures import ThreadPoolExecutor
        from itertools import islice

        def batches():
            buf: list[dict[str, Any]] = []
            for row in rows:
                buf.append(row.asDict(recursive=True))
                if len(buf) >= batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        # windows of max_threads batches: bounds BOTH concurrency and the
        # memory held in flight; errors propagate -> Spark task retry
        with ThreadPoolExecutor(max_workers=max_threads) as pool:
            it = batches()
            while True:
                group = list(islice(it, max_threads))
                if not group:
                    break
                for f in [pool.submit(poster, b) for b in group]:
                    f.result()

    df.foreachPartition(handle_partition)
