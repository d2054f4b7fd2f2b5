"""HTTP record fetcher SOURCE (SURVEY §2.1 S1): distributed bounded-
concurrency fetch of record bodies for a DataFrame of URIs.

The reference's fetcher (process/base/fetcher.py:24-106 in /root/reference)
is a single-process loop: session reuse, per-source rate limit, retry with
backoff, None on 404.  Spark restatement: ``mapInPandas`` over a URI
relation repartitioned to ``parallelism`` — each task runs one pooled
session with ``max_threads`` workers, so cluster-wide concurrency =
parallelism x max_threads, controlled by partitioning exactly like the K5
sink.  The transport is injectable (tests run offline; production binds a
requests.Session with auth/backoff), and failures return null payloads
rather than failing the scan (the reference's warn-and-continue), keyed so
a retry tier can re-fetch.

The output lands directly in the change-feed/cache shape, so
``run_harvest``'s driver-side fetch loop can be swapped for this
distributed form when the crawl yields millions of identifiers.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCHED_SCHEMA = "uri string, payload string, ok boolean"


def _default_fetch_factory() -> Callable[[str], str | None]:
    """One pooled session per task; returns body text, None on 4xx/5xx
    (lazy requests import — only fetching executors need it)."""
    import requests  # noqa: PLC0415  (deliberate lazy import)

    session = requests.Session()

    def fetch(uri: str) -> str | None:
        resp = session.get(uri, timeout=30)
        if resp.status_code != 200:
            return None
        return resp.text

    return fetch


def fetch_records(
    uris: DataFrame,
    fetch_factory: Callable[[], Callable[[str], str | None]] | None = None,
    uri_col: str = "uri",
    parallelism: int = 8,
    max_threads: int = 3,
) -> DataFrame:
    """uris(uri, ...) -> (uri, payload, ok): distributed fetch.

    ``fetch_factory`` builds the per-task fetch function (called once per
    task, so sessions/rate-limiters are task-local — no pickle of live
    sockets).  Rows with ok=false carry null payloads for a retry tier."""
    factory = fetch_factory or _default_fetch_factory

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        from concurrent.futures import ThreadPoolExecutor

        fetch = factory()

        def one(uri: str):
            try:
                return fetch(uri)
            except Exception:
                return None

        with ThreadPoolExecutor(max_workers=max_threads) as pool:
            for pdf in batches:
                results = list(pool.map(one, pdf[uri_col]))
                yield pd.DataFrame(
                    {
                        # to_numpy(): drop the source index so the uri column
                        # aligns with the RangeIndex of the list columns even
                        # when a batch arrives with a non-default index.
                        "uri": pdf[uri_col].to_numpy(),
                        "payload": results,
                        "ok": [r is not None for r in results],
                    }
                )

    return (
        uris.select(F.col(uri_col))
        .repartition(parallelism)
        .mapInPandas(run, schema=FETCHED_SCHEMA)
    )
