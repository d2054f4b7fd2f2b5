"""SPARQL endpoint source (S14): SELECT -> bindings -> rows/ids.

Restates the reference's two endpoint readers:

- ``search_sparql`` / ``search_sparql_ids``
  (storage/marklogic/rest.py:115-141): prepend the standard prefixes
  unless the query already carries its own, GET the endpoint, return
  ``results.bindings``; the ids form assumes one URI variable.
- the Japan authority fetcher (sources/libraries/japan/fetcher.py:16-74):
  SELECT for matching topics, take each binding's first value, split the
  identifier off the URI, and fetch the full records.

The HTTP call is injectable (``fetch(query) -> parsed JSON``), like every
network surface here — offline-testable, swappable for a pooled session;
record-body fetching fans out through the S1 distributed fetcher.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PREFIXES = """\
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
PREFIX owl: <http://www.w3.org/2002/07/owl#>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
PREFIX dc: <http://purl.org/dc/terms/>
"""


def search_sparql(fetch, query: str, prefixes: str | None = None):
    """Run a SELECT; return the bindings list (or the raw response when it
    has no ``results`` — ASK/CONSTRUCT passthrough, rest.py:129-131)."""
    if not query.lstrip().lower().startswith("prefix"):
        query = (prefixes if prefixes is not None else DEFAULT_PREFIXES) + query
    js = fetch(query)
    if isinstance(js, dict) and "results" in js:
        return js["results"]["bindings"]
    return js


def sparql_ids(fetch, query: str, prefixes: str | None = None) -> list[str]:
    """One-URI-variable form (rest.py:133-141): the first variable of the
    first binding names the column; every row contributes its value."""
    binds = search_sparql(fetch, query, prefixes)
    if not binds:
        return []
    k = list(binds[0].keys())[0]
    # OPTIONAL-variable rows may omit k entirely — skip them instead of
    # letting one row kill the harvest
    return [b[k]["value"] for b in binds if b.get(k)]


def bindings_to_df(spark: SparkSession, bindings: list[dict[str, Any]]) -> DataFrame:
    """Bindings -> DataFrame, one string column per variable (values only;
    a missing variable in a row is null — SPARQL OPTIONAL semantics)."""
    if not bindings:
        return spark.createDataFrame([], "empty string")
    cols: list[str] = []
    for b in bindings:
        for k in b:
            if k not in cols:
                cols.append(k)
    rows = [tuple((b.get(c) or {}).get("value") for c in cols) for b in bindings]
    return spark.createDataFrame(rows, ", ".join(f"{c} string" for c in cols))


def harvest_sparql(
    spark: SparkSession,
    fetch,
    query: str,
    record_fetch_factory,
    prefixes: str | None = None,
    parallelism: int = 8,
) -> DataFrame:
    """The Japan-fetcher composition (fetcher.py:56-74): SELECT the
    matching URIs, split the identifier off each (rsplit '/'), fan the
    record fetches out through the S1 distributed fetcher.  Returns
    (uri, ok, payload) rows."""
    from .fetcher import fetch_records

    ids = [uri.rsplit("/", 1)[-1] for uri in sparql_ids(fetch, query, prefixes)]
    uris = spark.createDataFrame([(i,) for i in ids], "uri string")
    return fetch_records(uris, record_fetch_factory, parallelism=parallelism)


CONFIG = {
    "name": "sparql_endpoint",
    "harvester": f"{__name__}:harvest_sparql",
    "merge_order": 10,
}
