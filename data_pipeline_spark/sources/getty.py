"""Getty vocabulary source (S4/U1): the AAT/ULAN/TGN feed filter+rewrite.

Restates sources/authorities/getty/harvester.py:7-26 in /root/reference:
the Getty ActivityStreams feed interleaves every vocabulary; a harvester
configured for one vocabulary keeps only items whose object id contains
``/{prefix}/`` and rewrites the data.getty.edu URL to the canonical
vocab.getty.edu namespace::

    https://data.getty.edu/vocab/aat/300404670
        -> http://vocab.getty.edu/aat/300404670

The filter+rewrite runs BEFORE the watermark/seen logic (the reference
filters before ASHarvester.process_items), which the generic crawler's
``item_prefilter`` hook provides — this module is configuration, not
engine code (U2).
"""

from __future__ import annotations

from typing import Any

DEFAULT_NAMESPACE = "http://vocab.getty.edu/"


def getty_prefilter(prefix: str, namespace: str | None = None):
    """S4 item hook for one Getty vocabulary: drop foreign-vocab items,
    rewrite kept object ids into ``{namespace}{prefix}/{ident}``."""
    ns = (namespace or DEFAULT_NAMESPACE) + prefix + "/"

    def hook(item: dict[str, Any]) -> dict[str, Any] | None:
        obj = item.get("object") or {}
        what = obj.get("id")
        if not what or f"/{prefix}/" not in what:
            return None
        ident = what.rsplit("/", 1)[-1]
        return {**item, "object": {**obj, "id": f"{ns}{ident}"}}

    return hook


def crawl(fetch_page, collection_url: str, prefix: str, **kwargs):
    """Walk the Getty feed for one vocabulary (thin wrapper wiring the
    prefilter into the shared S2 crawler)."""
    from .harvester import crawl_activity_stream

    return crawl_activity_stream(
        fetch_page, collection_url,
        item_prefilter=getty_prefilter(prefix, kwargs.pop("namespace", None)),
        **kwargs,
    )


CONFIG = {
    "name": "getty_aat",
    "harvester": f"{__name__}:crawl",
    "prefix": "aat",
    "merge_order": 7,
}
