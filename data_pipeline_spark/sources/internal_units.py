"""The small internal-unit mappers (U1 breadth #17-20): Ashmolean,
Arches, IPCH, PMC.

Like YCBA, these sources' records are already Linked Art JSON and the
"mapper" is a light cleanup pass (reference sources/museums/ashmol/
mapper.py, yale/{arches,ipch,pmc}/mapper.py — 24/13/19/44 LoC each):

- **ashmol**: link fixing + the Collection-Item classification appended
  to every HumanMadeObject.
- **arches** / **ipch**: pass-through (the base transform: patches ride
  the shared F20 machinery; ipch's explicit default-consent merge hooks
  are the registry default here).
- **pmc**: Group ``part_of`` -> ``member_of``; Sets classified as both
  archive (aat 300375748) and collection (aat 300025976) drop the
  collection class; referred_to_by entries classified as any of three
  internal-note AATs are purged; link fixing.

Each runs as one Arrow-batched pass over (identifier, record_time?,
value) rows, sharing the YCBA plumbing.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ycba import _fix_links

AAT_COLLECTION_ITEM = "http://vocab.getty.edu/aat/300404024"
AAT_ARCHIVE = "http://vocab.getty.edu/aat/300375748"
AAT_COLLECTION = "http://vocab.getty.edu/aat/300025976"
PMC_NOTE_PURGE = {
    "http://vocab.getty.edu/aat/300435438",
    "http://vocab.getty.edu/aat/300055863",
    "http://vocab.getty.edu/aat/300055458",
}


def ashmol_transform(doc: dict, canonical=None) -> dict:
    """mapper.py (ashmol): fix_links + Collection Item on HMOs."""
    _fix_links(doc, canonical)
    if doc.get("type") == "HumanMadeObject":
        doc.setdefault("classified_as", []).append({
            "id": AAT_COLLECTION_ITEM, "type": "Type",
            "_label": "Collection Item",
        })
    return doc


def arches_transform(doc: dict, canonical=None) -> dict:
    """mapper.py (arches): the base pass-through."""
    return doc


def ipch_transform(doc: dict, canonical=None) -> dict:
    """mapper.py (ipch): pass-through with default-consent merge hooks."""
    return doc


def pmc_transform(doc: dict, canonical=None) -> dict:
    """mapper.py (pmc): Group part_of -> member_of; archive Sets drop
    the collection class; internal-note statements purged; fix_links."""
    if doc.get("type") == "Group" and "part_of" in doc:
        doc["member_of"] = doc.pop("part_of")
    if doc.get("type") == "Set" and "classified_as" in doc:
        ids = [c.get("id") for c in doc["classified_as"]]
        if AAT_ARCHIVE in ids and AAT_COLLECTION in ids:
            doc["classified_as"] = [
                c for c in doc["classified_as"] if c.get("id") != AAT_COLLECTION
            ]
    if "referred_to_by" in doc:
        doc["referred_to_by"] = [
            r for r in doc["referred_to_by"]
            if not any(
                c.get("id") in PMC_NOTE_PURGE
                for c in r.get("classified_as", [])
            )
        ]
    _fix_links(doc, canonical)
    return doc


def _map_records(transform, source_name: str):
    def map_records(
        loaded: DataFrame, namespace: str = "", rewrites: dict | None = None
    ) -> DataFrame:
        import pandas as pd

        rw = dict(rewrites or {})

        def canonical(uri: str):
            for old, new in rw.items():
                if uri == old or uri.startswith(old):
                    return None if new is None else new + uri[len(old):]
            return uri

        cols = set(loaded.columns)
        if "record_time" not in cols:
            loaded = loaded.withColumn("record_time", F.lit(None).cast("string"))

        def run(batches):
            for pdf in batches:
                out = {"identifier": [], "rectype": [], "record_time": [],
                       "data": []}
                for ident, rt, val in zip(
                    pdf["identifier"], pdf["record_time"], pdf["value"]
                ):
                    try:
                        doc = json.loads(val)
                    except (ValueError, TypeError):
                        continue
                    if not isinstance(doc, dict) or "type" not in doc:
                        continue
                    doc = transform(doc, canonical if rw else None)
                    if ident is None:
                        ident = str(doc.get("id", "")).removeprefix(namespace)
                    out["identifier"].append(ident)
                    out["rectype"].append(doc["type"])
                    out["record_time"].append(
                        rt if isinstance(rt, str) and rt
                        else "2026-01-01T00:00:00"
                    )
                    out["data"].append(json.dumps(doc, sort_keys=True))
                yield pd.DataFrame(out)

        mapped = loaded.select("identifier", "record_time", "value").mapInPandas(
            run,
            schema="identifier string, rectype string, record_time string,"
            " data string",
        )
        return mapped.select(
            F.lit(source_name).alias("source"),
            "identifier", "rectype", "record_time",
            F.lit("create").alias("change"),
            "data",
        )

    return map_records


map_ashmol = _map_records(ashmol_transform, "ashmol")
map_arches = _map_records(arches_transform, "arches")
map_ipch = _map_records(ipch_transform, "ipch")
map_pmc = _map_records(pmc_transform, "pmc")

CONFIGS = [
    {"name": "ashmol", "type": "internal",
     "mapper": f"{__name__}:map_ashmol", "merge_order": 17},
    {"name": "arches", "type": "internal",
     "mapper": f"{__name__}:map_arches", "merge_order": 18},
    {"name": "ipch", "type": "internal",
     "mapper": f"{__name__}:map_ipch", "merge_order": 19},
    {"name": "pmc", "type": "internal",
     "mapper": f"{__name__}:map_pmc", "merge_order": 20},
]
