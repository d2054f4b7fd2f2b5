"""Data-driven record patches (SURVEY §2.8 F20 + §2.12 U3) and type
overrides.

The reference applies per-source JSON fixes configured as XPath selectors +
DELETE/UPDATE operations (process/utils/xpath_ops.py:21-108, applied at
process/base/mapper.py:396-417 in /root/reference), and post-reconcile type
overrides (mapper.py:434-440). Here the patch table is a broadcast-joined
config relation — (source, identifier, path, operation, argument) — and the
edit itself runs in one Arrow-batched pass over only the MATCHED records
(everything else passes through untouched, no Python cost).

Path syntax: dot-separated JSON paths with [n] array indexing, e.g.
``identified_by[0].content`` — the subset of XPath the reference's fixes
actually use.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PATCH_SCHEMA = "source string, identifier string, path string, operation string, argument string"


def _walk(doc: dict, parts: list):
    """Return (parent_container, final_key) or None if the path is absent."""
    cur = doc
    for p in parts[:-1]:
        key, idx = p
        if key:
            if not isinstance(cur, dict) or key not in cur:
                return None
            cur = cur[key]
        if idx is not None:
            if not isinstance(cur, list) or idx >= len(cur):
                return None
            cur = cur[idx]
    key, idx = parts[-1]
    if key and (not isinstance(cur, dict) or key not in cur):
        return None
    if key and idx is not None:
        cur = cur[key]
        if not isinstance(cur, list) or idx >= len(cur):
            return None
        return (cur, idx)
    if key:
        return (cur, key)
    return (cur, idx)


def _parse_path(path: str) -> list:
    parts = []
    for seg in path.split("."):
        if "[" in seg:
            key, rest = seg.split("[", 1)
            idx = int(rest.rstrip("]"))
            parts.append((key or None, idx))
        else:
            parts.append((seg, None))
    return parts


def apply_patch(doc: dict, path: str, operation: str, argument: str | None) -> dict:
    """One DELETE/UPDATE at a JSON path; missing paths are no-ops (the
    reference warns and continues, xpath_ops.py:99-104)."""
    loc = _walk(doc, _parse_path(path))
    if loc is None:
        return doc
    container, key = loc
    if operation == "DELETE":
        if isinstance(container, list):
            container.pop(key)
        else:
            container.pop(key, None)
    elif operation == "UPDATE":
        val = json.loads(argument) if argument and argument[:1] in '{["0123456789tfn-' else argument
        container[key] = val
    return doc


def apply_patches(records: DataFrame, patches: DataFrame) -> DataFrame:
    """records(source, identifier, ..., data) + patch config -> patched.

    Patches are grouped per record and broadcast-joined; only matched rows
    enter the Python pass."""
    import pandas as pd

    grouped = patches.groupBy("source", "identifier").agg(
        F.collect_list(F.struct("path", "operation", "argument")).alias("_patches")
    )
    joined = records.join(F.broadcast(grouped), ["source", "identifier"], "left")

    def run(batches):
        for pdf in batches:
            out = []
            for data, plist in zip(pdf["data"], pdf["_patches"]):
                if plist is None or (isinstance(plist, float)):
                    out.append(data)
                    continue
                doc = json.loads(data)
                for p in plist:
                    doc = apply_patch(doc, p["path"], p["operation"], p["argument"])
                out.append(json.dumps(doc, sort_keys=True))
            yield pdf.assign(data=out).drop(columns=["_patches"])

    schema = ", ".join(f"{c} string" for c in records.columns)
    return joined.mapInPandas(run, schema=schema)


def repair_timespans(records: DataFrame) -> DataFrame:
    """F3 (mapper_utils.py:83-127): walk every `timespan` object in each
    document, re-derive begin_of_the_begin / end_of_the_end through the F1
    parser (so free-text like "early 12th century" becomes ISO bounds, and
    the BCE-safe epoch seconds ride along as _seconds_since_epoch_*), and
    strip timespans that cannot be parsed at all. Runs as one Arrow pass;
    documents without a 'timespan' substring skip Python entirely."""
    import json as _json

    import pandas as pd

    from ..functions.dates import parse_datetime

    def _fix(obj):
        if isinstance(obj, dict):
            ts = obj.get("timespan")
            if isinstance(ts, dict):
                raw = ts.get("begin_of_the_begin") or ts.get("end_of_the_end")
                parsed = parse_datetime(raw)
                if parsed is None:
                    obj.pop("timespan", None)
                else:
                    b, e, bs, es = parsed
                    # widen with the end side if it parses separately
                    raw_end = ts.get("end_of_the_end")
                    pe = parse_datetime(raw_end) if raw_end else None
                    if pe is not None:
                        e, es = pe[1], pe[3]
                    obj["timespan"] = {
                        "begin_of_the_begin": b,
                        "end_of_the_end": e,
                        "_seconds_since_epoch_begin": bs,
                        "_seconds_since_epoch_end": es,
                    }
            for v in obj.values():
                _fix(v)
        elif isinstance(obj, list):
            for v in obj:
                _fix(v)

    def run(batches):
        for pdf in batches:
            out = []
            for data in pdf["data"]:
                if '"timespan"' not in data:
                    out.append(data)
                    continue
                doc = _json.loads(data)
                _fix(doc)
                out.append(_json.dumps(doc, sort_keys=True))
            yield pdf.assign(data=out)

    schema = ", ".join(f"{c} string" for c in records.columns)
    only = records.filter(F.col("data").contains('"timespan"'))
    rest = records.filter(~F.col("data").contains('"timespan"'))
    return only.mapInPandas(run, schema=schema).unionByName(rest)


def apply_type_overrides(records: DataFrame, overrides: DataFrame) -> DataFrame:
    """post-reconcile type overrides (mapper.py:434-440): rewrite rectype
    where the record's URI appears in the override table."""
    ov = F.broadcast(
        overrides.select(F.col("ext_uri").alias("_ov_uri"), F.col("new_type").alias("_new_type"))
    )
    with_uri = records.withColumn("_uri", F.get_json_object("data", "$.id"))
    return (
        with_uri.join(ov, with_uri._uri == ov._ov_uri, "left")
        .withColumn("rectype", F.coalesce(F.col("_new_type"), F.col("rectype")))
        .drop("_ov_uri", "_new_type", "_uri")
    )
