"""Per-entity record merge (SURVEY §2.5 A1–A7): the aggregation family.

The reference folds N co-referent records into one with per-property rules
(RecordMerger, process/merger.py:670-1022 in /root/reference): copy-if-
absent scalars, set-union-by-id arrays (A2), name dedupe by lowercased
content (A3), statement dedupe (A4), dimension dedupe on the (value, unit,
classification) triple (A5), timespan pick-best = smallest non-estimated
interval (A6), geometry pick-best by parseability/shape/vertices (A7), with
order sensitivity supplied by the configured ``merge_order`` (W2).

Spark restatement: ``groupBy(yuid).applyInPandas`` — an Arrow-batched
grouped reduction. Each group is a handful of co-referent documents (bounded
by the equivalence-class size, not the table), so the Python fold is tiny
per group and the stage scales with one shuffle on yuid. Docs are sorted by
(merge_order, source, identifier) INSIDE the fold so the result is
independent of partitioning.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

# lower = folded earlier = wins copy-if-absent conflicts (run-merge.py:80-81)
DEFAULT_MERGE_ORDER: dict[str, int] = {}

_ID_ARRAYS = ("classified_as", "equivalent", "member_of", "part_of", "broader")


def _union_by_id(a: list, b: list) -> list:
    seen = {e.get("id") for e in a if isinstance(e, dict)}
    out = list(a)
    for e in b:
        if isinstance(e, dict) and e.get("id") not in seen:
            seen.add(e.get("id"))
            out.append(e)
    return out


def _dedupe_names(items: list) -> list:
    seen, out = set(), []
    for e in items:
        key = (" ".join(str(e.get("content", "")).split()).lower(), e.get("type"))
        if key not in seen:
            seen.add(key)
            out.append(e)
    return out


def _dedupe_statements(items: list) -> list:
    seen, out = set(), []
    for e in items:
        key = str(e.get("content", "")).strip()
        if key not in seen:
            seen.add(key)
            out.append(e)
    return out


def _dedupe_dimensions(items: list) -> list:
    seen, out = set(), []
    for e in items:
        cls = tuple(sorted(c.get("id", "") for c in e.get("classified_as") or []))
        key = (e.get("value"), (e.get("unit") or {}).get("id"), cls)
        if key not in seen:
            seen.add(key)
            out.append(e)
    return out


def _interval_len(ts: dict) -> float:
    """Seconds covered by a timespan dict, BCE-safe (F1 parser)."""
    from ..functions.dates import parse_datetime

    b = parse_datetime(ts.get("begin_of_the_begin"))
    e = parse_datetime(ts.get("end_of_the_end") or ts.get("begin_of_the_begin"))
    if b is None or e is None:
        return float("inf")
    return max(0, e[3] - b[2])


def _pick_timespan(a: dict | None, b: dict | None) -> dict | None:
    """A6: prefer parseable, then the smallest interval (merger.py:542-622)."""
    if not a:
        return b
    if not b:
        return a
    ts_a, ts_b = a.get("timespan") or {}, b.get("timespan") or {}
    return a if _interval_len(ts_a) <= _interval_len(ts_b) else b


def _geom_score(wkt: str | None) -> tuple:
    """A7 (merger.py:177-244): parseable > polygon > point; more vertices;
    more coordinate precision; deterministic final tiebreak on the text."""
    if not wkt or not isinstance(wkt, str):
        return (0, 0, 0, 0, "")
    w = wkt.strip().upper()
    shape = 2 if w.startswith("POLYGON") else 1 if w.startswith("POINT") else 0
    vertices = wkt.count(",") + 1 if shape else 0
    precision = max((len(p.split(".")[1]) for p in wkt.replace(",", " ").split() if "." in p), default=0)
    return (1 if shape else 0, shape, vertices, precision, wkt)


def merge_docs(docs: list[dict]) -> dict:
    """Fold an ordered list of co-referent documents into one (A1)."""
    base = dict(docs[0])
    for other in docs[1:]:
        for k, v in other.items():
            if k in ("id", "type"):
                continue
            if k not in base or base[k] is None:
                base[k] = v  # copy-if-absent (merge_common)
            elif k in _ID_ARRAYS:
                base[k] = _union_by_id(base[k], v)
            elif k == "identified_by":
                base[k] = _dedupe_names(list(base[k]) + list(v))
            elif k == "referred_to_by":
                base[k] = _dedupe_statements(list(base[k]) + list(v))
            elif k == "dimension":
                base[k] = _dedupe_dimensions(list(base[k]) + list(v))
            elif k in ("born", "died", "produced_by"):
                base[k] = _pick_timespan(base[k], v)
            elif k == "defined_by":
                base[k] = max((base[k], v), key=_geom_score)
            # else: keep base's value (first-in-merge-order wins)
    # normalization applies to single-source docs too (dups can pre-exist
    # inside one record, A5/A9): dedupe families + id-array uniqueness
    if base.get("identified_by"):
        base["identified_by"] = _dedupe_names(base["identified_by"])
    if base.get("referred_to_by"):
        base["referred_to_by"] = _dedupe_statements(base["referred_to_by"])
    if base.get("dimension"):
        base["dimension"] = _dedupe_dimensions(base["dimension"])
    for k in _ID_ARRAYS:
        if base.get(k):
            base[k] = _union_by_id([], base[k])
    # final clean (subset of sources/lux/final/mapper.py:778-908):
    # self-reference removal (P8) on the parent links
    self_id = base.get("id")
    for k in ("part_of", "broader", "member_of"):
        if k in base and isinstance(base[k], list):
            kept = [e for e in base[k] if e.get("id") != self_id]
            if kept:
                base[k] = kept
            else:
                del base[k]
    return base


def _consent(hooks, kind: str, base_doc: dict, cand_doc: dict,
             base_src: str = "", cand_src: str = "") -> bool:
    fn = (hooks or {}).get(kind)
    if fn is None:
        return True
    # hooks take (base_doc, cand_doc) or, when the veto depends on the
    # other record's SOURCE (the reference passes whole record envelopes,
    # e.g. yale/ycba/mapper.py:14-27 checking to_merge['source']),
    # (base_doc, cand_doc, base_src, cand_src)
    arity = getattr(fn, "_p5_arity", None)
    if arity is None:
        import inspect

        arity = len(inspect.signature(fn).parameters)
        # cache on the hook only when it can carry attributes — a builtin,
        # C-implemented callable, or BOUND METHOD has no writable attribute
        # slot (a bound method's __dict__ reads through to __func__ but
        # setattr on it raises AttributeError; some extension/builtin
        # types raise TypeError instead); those just pay the inspection
        # per call
        try:
            fn._p5_arity = arity
        except (AttributeError, TypeError):
            pass
    if arity >= 4:
        return bool(fn(base_doc, cand_doc, base_src, cand_src))
    return bool(fn(base_doc, cand_doc))


def should_merge(
    vetoes: dict | None, base_doc: dict, base_src: str, cand_doc: dict, cand_src: str
) -> bool:
    """P5 (process/merger.py:926-958 in /root/reference): both sides must
    consent before a candidate record folds into the base — the BASE
    source's ``should_merge_into(base, cand)`` AND the CANDIDATE source's
    ``should_merge_from(base, cand)``.  Unconfigured sources/hooks default
    to True (mapper.py:276-280's base-class behavior)."""
    if not vetoes:
        return True
    return _consent(
        vetoes.get(base_src), "should_merge_into", base_doc, cand_doc, base_src, cand_src
    ) and _consent(
        vetoes.get(cand_src), "should_merge_from", base_doc, cand_doc, base_src, cand_src
    )


def merge_by_yuid(
    reidentified: DataFrame,
    merge_order: dict[str, int] | None = None,
    vetoes: dict[str, dict] | None = None,
) -> DataFrame:
    """records(yuid, source, identifier, data) -> merged(yuid, rectype, data).

    One shuffle on yuid; groups fold in merge-order inside an
    Arrow-batched stream.  ``vetoes`` is the P5 hook surface:
    {source: {"should_merge_into": fn, "should_merge_from": fn}} — plain
    picklable callables shipped with the UDF closure (see
    SourceRegistry.merge_hooks_map); a vetoed record is excluded from the
    fold, exactly the reference's skip semantics.

    Harness (round 8): mapInPandas over a yuid-repartitioned,
    yuid-sorted stream, MANY groups per Arrow batch, instead of
    groupBy().applyInPandas — the latter invokes Python and builds a
    pandas frame once PER GROUP, and at the measured 30x ETL scale
    (900k records, 450k two-record groups) that per-group overhead was
    74% of the whole build (236 s of 320, SCALE.md round 8).  Group
    contiguity is guaranteed by the hash exchange on yuid plus the
    within-partition sort; the per-group fold semantics (merge-order
    sort, veto consent, merge_docs) are byte-identical — pinned by the
    a01 golden gate and the determinism-under-partitioning test."""
    import pandas as pd

    order = merge_order or DEFAULT_MERGE_ORDER

    def fold_group(yuid, rows):
        # rows: [(source, identifier, data_json)] — merge-order sort with
        # the same (priority, source, identifier) key as always
        rows.sort(key=lambda r: (order.get(r[0], 100), r[0], r[1]))
        docs = [json.loads(r[2]) for r in rows]
        if vetoes:
            base_doc, base_src = docs[0], rows[0][0]
            kept = [base_doc]
            for doc, (src, _, _) in zip(docs[1:], rows[1:]):
                if should_merge(vetoes, base_doc, base_src, doc, src):
                    kept.append(doc)
            docs = kept
        merged = merge_docs(docs)
        merged["id"] = yuid
        return yuid, merged.get("type"), json.dumps(merged, sort_keys=True)

    def fold_stream(batches):
        cur_yuid, cur_rows = None, []
        out: list[tuple] = []
        for pdf in batches:
            for y, s, i, d in zip(
                pdf["yuid"].to_numpy(), pdf["source"].to_numpy(),
                pdf["identifier"].to_numpy(), pdf["data"].to_numpy(),
            ):
                if y != cur_yuid:
                    if cur_yuid is not None:
                        out.append(fold_group(cur_yuid, cur_rows))
                    cur_yuid, cur_rows = y, []
                cur_rows.append((s, i, d))
            if out:  # emit completed groups per input batch: bounded memory
                yield pd.DataFrame(out, columns=["yuid", "rectype", "data"])
                out = []
        if cur_yuid is not None:
            out.append(fold_group(cur_yuid, cur_rows))
        if out:
            yield pd.DataFrame(out, columns=["yuid", "rectype", "data"])

    part = (
        reidentified.select("yuid", "source", "identifier", "data")
        .repartition("yuid")
        .sortWithinPartitions("yuid")
    )
    return part.mapInPandas(
        fold_stream, schema="yuid string, rectype string, data string"
    )
