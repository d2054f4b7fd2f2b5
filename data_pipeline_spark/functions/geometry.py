"""Geometry scalar functions (SURVEY §2.8 F16–F19).

The reference handles geometry as WKT strings: point/polygon emission
(sources/general/geonames/mapper.py:116-119, wof/mapper.py:261-263 in
/root/reference), Ramer–Douglas–Peucker simplification (wof/mapper.py:7-54),
coordinate clamping for the search layer (marklogic/mapper.py:182-193), and
pick-best scoring in the merger (process/merger.py:177-244). On a real
deployment with Sedona these become ST_* calls; here the WKT algebra is
implemented directly — emission/clamping as column expressions, parse/
simplify/score as small pure-Python helpers wrapped in vectorized UDFs only
where the loop is genuinely iterative (RDP).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def wkt_point(lng: Column, lat: Column) -> Column:
    """F16: `POINT ( lng lat )` emission (the reference's exact spacing)."""
    return F.format_string("POINT ( %s %s )", lng.cast("string"), lat.cast("string"))


def clamp_coords(wkt: Column) -> Column:
    """F18 (marklogic/mapper.py:182-193): pull extreme coordinates inside
    the projection-safe range (180 -> 179.75, -180 -> -179.75, 90 -> 89.75,
    -90 -> -89.75) — word-boundary replaces on the WKT text."""
    out = F.regexp_replace(wkt, r"(?<![\d.-])180(\.0+)?(?![\d.])", "179.75")
    out = F.regexp_replace(out, r"-180(\.0+)?(?![\d.])", "-179.75")
    out = F.regexp_replace(out, r"(?<![\d.-])90(\.0+)?(?![\d.])", "89.75")
    out = F.regexp_replace(out, r"-90(\.0+)?(?![\d.])", "-89.75")
    return out


# ---------------------------------------------------------------------------
# pure-Python WKT helpers (used inside vectorized UDFs and the merge fold)
# ---------------------------------------------------------------------------
_COORD_RE = re.compile(r"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)")


def parse_wkt(wkt: str | None) -> tuple[str, list[tuple[float, float]]] | None:
    """F19: minimal WKT reader -> (shape, [(x, y), ...]); None if unparseable."""
    if not wkt or not isinstance(wkt, str):
        return None
    w = wkt.strip()
    up = w.upper()
    if up.startswith("POINT"):
        shape = "POINT"
    elif up.startswith("POLYGON"):
        shape = "POLYGON"
    elif up.startswith("LINESTRING"):
        shape = "LINESTRING"
    else:
        return None
    coords = [(float(a), float(b)) for a, b in _COORD_RE.findall(w)]
    if not coords:
        return None
    return shape, coords


def geometry_score(wkt: str | None) -> tuple:
    """F19/A7 (merger.py:177-244): ordering key — parseable > polygon >
    point, then vertex count, then max coordinate precision; final
    deterministic text tiebreak."""
    parsed = parse_wkt(wkt)
    if parsed is None:
        return (0, 0, 0, 0, wkt or "")
    shape, coords = parsed
    rank = {"POLYGON": 3, "LINESTRING": 2, "POINT": 1}[shape]
    precision = 0
    for m in _COORD_RE.finditer(wkt):
        for g in m.groups():
            if "." in g:
                precision = max(precision, len(g.split(".")[1]))
    return (1, rank, len(coords), precision, wkt)


def _perp_dist(p, a, b) -> float:
    (px, py), (ax, ay), (bx, by) = p, a, b
    dx, dy = bx - ax, by - ay
    if dx == dy == 0:
        return ((px - ax) ** 2 + (py - ay) ** 2) ** 0.5
    t = ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)
    t = max(0.0, min(1.0, t))
    cx, cy = ax + t * dx, ay + t * dy
    return ((px - cx) ** 2 + (py - cy) ** 2) ** 0.5


def rdp_simplify(coords: list[tuple[float, float]], epsilon: float) -> list[tuple[float, float]]:
    """F17: Ramer–Douglas–Peucker polyline simplification (iterative — no
    recursion-depth risk on long coastlines), same contract as
    wof/mapper.py:7-54."""
    if len(coords) < 3:
        return list(coords)
    keep = [False] * len(coords)
    keep[0] = keep[-1] = True
    stack = [(0, len(coords) - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        dmax, imax = -1.0, lo
        for i in range(lo + 1, hi):
            d = _perp_dist(coords[i], coords[lo], coords[hi])
            if d > dmax:
                dmax, imax = d, i
        if dmax > epsilon:
            keep[imax] = True
            stack.append((lo, imax))
            stack.append((imax, hi))
    return [c for c, k in zip(coords, keep) if k]


def simplify_wkt(wkt: str | None, epsilon: float = 0.01) -> str | None:
    """F17 over WKT text: simplify polygon/linestring rings, re-emit."""
    parsed = parse_wkt(wkt)
    if parsed is None:
        return wkt
    shape, coords = parsed
    if shape == "POINT":
        return wkt
    simp = rdp_simplify(coords, epsilon)
    body = ", ".join(f"{x} {y}" for x, y in simp)
    return f"{shape} (( {body} ))" if shape == "POLYGON" else f"{shape} ( {body} )"


def simplify_wkt_udf(epsilon: float = 0.01):
    """Vectorized Arrow-batched form for DataFrame use."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _simp(col):
        return col.map(lambda w: simplify_wkt(w, epsilon))

    _simp.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_simp, "string")
