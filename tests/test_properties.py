"""Property-based tests (hypothesis) for the scalar library — SURVEY §5's
consequence: the reference ships no test corpus, so the new engine's scalar
functions get generative coverage instead.

Invariants: the date parser never raises and always returns ordered
intervals whose epoch seconds agree with its own ISO strings; epoch-seconds
math is an exact bijection with Python's datetime over the CE range and
strictly monotonic across all years including BCE; WKT simplification never
raises, only removes vertices, and keeps endpoints.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_spark.functions.dates import epoch_seconds, parse_datetime
from data_pipeline_spark.functions.geometry import rdp_simplify

# ---------------------------------------------------------------- dates


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_parse_datetime_total_function(s):
    """Arbitrary text: never raises; any result is a well-formed interval."""
    r = parse_datetime(s)
    if r is not None:
        b, e, bs, es = r
        assert isinstance(b, str) and isinstance(e, str)
        assert bs <= es


@given(
    st.integers(min_value=1, max_value=9999),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=28),
    st.integers(min_value=0, max_value=23),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=59),
)
@settings(max_examples=200, deadline=None)
def test_epoch_seconds_bijection_with_datetime(y, mo, d, h, mi, s):
    expect = int(
        (
            dt.datetime(y, mo, d, h, mi, s, tzinfo=dt.timezone.utc)
            - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        ).total_seconds()
    )
    assert epoch_seconds(y, mo, d, h, mi, s) == expect


@given(st.integers(min_value=-5000, max_value=5000))
@settings(max_examples=200, deadline=None)
def test_epoch_seconds_year_monotonic_incl_bce(y):
    assert epoch_seconds(y + 1, 1, 1) - epoch_seconds(y, 1, 1) in (
        365 * 86400,
        366 * 86400,
    )


@given(st.integers(min_value=-4999, max_value=9999))
@settings(max_examples=200, deadline=None)
def test_parse_iso_year_interval_consistency(y):
    """ISO year strings parse to [Jan 1, Dec 31] with matching seconds."""
    iso = f"{'-' if y < 0 else ''}{abs(y):04d}"
    r = parse_datetime(iso)
    if y == 0:
        return  # year 0 only reachable via explicit -0000/0000 forms
    assert r is not None
    b, e, bs, es = r
    assert bs == epoch_seconds(y, 1, 1)
    assert es == epoch_seconds(y, 12, 31, 23, 59, 59)


# ------------------------------------------------------------- geometry

coords = st.lists(
    st.tuples(
        st.floats(-180, 180, allow_nan=False, width=32),
        st.floats(-90, 90, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=40,
)


@given(coords, st.floats(0.0001, 10.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_rdp_simplify_invariants(pts, eps):
    pts = [(float(x), float(y)) for x, y in pts]
    out = rdp_simplify(pts, eps)
    assert len(out) <= len(pts)
    assert out[0] == pts[0] and out[-1] == pts[-1]
    # every kept point is an original point, in order
    it = iter(pts)
    assert all(p in pts for p in out)
