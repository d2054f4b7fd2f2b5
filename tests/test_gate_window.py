"""Gate-window rotation invariants.

The external driver hash-checks only the first GATE_WINDOW_SIZE entries of
queries(); the window is rebuilt each round from the committed
CORRECTNESS_r*.json history (see queries/__init__.py).  These tests pin
the rotation's load-bearing properties so a registry change can't silently
waste window slots or drop an operator family from driver evidence.
"""

from __future__ import annotations

import pytest

from data_pipeline_spark.queries import (
    AGE_SLOTS,
    GATE_PIN,
    GATE_WINDOW_SIZE,
    QUERIES,
    compute_gate_window,
    driver_green_history,
)


def _families(survey_tags: str) -> set[str]:
    """SURVEY §2 family letters for a query's op-tag string, e.g.
    'A2,F10' -> {'A', 'F'}.  Tags are letters+digits (A2, J13, RJ1...)."""
    fams = set()
    for tag in survey_tags.split(","):
        tag = tag.strip()
        if not tag:
            continue
        fams.add("".join(ch for ch in tag if not ch.isdigit()))
    return fams


def test_window_is_the_first_entries_and_contains_pins():
    names = list(QUERIES.keys())
    window = names[: GATE_WINDOW_SIZE]
    assert len(names) >= GATE_WINDOW_SIZE
    assert window[: len(GATE_PIN)] == [n for n in GATE_PIN if n in QUERIES]


def test_window_prioritizes_never_driver_checked():
    """No already-green non-pin query beyond the AGE_SLOTS reservation
    may occupy a slot while a never-checked query sits outside the
    window (the reservation deliberately re-proves the stalest greens
    every round — see AGE_SLOTS)."""
    names = list(QUERIES.keys())
    window = set(names[:GATE_WINDOW_SIZE])
    hist = driver_green_history()
    unchecked_outside = [n for n in names if n not in hist and n not in window]
    green_inside = [n for n in window if n in hist and n not in set(GATE_PIN)]
    assert not (unchecked_outside and len(green_inside) > AGE_SLOTS), (
        f"window wastes slots on already-proven {green_inside} while "
        f"{unchecked_outside} have no driver evidence"
    )


def test_age_slots_reserved_under_declaration_flood():
    """Even when never-checked declarations alone could fill the window,
    AGE_SLOTS of the stalest greens still make it in — the age term
    VERDICT r6 #4 asked for (drift risk compounds with row age)."""
    n_greens = AGE_SLOTS + 8  # more greens than the reservation holds
    names = list(GATE_PIN) + [f"g{i:03d}" for i in range(n_greens)] + [
        f"n{i:03d}" for i in range(60)
    ]
    hist = {f"g{i:03d}": 1 + (i % 3) for i in range(n_greens)}  # rounds 1-3
    window = compute_gate_window(names, hist)
    assert len(window) == GATE_WINDOW_SIZE
    greens_in = [n for n in window if n in hist]
    assert len(greens_in) == AGE_SLOTS
    # and they are the STALEST greens (round 1 first, declaration order)
    stalest = sorted(hist, key=lambda n: (hist[n], n))[:AGE_SLOTS]
    assert sorted(greens_in) == sorted(stalest)


def test_cumulative_driver_coverage_spans_every_family():
    """Union of historical driver greens and the current window must touch
    every SURVEY §2 family that any declared query carries.  This is the
    guard VERDICT r3 asked for, restated for a rotating window: coverage
    is cumulative across rounds, not per-round."""
    names = list(QUERIES.keys())
    covered_names = set(driver_green_history()) | set(names[:GATE_WINDOW_SIZE])
    all_fams: set[str] = set()
    covered_fams: set[str] = set()
    for n, q in QUERIES.items():
        fams = _families(q.survey)
        all_fams |= fams
        if n in covered_names:
            covered_fams |= fams
    missing = all_fams - covered_fams
    assert not missing, f"families with no cumulative driver evidence: {missing}"


def test_rotation_on_synthetic_history():
    """compute_gate_window on synthetic input: pins lead, then
    never-checked by declaration order, then stalest greens."""
    from data_pipeline_spark.queries import AGE_SLOTS

    names = [n for n in GATE_PIN] + [f"z{i:03d}" for i in range(60)]
    hist = {f"z{i:03d}": (1 if i < 20 else 2) for i in range(40)}  # z040+ unchecked
    window = compute_gate_window(names, hist)
    assert window[: len(GATE_PIN)] == list(GATE_PIN)
    tail = window[len(GATE_PIN):]
    # never-checked (z040..z059) lead the tail up to the reserved budget
    # (window minus pins minus the age reservation); overflow unchecked
    # queries yield to the AGE_SLOTS stalest greens and re-enter after
    n_unchecked = min(20, GATE_WINDOW_SIZE - len(GATE_PIN) - AGE_SLOTS)
    assert tail[:n_unchecked] == [f"z{i:03d}" for i in range(40, 40 + n_unchecked)]
    # the age reservation goes to round-1 greens (stalest) in declaration order
    aged = tail[n_unchecked:n_unchecked + AGE_SLOTS]
    assert aged == [f"z{i:03d}" for i in range(len(aged))]
    assert len(window) == GATE_WINDOW_SIZE


def test_rotation_detects_family_drop():
    """The family-coverage computation actually fails when a family loses
    all its representatives (synthetic truncation)."""
    names = list(QUERIES.keys())
    window = names[:GATE_WINDOW_SIZE]
    hist = driver_green_history()
    # pick a family covered today and strip it from both sources
    target = "D"
    covered = set(hist) | set(window)
    stripped = {n for n in covered if target not in _families(QUERIES[n].survey)}
    fams = set()
    for n in stripped:
        fams |= _families(QUERIES[n].survey)
    assert target not in fams, "stripping a family must make coverage incomplete"


def test_history_ignores_red_rows():
    """q12/a23 were red in r01-r02 (dtype drift) and must not count as
    proven from those rounds; they re-entered the rotation."""
    hist = driver_green_history()
    for name in ("q12_priority_by_status", "a23_pivot_segments"):
        if name in hist:
            assert hist[name] >= 3, f"{name} counted green from a red round"


@pytest.mark.parametrize("name", GATE_PIN)
def test_pins_are_declared(name):
    assert name in QUERIES
