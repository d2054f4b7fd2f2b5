#!/usr/bin/env python
"""Registry-wide physical-plan sweep (optimization round checklist,
guide §7.2): build EVERY declared query at sf0.001, parse its
executedPlan, and report per-query operator counts plus flagged
anti-patterns:

  - CartesianProduct / BroadcastNestedLoopJoin (guide §3: accidental
    cartesian products)
  - BatchEvalPython (row-at-a-time Python UDF; §4: should be built-ins
    or Arrow)
  - scans with no ReadSchema pruning when the query uses few columns
    (reported as widest-scan column count; §6: column pruning)
  - Exchange counts (shuffle inventory; §2)

Writes a JSON report to plans/$SPARK_GRAFT_PLAN_ROUND/plan_sweep.json
(default r16) and prints a summary.
Planning only — nothing executes.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark.queries import QUERIES  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

FLAG_OPS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
)
COUNT_OPS = (
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "Window",
    "Generate",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "Sort",
) + FLAG_OPS

_OP_LINE = re.compile(r"^[\s:+*()-]*(\w+)")


def signature(plan: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for line in plan.splitlines():
        m = _OP_LINE.match(line)
        if not m:
            continue
        tok = m.group(1)
        if tok in COUNT_OPS:
            counts[tok] = counts.get(tok, 0) + 1
    return counts


def main() -> None:
    spark = get_spark("plan_sweep")
    report: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, q in QUERIES.items():
        try:
            df = q.spark_fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — sweep must cover all
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        sig = signature(plan)
        flags = [op for op in FLAG_OPS if sig.get(op)]
        # widest scan: max column count in any ReadSchema struct
        widths = [
            s.count(":") for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        ]
        report[name] = {
            "ops": sig,
            "flags": flags,
            "max_scan_cols": max(widths) if widths else 0,
        }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16"), "plan_sweep.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump({"report": report, "errors": errors}, fh, indent=1, sort_keys=True)
    flagged = {n: r["flags"] for n, r in report.items() if r["flags"]}
    print(f"swept {len(report)} queries, {len(errors)} errors -> {out}")
    print("flagged:", json.dumps(flagged, indent=1) if flagged else "none")
    if errors:
        print("errors:", json.dumps(errors, indent=1))
    busiest = sorted(
        report.items(), key=lambda kv: -kv[1]["ops"].get("Exchange", 0)
    )[:15]
    print("most exchanges:")
    for n, r in busiest:
        print(f"  {n}: {r['ops'].get('Exchange', 0)} exchanges, ops={r['ops']}")
    spark.stop()


if __name__ == "__main__":
    main()
