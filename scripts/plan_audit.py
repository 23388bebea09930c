#!/usr/bin/env python
"""Plan-shape audit: sweep every registered query's physical plan for the
scale-killer checklist (SURVEY.md §4, SCALE.md §2) and fail on any
finding that is not consciously allowlisted.

The per-query plan tests in tests/test_plans.py pin the load-bearing
properties of ~40 representative plans; this audit is the registry-wide
complement that catches the NEXT operator someone adds with a quadratic
join or an unpartitioned window. Checks, per executed-plan tree:

  cartesian       CartesianProduct operator anywhere. The registry's
                  deliberate cross joins are all broadcast-sized and plan
                  as BroadcastNestedLoopJoin; a CartesianProduct means a
                  shuffle-partitioned quadratic join — never acceptable.
  row_udf         BatchEvalPython (row-at-a-time Python UDF). Only the
                  operators whose CONTRACT is the row-UDF API may carry
                  one; everything else must use built-ins or Arrow
                  (ArrowEvalPython / FlatMapGroupsInPandas are fine).
  global_window   Window operator with an empty partition spec — a
                  single-task sort of the whole input at scale. Banded
                  replacements (operators/banded.py) exist precisely so
                  registered queries never need one on a large frame;
                  allowlisted names operate on provably tiny frames
                  (band offsets <=32 rows, k-sized aggregates, ...).
  dup_scan        The same parquet table scanned more than once in one
                  plan — a branch off an un-checkpointed grain silently
                  re-reads the fact table (review rounds 3-4 each found
                  one of these by hand; this automates the grep).

    python scripts/plan_audit.py [sf_dir] [--json out.json]

Exit 0 iff every finding is allowlisted. Runs the builders (sink/stream
operators execute their writes) but never collects result rows.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> reason. An entry here is a conscious, reviewed exception —
# new findings must either be fixed or argued into this dict.
ALLOW_ROW_UDF = {
    "q_udf_python": "the operator's contract IS the row-at-a-time Python "
    "UDF API (slow-path demo; its pandas twin q_udf_pandas_scalar is the "
    "recommended form)",
    "q_udf_sql": "spark.udf.register of a plain Python callable — the "
    "SQL-facing registration API under test evaluates via BatchEvalPython",
}
ALLOW_GLOBAL_WINDOW: dict[str, str] = {}
ALLOW_DUP_SCAN: dict[str, str] = {}
ALLOW_CARTESIAN: dict[str, str] = {}


def _top_level_groups(s: str) -> list[str]:
    """Split the [...] groups appearing at bracket depth 0 of s."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start + 1 : i])
                start = None
    return groups


def _window_findings(plan: str) -> list[str]:
    """Window operator lines whose partition spec is empty.

    A Window line prints as  Window [fns], [partSpec], [orderSpec]  when
    partitioned and  Window [fns], [orderSpec]  (or just [fns]) when the
    partition spec is empty — so <3 top-level groups == global window.
    """
    out = []
    for line in plan.splitlines():
        body = line.lstrip(" +-:*!")
        if body.startswith("Window ") or body.startswith("WindowGroupLimit "):
            if len(_top_level_groups(body)) < 3:
                out.append(body[:120])
    return out


def _dup_scan_findings(plan: str) -> list[str]:
    """Tables whose parquet FileScan appears on >1 tree line."""
    counts: dict[str, int] = {}
    for line in plan.splitlines():
        if "FileScan parquet" not in line:
            continue
        m = re.search(r"([A-Za-z0-9_]+)\.parquet", line)
        key = m.group(1) if m else "<unknown>"
        counts[key] = counts.get(key, 0) + 1
    return [f"{t} x{n}" for t, n in sorted(counts.items()) if n > 1]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    from pyspark.sql import SparkSession

    from modforms_db_spark.registry import get_registry
    from modforms_db_spark.session import prep

    spark = prep(
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    report: dict[str, dict[str, list[str]]] = {}
    errors: dict[str, str] = {}
    for name, q in get_registry().items():
        try:
            plan = (
                q.builder(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001 — audit must keep going
            errors[name] = f"{type(exc).__name__}: {exc}"
            continue
        findings: dict[str, list[str]] = {}
        if "CartesianProduct" in plan and name not in ALLOW_CARTESIAN:
            findings["cartesian"] = ["CartesianProduct in plan"]
        if "BatchEvalPython" in plan and name not in ALLOW_ROW_UDF:
            findings["row_udf"] = ["BatchEvalPython in plan"]
        if name not in ALLOW_GLOBAL_WINDOW:
            w = _window_findings(plan)
            if w:
                findings["global_window"] = w
        if name not in ALLOW_DUP_SCAN:
            d = _dup_scan_findings(plan)
            if d:
                findings["dup_scan"] = d
        if findings:
            report[name] = findings

    for name, f in sorted(report.items()):
        for kind, items in f.items():
            for it in items:
                print(f"{kind.upper():14s} {name}: {it}")
    for name, e in sorted(errors.items()):
        print(f"{'ERROR':14s} {name}: {e[:160]}")
    total = len(get_registry())
    print(
        f"findings: {sum(len(v) for v in report.values())} across "
        f"{len(report)} of {total} queries; {len(errors)} errors ({sf_dir})"
    )
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"findings": report, "errors": errors}, fh, indent=1)
    spark.stop()
    return 1 if report or errors else 0


if __name__ == "__main__":
    sys.exit(main())
