"""Physical-plan linter: mechanical checks for the anti-patterns that kill
jobs at 100 TB. ``lint_plan(df)`` returns a list of findings (empty = clean);
``assert_scales(df)`` raises on any.

What it flags and why:

- ``python-row-udf`` — a ``BatchEvalPython`` node: row-at-a-time Python in
  the plan deserializes every row out of Tungsten; 10-100x slower than the
  equivalent Column expression (the reference's own Python-lambda filter is
  the cautionary tale — it defeated pushdown entirely).
- ``cartesian-product`` — ``CartesianProduct``/unconditioned
  ``BroadcastNestedLoopJoin``: O(n*m) row pairs; at fact-table sizes that
  is never intended. (An IN-equality rewritten by Catalyst can plan BNLJ
  legitimately — the check skips BNLJ carrying a join condition.)
- ``global-sort`` — a top-level ``Sort`` with ``global=true`` and no
  ``TakeOrderedAndProject``/limit: a full-data range shuffle; at 100 TB
  only acceptable feeding a bounded consumer.
- ``unpushed-scan-filter`` — a parquet/orc scan whose ``PushedFilters`` is
  empty while a ``Filter`` node sits directly on top of it referencing
  scanned columns: the predicate stayed in Spark instead of reaching the
  reader (typically a UDF or a non-deterministic expression in the way).

The linter reads the *executed* plan string when the frame has been
collected under AQE (final plan), else the static physical plan. It is a
heuristic reviewer, not a prover — used in tests to gate the engine's own
operators (see tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _plan_string(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    try:
        return qe.executedPlan().toString()
    except Exception:
        return qe.sparkPlan().toString()


def lint_plan(df: DataFrame) -> list[str]:
    plan = _plan_string(df)
    findings: list[str] = []

    if "BatchEvalPython" in plan:
        findings.append(
            "python-row-udf: BatchEvalPython in plan — row-at-a-time Python "
            "on the hot path; use built-in functions or a pandas UDF"
        )

    if "CartesianProduct" in plan:
        findings.append(
            "cartesian-product: CartesianProduct in plan — O(n*m) join; add "
            "an equi-condition or broadcast a provably small side"
        )
    if re.search(r"BroadcastNestedLoopJoin BuildLeft, (Inner|Cross)\s*$", plan, re.M) or re.search(
        r"BroadcastNestedLoopJoin BuildRight, (Inner|Cross)\s*$", plan, re.M
    ):
        findings.append(
            "cartesian-product: condition-free BroadcastNestedLoopJoin — "
            "every row pair is evaluated; intended only for tiny spines"
        )

    if "TakeOrderedAndProject" not in plan and "CollectLimit" not in plan:
        for m in re.finditer(r"Sort \[([^\]]*)\], (true|false)", plan):
            if m.group(2) == "true":
                findings.append(
                    "global-sort: unbounded global Sort — full-data range "
                    "shuffle; bound it with a limit or sort within partitions"
                )
                break

    # Filter above a scan whose PushedFilters is empty. The flag only fires
    # when the Filter is an ANCESTOR of the scan with nothing but projections
    # in between — an intervening aggregate/join/window means the Filter is
    # over DERIVED rows (e.g. a HAVING over an aggregate), which is not a
    # pushable scan predicate. Ancestry is recovered from the plan text by
    # indentation: a node's parent is the nearest line above with a strictly
    # shallower tree marker.
    blockers = re.compile(
        r"HashAggregate|SortAggregate|ObjectHashAggregate|Join\b|Exchange"
        r"|Window|Generate|Expand|Union|AggregateInPandas|FlatMapGroupsInPandas"
    )

    def _depth(line: str) -> int:
        m = re.search(r"[+:]- ", line)
        return m.start() if m else -1  # -1: root (no marker)

    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "PushedFilters: []" not in ln:
            continue
        depth = _depth(ln)
        flagged = False
        for j in range(i - 1, -1, -1):
            d = _depth(lines[j])
            if d >= depth:  # sibling subtree line, not an ancestor
                continue
            depth = d  # next ancestor must be shallower still
            if blockers.search(lines[j]):
                break
            if re.search(r"\bFilter \(", lines[j]) or re.search(
                r"[+:]- Filter ", lines[j]
            ):
                flagged = True
                break
            if d <= 0:
                break
        if flagged:
            findings.append(
                "unpushed-scan-filter: a Filter sits on a scan with "
                "PushedFilters: [] — the predicate never reached the "
                "reader (UDF or unsupported expression in the way)"
            )
            break

    return findings


def assert_scales(df: DataFrame) -> None:
    """Raise AssertionError listing every lint finding; no-op when clean."""
    findings = lint_plan(df)
    if findings:
        raise AssertionError(
            "plan does not scale:\n" + "\n".join(f"- {f}" for f in findings)
        )
