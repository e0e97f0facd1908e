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
- ``unpartitioned-window`` — a ``Window`` node with no PARTITION BY whose
  input subtree is not already limit-bounded
  (``TakeOrderedAndProject``/``CollectLimit``/``GlobalLimit``): every
  input row funnels through a single task (``Exchange SinglePartition``).
  Fine over a provably small frame (an n-bins CDF, a k-row centroid
  table); a scale-killer over anything data-sized — the top-k cut must be
  ``orderBy().limit()`` (a distributed ``TakeOrderedAndProject``), never a
  global ``row_number()``.
- ``scan-multiplicity`` — more than ``_MAX_FILESCANS`` ``FileScan`` leaves
  in ONE plan: the signature of an unpinned iterative/self-referencing
  frame whose lineage re-embeds the upstream scan exponentially (round-9's
  ``raking_ipf`` compiled to 768 FileScans of the corpus before its
  ``localCheckpoint`` pin). Legitimate plans stay far below the ceiling —
  the widest registered query reads ~12 leaves (three contingency pairs ×
  four branches); TPC-H's 8-table joins read 8. The fix is always the
  same: materialize the bounded reused frame once
  (``localCheckpoint``, the pagerank/minhash/global_rank idiom).

The linter reads the *executed* plan string when the frame has been
collected under AQE (final plan), else the static physical plan. It is a
heuristic reviewer, not a prover — used in tests to gate the engine's own
operators (see tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# FileScan-leaf ceiling per plan. Chosen with headroom over the widest
# legitimate registered plan (12 leaves) yet 48x under the round-9
# raking_ipf blowup (768) — any unpinned loop crosses it by iteration 3.
_MAX_FILESCANS = 16


def _plan_string(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    try:
        return qe.executedPlan().toString()
    except Exception:
        return qe.sparkPlan().toString()


def lint_plan(df: DataFrame) -> list[str]:
    plan = _plan_string(df)
    findings: list[str] = []

    n_scans = plan.count("FileScan")
    if n_scans > _MAX_FILESCANS:
        findings.append(
            f"scan-multiplicity: {n_scans} FileScan leaves in one plan "
            f"(ceiling {_MAX_FILESCANS}) — an unpinned iterative or "
            "self-referencing frame is re-embedding its upstream scan; "
            "localCheckpoint the bounded reused frame so the plan stays "
            "linear in the iteration count"
        )

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

    # A Window with an empty partition spec funnels its whole input through
    # one task. The plan line carries top-level bracket groups
    # [functions], [partition], [order] — the partition group is omitted
    # when empty, so a 2-group line is global IFF its second group is an
    # order spec (sort directions present); a 2-group line whose second
    # group is bare columns is partitionBy-without-orderBy, which scales.
    # A group scan (not a regex) because window functions nest arbitrary
    # bracketed expressions. The finding is suppressed when the window's
    # own input subtree is limit-bounded — rank-over-top-k via
    # orderBy().limit() is the sanctioned pattern and its k-row window is
    # harmless.
    lines = plan.splitlines()

    def _depth(line: str) -> int:
        m = re.search(r"[+:]- ", line)
        return m.start() if m else -1  # -1: root (no marker)

    def _bracket_groups(s: str) -> list[str]:
        groups: list[str] = []
        depth = 0
        start = -1
        for i, ch in enumerate(s):
            if ch == "[":
                if depth == 0:
                    start = i + 1
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(s[start:i])
                elif depth < 0:
                    depth = 0
        return groups

    _order_spec = re.compile(r" (ASC|DESC) NULLS (FIRST|LAST)")

    def _is_global_window(segment: str) -> bool:
        groups = _bracket_groups(segment)
        if len(groups) >= 3:  # [functions], [partition], [order]
            return False
        if len(groups) == 2:  # second group: order spec ⇒ no partition
            return bool(_order_spec.search(groups[1]))
        return len(groups) == 1  # functions only: neither partition nor order

    bounded = re.compile(r"TakeOrderedAndProject|CollectLimit|GlobalLimit")
    for i, ln in enumerate(lines):
        m = re.search(r"(?:[+:]- |^)Window (\[.*)$", ln)
        if not m or not _is_global_window(m.group(1)):
            continue
        wdepth = _depth(ln)
        subtree_bounded = False
        for j in range(i + 1, len(lines)):
            # marker-less lines (depth -1: AQE headers, '===' separators,
            # reused-subquery sections) also end the subtree — without
            # this the scan could run into an unrelated section and let
            # ITS CollectLimit suppress a real finding (round-5 ADVICE)
            if _depth(lines[j]) <= wdepth:
                break  # left the window's subtree
            if bounded.search(lines[j]):
                subtree_bounded = True
                break
        if not subtree_bounded:
            findings.append(
                "unpartitioned-window: global Window with no PARTITION BY "
                "and no bounding limit below it — all input rows pass "
                "through a single task; use orderBy().limit() for top-k or "
                "partition the window"
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
