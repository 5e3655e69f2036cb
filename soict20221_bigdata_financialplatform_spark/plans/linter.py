"""Scale linter — turns the repo's plan guardrails into a user-facing
check: ``scale_lint(df)`` inspects the PHYSICAL plan for the shapes that
melt at 100 TB and returns structured findings; ``assert_scalable(df)``
is the pipeline-side guardrail that refuses to launch a job whose plan
carries an error-level finding.

The rules are exactly the invariants the test suite enforces on the
query registry (tests/test_plans.py), packaged for user queries:

  error   quadratic-nested-loop   conditional BroadcastNestedLoopJoin —
                                  O(|L|·|R|) pair evaluation (OR-of-
                                  equality / inequality-pair joins).
                                  Rewrite as posexplode → equi-join →
                                  distinct-pair collapse.
  error   cartesian-product       CartesianProduct node (a non-broadcast
                                  cross join).
  error   global-ordered-window   WindowExec with ORDER but no PARTITION
                                  spec: every row through ONE task. Use a
                                  per-key window or orderBy().limit()
                                  (= TakeOrderedAndProject).
  error   constant-partition-     pmod(col, 1) single-partition ordered
          window                  window over a NON-aggregate frame — the
                                  global window in disguise. Licensed only
                                  for one-row-per-group offset chains
                                  (the q195/q208 prefix-sum rank).
  warning row-python-udf          BatchEvalPython: row-at-a-time Python
                                  UDF in the plan (10-100× slower than
                                  Arrow). Use native exprs or pandas_udf.
  info    arrow-python-crossing   Arrow-batched Python boundary
                                  (ArrowEvalPython / mapInPandas /
                                  applyInPandas) — fine, but worth
                                  knowing it's on the hot path.

``scale_lint`` evaluates plan SHAPE only — it triggers no job and reads
no data (the physical plan string is produced by planning alone).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from soict20221_bigdata_financialplatform_spark.plans.checks import (
    conditional_bnlj_count,
    executed_plan,
)


def unpartitioned_ordered_window_count(df: DataFrame) -> int:
    """WindowExec nodes with an ORDER spec but NO partition spec — the
    single-partition running-window shape. Parses the plan's ``Window
    [exprs], [partition]?, [order]?`` bracket groups."""
    bad = 0
    for line in executed_plan(df).splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups, depth, cur = [], 0, ""
        for ch in m.group(1):
            if ch == "[":
                depth += 1
            if depth > 0:
                cur += ch
            if ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    cur = ""
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(
            r" (ASC|DESC)[ ,\]]", groups[1]
        ):
            continue  # partition-only window (min-over-partition etc.)
        bad += 1
    return bad


def constant_partition_window_over_raw_frame_count(df: DataFrame) -> int:
    """Window nodes partitioned by the deliberate-single-partition idiom
    ``pmod(col, 1)`` (invariant 16a: a data-derived constant that Catalyst
    cannot fold away) whose INPUT subtree shows no aggregate — i.e. the
    one-task window runs over a RAW row-cardinality frame instead of the
    bounded one-row-per-group offset frame the idiom is licensed for
    (the q195/q208 prefix-sum chain shape). A pmod(...,1) window over an
    un-aggregated frame is the banned global ordered window in disguise.

    Note: a lineage-truncating localCheckpoint between the aggregate and
    the window hides the aggregate from the plan; keep the groupBy on the
    window side of any checkpoint (q208 does)."""
    plan = executed_plan(df)
    lines = plan.splitlines()
    # the planner projects the partition expr into a _wN alias below the
    # Window node — resolve which attribute ids are pmod(..., 1)
    const_ids = set(re.findall(r"pmod\([^,()]+, 1\) AS (\w+#\d+L?)", plan))
    bad = 0
    for i, line in enumerate(lines):
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups, depth, cur = [], 0, ""
        for ch in m.group(1):
            if ch == "[":
                depth += 1
            if depth > 0:
                cur += ch
            if ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    cur = ""
        if len(groups) < 3:
            continue
        part = groups[1]
        if not (
            re.search(r"pmod\([^,()]+, 1\)", part)
            or any(cid in part for cid in const_ids)
        ):
            continue
        col = line.index("Window")
        j = i + 1
        while j < len(lines):
            prefix = lines[j][:col]
            if len(lines[j]) <= col or prefix.strip(" :") != "":
                break
            j += 1
        subtree = "\n".join(lines[i + 1 : j])
        if not re.search(
            r"HashAggregate|SortAggregate|ObjectHashAggregate"
            r"|TakeOrderedAndProject",
            subtree,
        ):
            bad += 1
    return bad


def scale_lint(df: DataFrame) -> list[dict]:
    """Structured findings ``[{rule, level, detail}, ...]`` for the plan
    shapes that do not survive a 100× scale-up; empty list = clean."""
    plan = executed_plan(df)
    findings: list[dict] = []
    n = conditional_bnlj_count(df)
    if n:
        findings.append(
            {
                "rule": "quadratic-nested-loop",
                "level": "error",
                "detail": f"{n} conditional BroadcastNestedLoopJoin node(s) "
                "evaluate O(|left|*|right|) pairs; rewrite the OR/inequality "
                "join as posexplode -> equi-join -> distinct pair collapse",
            }
        )
    if "CartesianProduct" in plan:
        findings.append(
            {
                "rule": "cartesian-product",
                "level": "error",
                "detail": "CartesianProduct node (non-broadcast cross join)",
            }
        )
    w = unpartitioned_ordered_window_count(df)
    if w:
        findings.append(
            {
                "rule": "global-ordered-window",
                "level": "error",
                "detail": f"{w} ordered window(s) with no PARTITION BY: "
                "every row flows through one task; partition the window "
                "or use orderBy().limit() for top-k",
            }
        )
    c = constant_partition_window_over_raw_frame_count(df)
    if c:
        findings.append(
            {
                "rule": "constant-partition-window",
                "level": "error",
                "detail": f"{c} pmod(col,1) constant-partition ordered "
                "window(s) over a non-aggregate frame: one task sees every "
                "input row. The idiom is licensed only for one-row-per-"
                "group offset chains (prefix-sum rank); aggregate first "
                "or use the bucketed prefix sum",
            }
        )
    if "BatchEvalPython" in plan:
        findings.append(
            {
                "rule": "row-python-udf",
                "level": "warning",
                "detail": "row-at-a-time Python UDF (BatchEvalPython); "
                "use native expressions or an Arrow-batched pandas_udf",
            }
        )
    arrow_nodes = [
        t
        for t in (
            "ArrowEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",
            "FlatMapGroupsInPandasWithState",
        )
        if t in plan
    ]
    if arrow_nodes:
        findings.append(
            {
                "rule": "arrow-python-crossing",
                "level": "info",
                "detail": "Arrow-batched Python boundary on the hot path: "
                + ", ".join(arrow_nodes),
            }
        )
    return findings


def assert_scalable(df: DataFrame) -> None:
    """Raise ``ValueError`` listing every error-level finding; the
    pre-launch guardrail for pipelines (warnings/info pass)."""
    errors = [f for f in scale_lint(df) if f["level"] == "error"]
    if errors:
        msg = "; ".join(f"{f['rule']}: {f['detail']}" for f in errors)
        raise ValueError(f"plan fails scale lint: {msg}")
