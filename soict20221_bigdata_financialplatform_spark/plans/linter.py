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
                                  NOTE: matches the pmod(col, 1) spelling
                                  ONLY — another data-derived-constant
                                  idiom (col*0, pmod(col, lit) via an
                                  alias chain, crc32(x)%1, ...) bypasses
                                  it silently. If you introduce a new
                                  constant-key idiom, extend the regex in
                                  constant_partition_window_over_raw_
                                  frame_count in the same commit.
  warning low-cardinality-        ordered window partitioned ONLY by
          partition-window        catalog-cardinality enum columns
                                  (priority/segment/status/...) over a
                                  raw frame: one task per enum value —
                                  bounded parallelism (the r7 q246
                                  shape). Name-heuristic.
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


# Plan nodes that PRESERVE their input's cardinality class: a window
# whose input chain crosses only these before reaching an aggregate is
# still running over the bounded one-row-per-group frame. Joins,
# generates, scans, and unions do NOT appear here — any of them as the
# nearest substantive node means the window ranks a RAW frame, no matter
# what aggregates sit deeper in the subtree (the r8 q192/q194 exemption
# gap: a raw per-row frame that merely JOINS an aggregated side used to
# bypass the rule because the search matched anywhere in the subtree).
_PASSTHROUGH_NODES = frozenset(
    {
        "Sort", "Exchange", "AQEShuffleRead", "ShuffleQueryStage",
        "InputAdapter", "Project", "Filter", "ColumnarToRow",
        "WholeStageCodegen", "CollectMetrics", "Coalesce", "Window",
        "WindowGroupLimit",  # rank-limit pushdown: cardinality-REDUCING
    }
)
_AGG_NODES = frozenset(
    {
        "HashAggregate", "SortAggregate", "ObjectHashAggregate",
        "TakeOrderedAndProject",
    }
)
_JOIN_NODES = frozenset(
    {
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct",
    }
)


def _plan_children(lines: list[str], i: int) -> list[list[str]]:
    """Split the subtree below ``lines[i]`` into direct-child blocks.
    In Spark tree strings a node's children carry a ``+- `` / ``:- ``
    marker at exactly the column where the parent's own text begins."""
    p = re.match(r"[\s:+\-]*", lines[i]).end()
    idxs = [
        j
        for j in range(i + 1, len(lines))
        if len(lines[j]) > p + 1
        and lines[j][p] in ":+"
        and lines[j][p + 1] == "-"
    ]
    return [
        lines[j : (idxs[k + 1] if k + 1 < len(idxs) else len(lines))]
        for k, j in enumerate(idxs)
    ]


def _window_input_is_aggregate(subtree_lines: list[str]) -> bool:
    """True when the NEAREST substantive node below a Window is an
    aggregate (the licensed one-row-per-group offset frame); cardinality-
    preserving pass-through nodes (Sort/Exchange/Project/Filter/stacked
    Window/WindowGroupLimit/codegen wrappers) are skipped. The r8
    q192/q194 exemption gap — an aggregate ANYWHERE in the subtree used
    to exempt, so raw frames that merely joined an aggregated side passed
    silently — is closed: at a join the walk recurses into the side(s)
    that can be large (the streamed side of a broadcast join — the build
    side is bounded by fitting in a broadcast — or BOTH sides of a
    shuffle join), requiring each to be aggregate-derived.
    ReusedExchange/ReusedQueryStage reference a subtree planned elsewhere
    and cannot be resolved from the plan string — treated as exempt
    (this is a guardrail, not a proof)."""
    for i, line in enumerate(subtree_lines):
        m = re.match(r"[\s:+\-]*(?:\*\(\d+\)\s*)?([A-Za-z]\w*)", line)
        if not m:
            continue
        node = m.group(1)
        if node in _PASSTHROUGH_NODES:
            continue
        if node in _AGG_NODES:
            return True
        if node in ("ReusedExchange", "ReusedQueryStage", "ReusedSubquery"):
            return True
        if node in _JOIN_NODES:
            blocks = _plan_children(subtree_lines, i)
            if len(blocks) != 2:
                return False
            if "BuildRight" in line:
                need = [blocks[0]]
            elif "BuildLeft" in line:
                need = [blocks[1]]
            else:
                need = blocks
            return all(_window_input_is_aggregate(b) for b in need)
        return False
    return False


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
        if not _window_input_is_aggregate(lines[i + 1 : j]):
            bad += 1
    return bad


# Catalog-cardinality column names: keys whose distinct-value count is a
# small constant fixed by the data model (TPC-H enum-ish attributes plus
# the testdata's categorical columns), NOT proportional to data volume.
# An ordered rank window partitioned ONLY by these gives one task per
# enum value — bounded parallelism, the r7 q246 shape.
LOW_CARDINALITY_COLS = frozenset(
    {
        "priority", "o_orderpriority", "orderpriority",
        "segment", "mktsegment", "c_mktsegment",
        "status", "orderstatus", "o_orderstatus",
        "linestatus", "l_linestatus", "returnflag", "l_returnflag",
        "shipmode", "l_shipmode", "shipinstruct", "l_shipinstruct",
        "region", "r_name", "r_regionkey",
        "event_type", "source", "lang",
    }
)


def low_cardinality_partition_window_count(
    df: DataFrame, low_card_cols: frozenset = LOW_CARDINALITY_COLS
) -> int:
    """Ordered Window nodes whose partition expressions reference ONLY
    catalog-cardinality columns (5-25 distinct values fixed by the data
    model — see ``LOW_CARDINALITY_COLS``) and whose input subtree shows
    no aggregate: one task per enum value sorts its whole slice of the
    raw frame, a bounded-parallelism sort at 100 TB (same class as the
    banned global window, just ×|enum|). The constant-partition linter
    cannot see this (the key is data, not a folded constant); this is
    the name-heuristic sibling. Windows over AGGREGATE frames are exempt
    (a ≤|enum|·|grain| bucket frame is the licensed prefix-sum shape —
    the rebuilt q246). Name-based, so a renamed alias bypasses it; it is
    a guardrail, not a proof."""
    plan = executed_plan(df)
    lines = plan.splitlines()
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
            continue  # unpartitioned: the global-window rule's territory
        if not re.search(r" (ASC|DESC)[ ,\]]", groups[2]):
            continue
        part_cols = {c.lower() for c in re.findall(r"(\w+)#\d+", groups[1])}
        if not part_cols or not part_cols <= low_card_cols:
            continue
        col = line.index("Window")
        j = i + 1
        while j < len(lines):
            prefix = lines[j][:col]
            if len(lines[j]) <= col or prefix.strip(" :") != "":
                break
            j += 1
        if not _window_input_is_aggregate(lines[i + 1 : j]):
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
    lc = low_cardinality_partition_window_count(df)
    if lc:
        findings.append(
            {
                "rule": "low-cardinality-partition-window",
                "level": "warning",
                "detail": f"{lc} ordered window(s) partitioned only by "
                "catalog-cardinality (enum) columns over a raw frame: one "
                "task per enum value sorts its whole slice. Bucket to "
                "(enum, grain) counts and rank via the prefix sum instead "
                "(name-heuristic; see LOW_CARDINALITY_COLS)",
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
