"""Physical-plan introspection helpers — used by tests to assert the §4
claims (predicate pushdown reaches the scan, small dims broadcast, hot paths
stay inside WholeStageCodegen) instead of taking them on faith."""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """String form of the physical plan (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text, including scan details
    (PushedFilters / ReadSchema)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters lines from every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in pushed_filters(df)


def read_schema(df: DataFrame) -> str:
    """Concatenated ReadSchema lines — verifies column pruning reached the
    scan (a 2-column projection must not read 16 columns)."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def conditional_bnlj_count(df: DataFrame) -> int:
    """Number of QUADRATIC BroadcastNestedLoopJoin nodes: BNLJ carrying a
    join CONDITION whose build side is NOT a one-row global aggregate.

    Rationale (working-notes invariant 13): OR-of-equality and
    inequality-pair joins plan BNLJ and evaluate O(|left|·|right|) pairs —
    the shape that melts at scale. Two linear shapes are exempt:
    a bare Cross with no condition (the broadcast one-row scalar crossJoin
    idiom), and a conditional BNLJ whose broadcast side is a global
    ``Aggregate(keys=[], …)`` — the scalar-subquery-threshold pattern
    (``x > (SELECT avg(…))``), which compares each stream row against ONE
    broadcast row.
    """
    lines = executed_plan(df).splitlines()
    bad = 0
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line or ", (" not in line:
            continue
        col = line.index("BroadcastNestedLoopJoin")
        # Subtree = following lines whose tree prefix up to `col` is only
        # branch drawing (spaces and ':'); a '+-'/':-' marker LEFT of col
        # means we've climbed back out. Direct children mark at exactly col.
        children: list[int] = []
        j = i + 1
        while j < len(lines):
            prefix = lines[j][:col]
            if len(lines[j]) <= col or prefix.strip(" :") != "":
                break
            if lines[j][col : col + 2] in (":-", "+-"):
                children.append(j)
            j += 1
        end = j
        if not children:  # can't see the build side: conservatively flag
            bad += 1
            continue
        if "BuildRight" in line:
            lo, hi = children[-1], end
        else:
            lo, hi = children[0], children[1] if len(children) > 1 else end
        build = "\n".join(lines[lo:hi])
        if "Aggregate(keys=[]" not in build:
            bad += 1
    return bad


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (``*(n)`` markers) in the FINAL
    adaptive plan. Under AQE the physical operators only materialize at
    execution, so this executes the query's own QueryExecution first."""
    df.collect()
    return executed_plan(df).count("*(")
