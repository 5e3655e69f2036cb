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


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (``*(n)`` markers) in the FINAL
    adaptive plan. Under AQE the physical operators only materialize at
    execution, so this executes the query's own QueryExecution first."""
    df.collect()
    return executed_plan(df).count("*(")
