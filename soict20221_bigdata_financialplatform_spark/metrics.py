"""Zero-cost pipeline metrics via ``DataFrame.observe``.

At 100 TB the naive way to know "how many rows / how many nulls did this
stage emit" is a second action — another full scan per metric. ``observe``
attaches accumulator-backed aggregates to the EXISTING action: metrics ride
along with the job, cost nothing extra, and are exact (not sampled). This is
the Spark-native replacement for the reference's print-and-count debugging
(it collects whole frames to inspect them, e.g. ``test.py``'s console sink).

Batch: read ``Observation.get`` after any action. Streaming: the same
``observe`` call surfaces per-batch metrics on ``StreamingQueryListener``
progress events (``observedMetrics``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions to ``df``'s next action.

    Returns (instrumented frame, observation handle); ``obs.get`` blocks
    until the first action completes and returns ``{metric_name: value}``.
    Metric expressions must be aggregates without distinct/sort (Spark's
    observe contract)."""
    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs


def quality_metrics(
    df: DataFrame, name: str, cols: list[str]
) -> tuple[DataFrame, Observation]:
    """Stage-health bundle: row count plus per-column null counts, exact,
    attached to the existing action (no extra scan)."""
    m: dict[str, Column] = {"rows": F.count(F.lit(1))}
    for c in cols:
        m[f"nulls_{c}"] = F.count(F.lit(1)) - F.count(c)
    return observed(df, name, m)


def observed_stream(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> DataFrame:
    """Streaming form: ``Observation`` handles are batch-only, so streams
    register metrics by NAME; each micro-batch's exact values surface on the
    query's progress events (``lastProgress["observedMetrics"][name]``) and
    on any ``StreamingQueryListener`` — per-batch row counts and null rates
    with zero added state or scans."""
    return df.observe(name, *[m.alias(k) for k, m in metrics.items()])
