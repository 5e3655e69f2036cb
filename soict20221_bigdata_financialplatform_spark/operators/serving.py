"""Serving-layer query operators (SURVEY §2.11: ``Query(...)``, the four REST
endpoints, min/max/summary) — parameterized scan-project-filter plans.

Each function returns a lazy DataFrame; Catalyst pushes the predicate and the
projection into the scan (PushedFilters/ReadSchema — asserted in
``tests/test_plans.py``), so at 100 TB a per-key range query touches only the
matching row groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_query(
    df: DataFrame,
    order_col: str,
    lo,
    hi,
    kind: str | Sequence[str],
    key_col: str | None = None,
    key=None,
    closed: bool = False,
) -> DataFrame:
    """The flagship ``Query(start, end, kind, ticker)`` (reference
    ``Query.ipynb:143-147``): project (order_col, kind...), filter the range.

    The reference's interval is exclusive on both ends (``>``/``<``); pass
    ``closed=True`` for the inclusive variant. ``kind`` is the dynamically
    named value column (P1); ``key``/``key_col`` adds the per-symbol predicate
    (P3, reference API.py:32).
    """
    kinds = [kind] if isinstance(kind, str) else list(kind)
    oc = F.col(order_col)
    pred: Column = ((oc >= lo) & (oc <= hi)) if closed else ((oc > lo) & (oc < hi))
    if key_col is not None:
        pred = pred & (F.col(key_col) == key)
    cols = ([key_col] if key_col else []) + [order_col] + kinds
    return df.where(pred).select(*cols).orderBy(order_col)


def latest_n_per_key(
    df: DataFrame,
    n: int,
    key_cols: Sequence[str] = ("symbol",),
    order_col: str = "time",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """A5: newest-N rows per key (reference ``ORDER BY time DESC LIMIT n``
    inside a Cassandra partition, API.py:44,66 / warehouse.py:170).

    ``row_number`` over a per-key desc window — one exchange on the key, then
    a per-partition top-n sort (Spark plans WindowExec with a TopN-ish sort;
    no global sort). Ties are broken deterministically via ``tiebreak_cols``.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def summary_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A1: ``describe()``-equivalent with a stable long-format output:
    (column, count, mean, stddev, min, max) — one partial+final hash agg."""
    pieces = []
    for c in cols:
        pieces.append(
            df.agg(
                F.lit(c).alias("col_name"),
                F.count(c).cast("long").alias("n"),
                F.avg(c).alias("mean"),
                F.stddev_samp(c).alias("stddev"),
                F.min(c).alias("min_v"),
                F.max(c).alias("max_v"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
