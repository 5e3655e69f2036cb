"""As-of join — match each left row to the latest right row at-or-before its
timestamp (SURVEY §2.4: news⨝bars on nearest prior timestamp; no Spark
builtin).

Implementation: union-and-carry. Tag both sides, union by name, then per key
``last(right_value, ignorenulls=True)`` over an ordered window up to the
current row, and keep left rows. One shuffle on the key (same exchange the
per-key windows use), no range-explosion — this is the scalable form; a
broadcast range-join variant only wins when the right side is tiny.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval (range) join: match left rows whose ``left_ts`` falls in
    ``[right_start, right_end)`` for the same key.

    Naive non-equi joins degenerate to per-key cross products (BNLJ). This
    bucketizes time: the left row joins on (key, bucket(ts)); each right
    interval explodes into the buckets it covers — the join becomes an
    EQUI-join Catalyst can hash-partition, with the exact interval predicate
    applied as a post-filter. Bucket count per interval = interval/bucket + 1,
    so pick ``bucket_seconds`` near the typical interval length.
    """
    on = list(on)
    lb = F.floor(F.col(left_ts).cast("timestamp").cast("double") / bucket_seconds)
    l = left.withColumn("__bucket", lb.cast("long"))
    s0 = F.floor(F.col(right_start).cast("timestamp").cast("double") / bucket_seconds).cast("long")
    e0 = F.floor(F.col(right_end).cast("timestamp").cast("double") / bucket_seconds).cast("long")
    r = right.withColumn("__bucket", F.explode(F.sequence(s0, e0)))
    joined = l.join(r, on=on + ["__bucket"], how="inner").where(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
    )
    out = joined.drop("__bucket")
    if how == "inner":
        return out
    if how == "left":
        right_cols = [c for c in right.columns if c not in on]
        matched = out
        lonely = left.join(
            matched.select(*left.columns), on=left.columns, how="left_anti"
        )
        for c in right_cols:
            lonely = lonely.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
        return matched.unionByName(lonely)
    raise ValueError(f"unsupported how={how!r}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, append the most recent right row with
    ``right_ts <= left_ts`` within the same key group.

    ``right_cols`` defaults to every non-key, non-ts right column. With
    ``tolerance_seconds``, matches older than the tolerance are nulled.

    **Tie precondition**: the carry window orders by (ts, side), so when
    one key has MULTIPLE right rows at the SAME ``right_ts`` the carried
    row among them is nondeterministic (the r13 dirty-numeric tie
    class). Either guarantee (key, right_ts) uniqueness at the call
    site (q25 dedupes its right side), or pass ``right_tiebreak`` — a
    unique right column appended to the window ORDER BY; the LARGEST
    tiebreak value at the tied instant wins, matching the "latest row
    by (ts, id)" struct-key convention the day-bar closes use.

    NULL timestamps never match (DuckDB ASOF JOIN semantics): a right row
    with NULL ``right_ts`` is dropped (it has no place on the timeline —
    before the fix it sorted nulls-first, i.e. "-infinity", and leaked into
    EVERY left row's carry until the first real right row), and a left row
    with NULL ``left_ts`` comes back with NULL right columns (it sorts
    before every surviving right row, so nothing is carried into it).
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    rc = list(right_cols)

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rsel = list(dict.fromkeys(
        on + [right_ts] + rc
        + ([right_tiebreak] if right_tiebreak is not None else [])
    ))
    rhs = (
        right.where(F.col(right_ts).isNotNull())
        .select(*rsel)
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col(right_ts))
    )
    if right_tiebreak is not None:
        rhs = rhs.withColumn("__tb", F.col(right_tiebreak))
        if right_tiebreak not in on + [right_ts] + rc:
            rhs = rhs.drop(right_tiebreak)
    # Align schemas for unionByName.
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in rhs.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(dict(rhs.dtypes)[c]))
    both = lhs.unionByName(rhs.select(*lhs.columns))

    # Right rows sort before left rows at the same instant (__side 0 < 1), so
    # a bar stamped exactly at the left timestamp is visible to it. With a
    # tiebreak, right rows at one instant order ASC on it, so the carry
    # (last()) deterministically keeps the LARGEST tiebreak; left rows'
    # NULL __tb sorts first within their __side group — irrelevant, since
    # the carry only reads right-row payloads.
    order_cols = ["__ts", "__side"] + (
        ["__tb"] if right_tiebreak is not None else []
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # STRUCT-carry (the q124 bracketing idiom), not per-column
    # last(ignorenulls): the match is the latest right ROW — if that row's
    # payload is NULL the asof result is NULL (DuckDB ASOF semantics).
    # Per-column carries skipped NULL cells and stitched together fields
    # from DIFFERENT right rows (r13 dirty-numeric gate, q25: a matched
    # view with a quarantined NULL value returned the PREVIOUS view's
    # value). The when() leaves left rows' payload NULL so only right
    # rows enter the carry; a right row always yields a non-null struct.
    payload = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c).alias(c) for c in rc])
    )
    carried_row = F.last(payload, ignorenulls=True).over(w)
    carried_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
    ).over(w)

    out = both.select(
        "*",
        *[carried_row.getField(c).alias(f"__carry_{c}") for c in rc],
        carried_ts.alias("__carry_ts"),
    ).where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("__ts").cast("long") - F.col("__carry_ts").cast("long")
        ) <= F.lit(tolerance_seconds)
        for c in rc:
            out = out.withColumn(f"__carry_{c}", F.when(in_tol, F.col(f"__carry_{c}")))

    keep = [c for c in left.columns]
    return out.select(
        *keep, *[F.col(f"__carry_{c}").alias(c) for c in rc]
    )


def cogroup_align(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols_left: Sequence[str],
    value_cols_right: Sequence[str],
) -> DataFrame:
    """Per-key timeline alignment of two frames via ``cogroup`` +
    ``applyInPandas`` — the union of both sides' timestamps per key, with
    each side's values forward-filled onto the merged clock (how a feature
    store aligns bar data with event data before training).

    This is the reference's client-side "merge two query results in pandas"
    step (Query.ipynb post-processing) turned distributed: Spark cogroups
    both sides on the key — ONE shuffle per input, Arrow-batched transfer —
    and pandas does only the per-key merge, never seeing more than one
    key's data at a time. State per task is bounded by the largest single
    key, not the table.
    """
    import pandas as pd

    lcols, rcols = list(value_cols_left), list(value_cols_right)
    fields = ", ".join(
        [f"{key} long", f"{ts} timestamp"]
        + [f"{c} double" for c in lcols + rcols]
    )

    def _merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty and r.empty:
            return pd.DataFrame(columns=[key, ts] + lcols + rcols)
        keyval = (l if not l.empty else r)[key].iloc[0]
        l = l.sort_values(ts)[[ts] + lcols] if not l.empty else pd.DataFrame(
            columns=[ts] + lcols
        )
        r = r.sort_values(ts)[[ts] + rcols] if not r.empty else pd.DataFrame(
            columns=[ts] + rcols
        )
        clock = pd.DataFrame(
            {ts: pd.concat([l[ts], r[ts]]).drop_duplicates().sort_values()}
        )
        out = clock.merge(l, on=ts, how="left").merge(r, on=ts, how="left")
        out[lcols + rcols] = out[lcols + rcols].ffill()
        out.insert(0, key, keyval)
        return out

    return (
        left.select(key, ts, *lcols)
        .groupBy(key)
        .cogroup(right.select(key, ts, *rcols).groupBy(key))
        .applyInPandas(_merge, schema=fields)
    )
