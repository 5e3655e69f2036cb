"""Keyed upsert (MERGE) on partitioned parquet + the incremental end-of-day
update — the reference's Cassandra ``PRIMARY KEY (SYMBOL, TIME)`` write
semantics (warehouse.py:61-100) and its end-of-day recompute path
(warehouse.py:167-186), both done as set operations instead of row loops.

Without a lakehouse table format, MERGE on parquet = rewrite the touched
partitions: read base rows for affected partitions, anti-diff against the
update keys, union, overwrite ONLY those partitions (dynamic partition
overwrite). Partitions not named by any update row are untouched — at 100 TB
an end-of-day update rewrites ~10 symbol partitions, not the table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_col: str,
) -> None:
    """Upsert ``updates`` into the parquet table at ``base_path``:
    update-wins on key collision, insert otherwise. ``partition_col`` must be
    one of ``keys``' prefix columns (the layout key, e.g. ``symbol``)."""
    keys = list(keys)
    assert partition_col in keys or partition_col in updates.columns

    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not touched:
        return
    base = spark.read.parquet(base_path).where(
        F.col(partition_col).isin(touched)
    )
    survivors = base.join(updates.select(*keys), on=keys, how="left_anti")
    merged = survivors.unionByName(updates, allowMissingColumns=False)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        merged.repartition(partition_col)
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(base_path)
    )


def incremental_daily_update(
    spark: SparkSession,
    store_path: str,
    new_bars: DataFrame,
    recompute,
    context_rows: int = 60,
    key_col: str = "symbol",
    order_col: str = "date",
) -> None:
    """T3 (end-of-day stateful update) as a batch set operation: for each
    symbol with a new bar, take its trailing ``context_rows`` of history plus
    the new rows, recompute the indicator columns over that window, and
    upsert the recomputed rows — touched symbol partitions only.

    ``recompute`` is the indicator pipeline (e.g.
    ``functions.indicators.with_indicators``-shaped callable df -> df over
    the RAW bar columns). ``context_rows`` must cover the longest indicator
    lookback (EMA effectively forgets beyond ~4·span).

    The reference did this by SELECTing the last 20 rows per symbol into
    pandas, appending, recomputing, and issuing one INSERT per row
    (warehouse.py:167-186). Same semantics, no driver loop, no per-row I/O.
    """
    from pyspark.sql import Window

    touched = [r[0] for r in new_bars.select(key_col).distinct().collect()]
    if not touched:
        return
    base = spark.read.parquet(store_path).where(F.col(key_col).isin(touched))
    bar_cols = new_bars.columns
    # trailing context per symbol (newest context_rows rows)
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc())
    context = (
        base.select(*bar_cols)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= context_rows)
        .drop("__rn")
    )
    # new rows must WIN (key_col, order_col) collisions against stored context
    # — a re-emitted/corrected bar replaces the stale stored row. An anti-join
    # is deterministic where dropDuplicates' survivor is arbitrary.
    context = context.join(
        new_bars.select(key_col, order_col), on=[key_col, order_col],
        how="left_anti",
    )
    window_df = context.unionByName(new_bars)
    recomputed = recompute(window_df)
    merge_upsert(
        spark, store_path, recomputed, keys=[key_col, order_col],
        partition_col=key_col,
    )
