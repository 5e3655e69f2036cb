"""Cascading bar rollups (the "hypertable rollup" pattern): coarser OHLC
bars are computed FROM the next finer level, never from raw ticks — at 100 TB
the 1-minute store is built once from ticks, then hourly/daily levels each
read ~60× less data than a raw re-aggregation.

OHLC composes associatively:
  open  = open of the earliest sub-bar        (min_by(open, bar_start))
  high  = max(high);  low = min(low)
  close = close of the latest sub-bar         (max_by(close, bar_start))
  volume = max(volume)   (producer emits cumulative day volume)
  n_ticks = sum(n_ticks)
so every level is exact, proven against direct aggregation in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bars_from_ticks(
    ticks: DataFrame,
    window: str = "1 minute",
    ts_col: str = "time",
    key_col: str = "symbol",
    price_col: str = "close",
    volume_col: str = "volume",
) -> DataFrame:
    """Finest level: ticks → bars (batch twin of the streaming bar agg)."""
    return (
        ticks.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.min_by(price_col, ts_col).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, ts_col).alias("close"),
            F.max(volume_col).alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            F.col("w.end").alias("bar_end"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_ticks",
        )
    )


def rollup_bars(bars: DataFrame, window: str, key_col: str = "symbol") -> DataFrame:
    """One cascade step: finer bars → coarser bars (exact, associative)."""
    return (
        bars.groupBy(F.window("bar_start", window).alias("w"), F.col(key_col))
        .agg(
            F.min_by("open", "bar_start").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "bar_start").alias("close"),
            F.max("volume").alias("volume"),
            F.sum("n_ticks").alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            F.col("w.end").alias("bar_end"),
            key_col,
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_ticks",
        )
    )


def cascade(
    ticks: DataFrame,
    windows: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
    **kwargs,
) -> dict[str, DataFrame]:
    """Full hierarchy: each level from the previous. Returns window → bars."""
    out: dict[str, DataFrame] = {}
    level = bars_from_ticks(ticks, windows[0], **kwargs)
    out[windows[0]] = level
    for w in windows[1:]:
        level = rollup_bars(level, w, kwargs.get("key_col", "symbol"))
        out[w] = level
    return out
