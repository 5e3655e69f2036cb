"""Serving-layer facade — the reference's four REST endpoints (``API.py:28-75``)
as library functions over symbol-partitioned parquet, plus the batch backfill
pipeline (``to_db.py:40-55``) and the Kafka-sink inverse (K3).

Each endpoint is a parameterized lazy plan: partition pruning on ``symbol``
(the table is written ``partitionBy("symbol")``) + row-group pruning on the
clustered ``time`` ordering reproduce Cassandra's
``PRIMARY KEY (SYMBOL, TIME)`` read path, with Catalyst doing the pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.functions.indicators import with_indicators
from soict20221_bigdata_financialplatform_spark.functions.normalize import normalize_bars


# ---------------------------------------------------------------------------
# Endpoints (reference API.py; semantics per SURVEY §2.11 — the reference's
# scrambled .format() args fixed, intended behavior implemented)
# ---------------------------------------------------------------------------


def olhc(bars: DataFrame, symbol: str, n_days: int) -> DataFrame:
    """``/OLHC/<code>/<n>``: last n days of daily bars for one symbol,
    newest first (reference API.py:28-37)."""
    return (
        bars.where(F.col("symbol") == symbol)
        .orderBy(F.col("date").desc())
        .limit(n_days)
    )


def realtime(ticks: DataFrame, symbol: str) -> DataFrame:
    """``/realtime/<code>``: newest tick for one symbol, LIMIT 1
    (reference API.py:40-50)."""
    return (
        ticks.where(F.col("symbol") == symbol)
        .orderBy(F.col("time").desc())
        .limit(1)
    )


def news_latest(news: DataFrame, n: int = 6) -> DataFrame:
    """``/news``: latest n headlines, deduped by title — the upsert-by-title
    semantics of PRIMARY KEY (TITLE, TIME) (reference API.py:52-62,
    warehouse.py:93-100). Deterministic survivor: newest time per title."""
    from pyspark.sql import Window

    w = Window.partitionBy("title").orderBy(F.col("time").desc())
    return (
        news.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy(F.col("time").desc())
        .limit(n)
    )


def info(bars: DataFrame, symbol: str, limit: int = 2000) -> DataFrame:
    """``/info/<code>``: symbol history newest-first, LIMIT 2000
    (reference API.py:64-75)."""
    return (
        bars.where(F.col("symbol") == symbol)
        .orderBy(F.col("date").desc())
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# Batch backfill (reference to_db.py:40-55) + storage layout
# ---------------------------------------------------------------------------


def backfill(
    raw_bars: DataFrame,
    out_path: str,
    ema_n: int = 25,
    rsi_n: int = 14,
    sma_n: int = 20,
) -> None:
    """normalize → indicators → symbol-partitioned parquet.

    Replaces the reference's collect()+per-row-INSERT loop (to_db.py:51-55)
    with one distributed write; rows stay in executors end to end. Sorted
    within partitions by date so time-slice reads prune row groups.
    """
    bars = normalize_bars(raw_bars)
    dp = raw_bars.sparkSession.sparkContext.defaultParallelism
    enriched = with_indicators(
        bars, key_cols=("symbol",), order_col="date", value_col="close",
        ema_n=ema_n, rsi_n=rsi_n, sma_n=sma_n,
        ema_partitions=max(2, dp // 4),
    ).na.fill(0.0, ["change_abs", "change_pct"])
    (
        enriched.repartition("symbol")
        .sortWithinPartitions("symbol", "date")
        .write.mode("overwrite")
        .partitionBy("symbol")
        .parquet(out_path)
    )


def load_bars(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# K3 inverse: DataFrame → JSON messages (the Kafka producer sink, done right:
# real JSON via to_json, not Python-repr strings decoded by ast.literal_eval)
# ---------------------------------------------------------------------------


def to_kafka_payload(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """(key, value) string columns ready for ``.write.format("kafka")``
    (reference producer.py:105-133 re-expressed; SURVEY §2.2 K3)."""
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    if key_col is not None:
        return df.select(F.col(key_col).cast("string").alias("key"), value)
    return df.select(value)
