"""Streaming tick path (SURVEY §2.10, §3.3) — the reference's Kafka→foreach
job re-expressed as one Structured Streaming pipeline with event-time
semantics the reference lacked:

    source → from_json decode (F2) → struct flatten (P9) → normalize →
    watermark → dedup → tumbling-window OHLC bars → foreachBatch idempotent
    parquet upsert

The reference opened a Cassandra session PER ROW inside ``writeStream.foreach``
(``test.py:42-56``, ``warehouse.py:148-162``) and had no watermark, no
windowing, no dedup. Here the sink is ``foreachBatch`` (one write per
micro-batch), late data is bounded by a watermark, at-least-once delivery is
deduplicated, and the upsert is idempotent under micro-batch replay (dynamic
partition overwrite keyed on the bar window's day).

Scale notes: state size = one entry per open (symbol × window) plus the dedup
index inside the watermark — both bounded. The bar agg is a streaming partial
agg (update-side combine) shuffled on (symbol, window), the same key the sink
partitions by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Kafka tick message schema (reference ``test.py:13-27`` / warehouse.py:119-133):
# numerics arrive as formatted STRINGS because the scraper emits text.
TICK_MSG_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("open", T.StringType()),
        T.StructField("high", T.StringType()),
        T.StructField("low", T.StringType()),
        T.StructField("close", T.StringType()),
        T.StructField("volume", T.StringType()),
        T.StructField("previous_close", T.StringType()),
        T.StructField("ref", T.StringType()),
        T.StructField("ceil", T.StringType()),
        T.StructField("floor", T.StringType()),
    ]
)


def read_tick_stream_json(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stand-in for the Kafka topic (S3): JSON-lines files shaped
    like the producer's messages, read as a raw ``value`` string column so the
    decode path is identical to Kafka's ``value`` bytes."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).withColumnRenamed("value", "value")


def synthetic_tick_stream(
    spark: SparkSession,
    symbols: tuple[str, ...] = ("FPT", "VIC", "HPG"),
    rows_per_second: int = 100,
) -> DataFrame:
    """S3's self-contained substitute (SURVEY §2.1): a rate source shaped to
    the producer's message schema — deterministic prices from the tick index,
    symbols assigned round-robin. Useful for demos and throughput tests
    without Kafka; swap for ``readStream.format("kafka")`` in production."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    sym = F.element_at(
        F.array(*[F.lit(s) for s in symbols]),
        (F.col("value") % len(symbols) + 1).cast("int"),
    )
    px = F.round(50.0 + F.pmod(F.col("value"), F.lit(1000)) / 100.0, 2).cast("string")
    return rate.select(
        sym.alias("symbol"),
        F.col("timestamp").alias("time"),
        px.alias("open"),
        px.alias("high"),
        px.alias("low"),
        px.alias("close"),
        (F.col("value") * 100).cast("string").alias("volume"),
        px.alias("previous_close"),
        px.alias("ref"),
        px.alias("ceil"),
        px.alias("floor"),
    )


def enrich_ticks(ticks: DataFrame, dim: DataFrame, on: str = "symbol") -> DataFrame:
    """Stream-static enrichment: join the tick stream against a (small)
    dimension — Spark broadcasts the static side per micro-batch, so the
    stream never shuffles. The streaming analog of the serving layer's
    symbol-metadata join."""
    return ticks.join(F.broadcast(dim), on=on, how="left")


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "symbol",
    left_time: str = "time",
    right_time: str = "quote_time",
    lag: str = "5 minutes",
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: each left event matches right
    events with the same key whose timestamp lies in
    ``[left_time - lag, left_time]`` — the trade↔quote / order↔fill
    correlation shape (the streaming twin of the batch as-of join, except a
    stream can't pick ONE latest row, so it emits all in-interval matches).

    State-bound by construction: BOTH sides carry a watermark and the join
    condition bounds event time in BOTH directions, so Spark evicts buffered
    rows once the watermark passes the interval — without the time-range
    condition the state grows forever, and Spark rejects outer variants
    outright. Keys hash-partition the exchange; per-key state is O(events
    within the watermark horizon).

    Both time columns must be distinct names (rename before calling);
    ``how`` may be 'inner' or 'leftOuter' (left rows with no in-interval
    match emit nulls once the watermark closes the interval)."""
    if left_time == right_time:
        raise ValueError("rename the time columns apart before joining")
    lw = left.withWatermark(left_time, left_watermark)
    rw = right.withWatermark(right_time, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_time) >= F.col(left_time) - F.expr(f"INTERVAL {lag}"))
        & (F.col(right_time) <= F.col(left_time))
    )
    return lw.join(rw, cond, how).drop(rw[key])


def decode_ticks(raw: DataFrame) -> DataFrame:
    """F2 + P9 + normalization: ``from_json`` decode of the message value,
    flatten, comma-strip numeric casts (native expressions — the reference's
    scalar UDFs eliminated)."""
    from soict20221_bigdata_financialplatform_spark.functions.normalize import parse_comma_number

    parsed = (
        raw.select(
            F.from_json(F.col("value").cast("string"), TICK_MSG_SCHEMA).alias("t")
        )
        # malformed messages decode to a null struct; dropping them here keeps
        # null-keyed garbage out of the dedup index and the bar aggregation
        .where(F.col("t").isNotNull() & F.col("t.symbol").isNotNull() & F.col("t.time").isNotNull())
        .select("t.*")
    )
    return parsed.select(
        "symbol",
        "time",
        parse_comma_number("open").alias("open"),
        parse_comma_number("high").alias("high"),
        parse_comma_number("low").alias("low"),
        parse_comma_number("close").alias("close"),
        parse_comma_number("volume", "long").alias("volume"),
        parse_comma_number("previous_close").alias("previous_close"),
        parse_comma_number("ref").alias("ref"),
        parse_comma_number("ceil").alias("ceil"),
        parse_comma_number("floor").alias("floor"),
    )


def dedup_ticks(ticks: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """At-least-once → effectively-once: drop (symbol, time) duplicates within
    the watermark horizon (bounded state)."""
    return ticks.withWatermark("time", watermark).dropDuplicates(["symbol", "time"])


def dedup_ticks_by_id(
    ticks: DataFrame, id_cols: list[str], watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup on a NON-event-time key (e.g. a producer message id):
    ``dropDuplicatesWithinWatermark`` keeps state only for the watermark
    horizon even though the dedup key carries no timestamp — the right form
    when replays arrive with a fresh event time (plain ``dropDuplicates`` on
    such a key would grow state forever; keying on (id, time) would miss the
    replay). State is bounded by horizon × key arrival rate at any scale."""
    return ticks.withWatermark("time", watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def bar_aggregate(
    ticks: DataFrame,
    window: str = "1 minute",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling-window OHLC bars per symbol (engine-added per SURVEY §2.10:
    the reference stores raw ticks and recomputes client-side).

    open/close via min_by/max_by on event time; volume is the max cumulative
    counter in the window (the producer emits cumulative day volume).
    Pass ``watermark=None`` when the input already carries one (re-defining a
    watermark downstream of another stateful operator is disallowed)."""
    w = ticks.withWatermark("time", watermark) if watermark else ticks
    return (
        w.groupBy(F.window("time", window).alias("w"), F.col("symbol"))
        .agg(
            F.min_by("close", "time").alias("open"),
            F.max("close").alias("high"),
            F.min("close").alias("low"),
            F.max_by("close", "time").alias("close"),
            F.max("volume").alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            F.col("w.end").alias("bar_end"),
            "symbol",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_ticks",
        )
    )


def make_bar_batch_writer(out_path: str):
    """The foreachBatch body, exposed for direct (replay) testing.

    Idempotence: partitions are (bar_date, __batch) and written with DYNAMIC
    partition overwrite — a replayed micro-batch (same batch_id after a
    checkpoint restart) rewrites exactly its own partition with the same
    rows, while partitions written by other batches are untouched.
    (Overwriting by bar_date alone would clobber sibling batches' bars for
    the same day.) A periodic compaction job can fold __batch partitions
    into date-only layout for read efficiency at scale."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch_df.withColumn("bar_date", F.to_date("bar_start"))
            .withColumn("__batch", F.lit(batch_id))
            .repartition("symbol")
            .sortWithinPartitions("symbol", "bar_start")
            .write.mode("overwrite")
            .partitionBy("bar_date", "__batch")
            .parquet(out_path)
        )

    return _write


def session_aggregate(
    ticks: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Event-time SESSION windows per symbol (engine-added per SURVEY §2.10):
    a session closes after ``gap`` of inactivity — the streaming twin of the
    batch lag/cumsum sessionization (queries.q38). State per open session,
    evicted once the watermark passes session end + gap."""
    w = ticks.withWatermark("time", watermark) if watermark else ticks
    return (
        w.groupBy(F.session_window("time", gap).alias("w"), F.col("symbol"))
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.min("close").alias("low"),
            F.max("close").alias("high"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "symbol",
            "n_ticks",
            "low",
            "high",
        )
    )


def write_bars_idempotent(bars: DataFrame, out_path: str, checkpoint: str):
    """foreachBatch sink (K1/K2 replacement — the reference opened a DB
    session per ROW; this writes once per micro-batch)."""
    return (
        bars.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(make_bar_batch_writer(out_path))
    )


def compact_bars(spark: SparkSession, bars_path: str, out_path: str) -> None:
    """Periodic compaction: fold the sink's (bar_date, __batch) micro-batch
    partitions into a date-only, symbol-clustered layout for read efficiency
    (many tiny per-batch files → one sorted file set per day). Runs as a
    batch job against closed days; the streaming sink keeps appending new
    __batch partitions untouched."""
    bars = spark.read.parquet(bars_path).drop("__batch")
    (
        bars.repartition("bar_date")
        .sortWithinPartitions("symbol", "bar_start")
        .write.mode("overwrite")
        .partitionBy("bar_date")
        .parquet(out_path)
    )


def run_tick_pipeline(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
):
    """Full pipeline, returns the started StreamingQuery."""
    raw = read_tick_stream_json(spark, in_path, max_files_per_trigger)
    ticks = dedup_ticks(decode_ticks(raw), watermark)
    bars = bar_aggregate(ticks, window, watermark=None)  # watermark set above
    return write_bars_idempotent(bars, out_path, checkpoint).start()
