"""Real Kafka source/sink wiring (SURVEY §2.1 S3, §2.2 K3).

The reference consumes ticks with ``readStream.format("kafka")``
(``test.py:29-34``) and produces with a row-looping ``KafkaProducer``
(``pipeline/producer.py:105-133``). This module is the engine's actual
``format("kafka")`` wiring for both directions; the rest of the tick
pipeline (decode → dedup → bars → idempotent sink, ``streaming/ticks.py``)
is source-agnostic, so the Kafka source and the broker-less file/rate
stand-ins share every operator downstream of ``load()``.

Broker-less testing: the OPTION PLUMBING is unit-tested (the exact option
dicts Spark receives), and the wiring functions are exercised up to Spark's
source resolution — correctness of the downstream pipeline is covered by the
file-source twin in ``tests/test_streaming.py``. The ``spark-sql-kafka``
connector jar ships with a cluster Spark distribution, not with this
sandbox's pyspark wheel.

Scale notes: one Kafka partition maps to one Spark input partition —
provision topic partitions ≥ executor cores for parallel ingest.
``maxOffsetsPerTrigger`` bounds micro-batch size (backpressure);
``startingOffsets`` is only honored on the FIRST run — afterwards the
checkpoint's offsets win, which is what makes restarts exactly-once into the
idempotent sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    extra: dict | None = None,
) -> dict[str, str]:
    """The option dict for a Kafka SOURCE (reference ``test.py:29-34``:
    ``kafka.bootstrap.servers`` + ``subscribe``). Exposed as a pure function
    so the plumbing is unit-testable without a broker."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if extra:
        opts.update({k: str(v) for k, v in extra.items()})
    return opts


def kafka_sink_options(
    bootstrap_servers: str, topic: str, extra: dict | None = None
) -> dict[str, str]:
    """The option dict for a Kafka SINK (the producer side the reference does
    with kafka-python row loops, ``producer.py:105-133``)."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}
    if extra:
        opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    **extra: str,
) -> DataFrame:
    """S3: the streaming Kafka source, raw. Returns the standard Kafka frame
    (key/value BINARY + topic/partition/offset/timestamp). Feed ``.select
    ("value")`` into ``ticks.decode_ticks`` — the identical post-decode
    pipeline the file-source stand-in uses."""
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_source_options(
                bootstrap_servers,
                topic,
                starting_offsets,
                max_offsets_per_trigger,
                extra=extra,
            )
        )
        .load()
    )


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    **extra: str,
) -> DataFrame:
    """Batch (bounded) read of a topic slice — the backfill twin of the
    stream: same decode pipeline, one-shot offsets range."""
    opts = kafka_source_options(
        bootstrap_servers, topic, starting_offsets, extra=extra
    )
    opts["endingOffsets"] = ending_offsets
    return spark.read.format("kafka").options(**opts).load()


def write_kafka_stream(
    payload: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    output_mode: str = "append",
    **extra: str,
):
    """K3: streaming Kafka producer sink. ``payload`` must carry ``value``
    (and optionally ``key``) columns — ``api.to_kafka_payload`` builds them
    with real ``to_json`` (the reference shipped Python-repr strings and
    ``ast.literal_eval``-ed them back, producer.py:126). Returns the
    DataStreamWriter, un-started, so callers control the trigger."""
    return (
        payload.writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, topic, extra=extra))
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )


def write_kafka_batch(
    payload: DataFrame, bootstrap_servers: str, topic: str, **extra: str
) -> None:
    """Batch produce of a whole DataFrame to a topic (e.g. replaying a
    day's bars). Distributed: each task holds one producer, no driver loop."""
    (
        payload.write.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, topic, extra=extra))
        .save()
    )


def run_kafka_tick_pipeline(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    out_path: str,
    checkpoint: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    max_offsets_per_trigger: int | None = None,
):
    """The reference's whole streaming job (``test.py``) on the real source:
    Kafka → decode → watermark dedup → OHLC bars → idempotent parquet sink.
    Identical to ``ticks.run_tick_pipeline`` from ``decode_ticks`` on — the
    source is the ONLY difference."""
    from soict20221_bigdata_financialplatform_spark.streaming.ticks import (
        bar_aggregate,
        decode_ticks,
        dedup_ticks,
        write_bars_idempotent,
    )

    raw = read_kafka_stream(
        spark,
        bootstrap_servers,
        topic,
        starting_offsets="earliest",
        max_offsets_per_trigger=max_offsets_per_trigger,
    ).select(F.col("value"))
    ticks = dedup_ticks(decode_ticks(raw), watermark)
    bars = bar_aggregate(ticks, window, watermark=None)
    return write_bars_idempotent(bars, out_path, checkpoint).start()
