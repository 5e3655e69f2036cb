"""Kafka wiring (S3/K3) — broker-less tests.

What CAN be verified without a broker or the spark-sql-kafka jar:
- the exact option dicts the wiring hands Spark (the reference contract:
  ``kafka.bootstrap.servers`` + ``subscribe``, test.py:29-34);
- that the source functions reach Spark's data-source resolution asking for
  the REAL ``kafka`` format (the sandbox wheel lacks the connector, so
  resolution either succeeds on a cluster or fails with the canonical
  "Failed to find data source: kafka" — anything else is a wiring bug).
The pipeline downstream of ``load()`` is the file-source twin's, covered by
test_streaming.py.
"""

from __future__ import annotations

import pytest

from soict20221_bigdata_financialplatform_spark.streaming import kafka as kf


def test_source_options_match_reference_contract():
    opts = kf.kafka_source_options(
        "broker1:9092,broker2:9092",
        "topic_name2",
        starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
        extra={"kafka.security.protocol": "SASL_SSL"},
    )
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "topic_name2"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["failOnDataLoss"] == "true"
    assert opts["kafka.security.protocol"] == "SASL_SSL"


def test_sink_options_shape():
    opts = kf.kafka_sink_options("b:9092", "bars_out")
    assert opts == {"kafka.bootstrap.servers": "b:9092", "topic": "bars_out"}


def _expect_kafka_resolution(fn):
    """Run a wiring fn: on a connector-equipped cluster it returns a
    DataFrame; on the sandbox wheel it must fail looking for the KAFKA
    data source specifically (proving format+options reached Spark)."""
    try:
        df = fn()
    except Exception as e:  # noqa: BLE001 — asserting on the message
        msg = str(e).lower()
        assert "kafka" in msg and ("failed to find" in msg or "data source" in msg)
        return None
    return df


def test_stream_source_resolves_kafka_format(spark):
    df = _expect_kafka_resolution(
        lambda: kf.read_kafka_stream(spark, "localhost:9092", "topic_name2")
    )
    if df is not None:  # connector present: the standard Kafka columns exist
        assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)


def test_batch_source_resolves_kafka_format(spark):
    df = _expect_kafka_resolution(
        lambda: kf.read_kafka_batch(spark, "localhost:9092", "topic_name2")
    )
    if df is not None:
        assert {"key", "value"} <= set(df.columns)


def test_sink_writer_configured_unstarted(spark):
    """The streaming sink builder: correct format and options, NOT started
    (starting needs the connector + a broker)."""
    from soict20221_bigdata_financialplatform_spark.api import to_kafka_payload
    from soict20221_bigdata_financialplatform_spark.streaming.ticks import (
        synthetic_tick_stream,
    )

    payload = to_kafka_payload(synthetic_tick_stream(spark), key_col="symbol")
    assert payload.isStreaming
    assert payload.columns == ["key", "value"]
    writer = kf.write_kafka_stream(
        payload, "localhost:9092", "bars_out", checkpoint="/tmp/ckpt-unused"
    )
    # un-started builder: no active query was created
    assert not spark.streams.active
    assert writer is not None


def test_kafka_pipeline_shares_decode_path(spark):
    """The Kafka pipeline's post-load stages are the SAME functions the
    file-source pipeline uses — decode a producer-shaped message through
    ticks.decode_ticks exactly as run_kafka_tick_pipeline would."""
    from soict20221_bigdata_financialplatform_spark.streaming.ticks import decode_ticks

    raw = spark.createDataFrame(
        [
            (
                '{"symbol":"FPT","time":"2024-01-05T09:15:00",'
                '"open":"85.5","high":"86.0","low":"85.0","close":"85.7",'
                '"volume":"1,200,300","previous_close":"85.1","ref":"85.1",'
                '"ceil":"91.0","floor":"79.2"}',
            )
        ],
        "value string",
    )
    out = decode_ticks(raw).collect()
    assert len(out) == 1
    r = out[0]
    assert r.symbol == "FPT" and r.volume == 1200300 and r.close == 85.7


def test_text_and_jsonl_and_orc_roundtrip(spark, tmp_path):
    """New batch formats: line-text with provenance, JSON-lines with corrupt
    capture, ORC round-trip."""
    from pyspark.sql import types as T

    from soict20221_bigdata_financialplatform_spark.sources import readers as rd

    p = tmp_path / "corpus.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    lines = rd.read_text_corpus(spark, str(p))
    got = lines.collect()
    assert sorted(r["line"] for r in got) == ["alpha", "beta", "gamma"]
    assert all(r["source_file"].endswith("corpus.txt") for r in got)

    j = tmp_path / "docs.jsonl"
    j.write_text('{"doc_id": 1, "text": "ok"}\nnot-json\n{"doc_id": 2, "text": "fine"}\n')
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    docs = rd.read_jsonl_documents(spark, str(j), schema).cache()
    assert docs.where("_corrupt_record IS NULL").count() == 2
    assert docs.where("_corrupt_record IS NOT NULL").count() == 1

    o = str(tmp_path / "orc_out")
    src = spark.range(100).selectExpr("id", "id * 2 AS v")
    rd.write_orc(src, o)
    back = rd.read_orc(spark, o)
    assert back.count() == 100
    assert {r["v"] for r in back.collect()} == {2 * i for i in range(100)}


def test_register_views_sql_surface(spark, sf_dir):
    """spark.sql over the registered views: a join + agg round-trips."""
    from soict20221_bigdata_financialplatform_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT r.r_name, count(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    ).collect()
    assert len(out) == 5
    assert sum(r["n_nations"] for r in out) == 25


@pytest.mark.skipif(
    "KAFKA_BOOTSTRAP" not in __import__("os").environ,
    reason="set KAFKA_BOOTSTRAP=host:port (and provide the spark-sql-kafka "
    "connector, e.g. PYSPARK_SUBMIT_ARGS='--packages org.apache.spark:"
    "spark-sql-kafka-0-10_2.13:<spark-version>' as reference test.py:10 "
    "does) to run the real-broker integration test",
)
def test_real_broker_roundtrip_end_to_end(spark, tmp_path):
    """Env-gated integration test mirroring reference test.py end to end on
    a REAL broker: batch-produce producer-shaped JSON ticks -> batch read
    them back and decode -> run the streaming pipeline (Kafka source ->
    decode -> watermark dedup -> OHLC bars -> idempotent parquet sink) and
    assert the closed window's bars landed. Intentionally FAILS (not skips)
    if KAFKA_BOOTSTRAP is set but the connector/broker is unusable: opting
    in asserts the environment is complete."""
    import json
    import os
    import time as _time
    import uuid

    from soict20221_bigdata_financialplatform_spark.streaming.ticks import (
        decode_ticks,
    )

    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    topic = f"spark_finplat_it_{uuid.uuid4().hex[:8]}"

    def tick(sym, hhmm, px, vol):
        return json.dumps({
            "symbol": sym, "time": f"2024-01-05T{hhmm}:00",
            "open": f"{px}", "high": f"{px + 0.5}", "low": f"{px - 0.5}",
            "close": f"{px + 0.1}", "volume": f"{vol:,}",
            "previous_close": f"{px}", "ref": f"{px}",
            "ceil": f"{px + 5}", "floor": f"{px - 5}",
        })

    wave1 = [tick("FPT", "09:15", 85.0, 1200300), tick("FPT", "09:15", 85.0, 1200300),
             tick("VIC", "09:15", 44.0, 900100), tick("FPT", "09:16", 86.0, 1300000)]
    kf.write_kafka_batch(
        spark.createDataFrame([(m,) for m in wave1], "value string"),
        bootstrap, topic,
    )

    # batch read-back + shared decode path
    back = kf.read_kafka_batch(spark, bootstrap, topic)
    decoded = decode_ticks(back.select("value"))
    rows = decoded.collect()
    assert len(rows) == len(wave1)
    assert {r.symbol for r in rows} == {"FPT", "VIC"}
    assert next(r for r in rows if r.symbol == "VIC").volume == 900100

    # streaming pipeline on the same topic; wave 2 (20 min later) advances
    # the watermark past wave 1's windows so their bars emit (append mode)
    out = str(tmp_path / "bars")
    ckpt = str(tmp_path / "ckpt")
    q = kf.run_kafka_tick_pipeline(
        spark, bootstrap, topic, out, ckpt,
        window="1 minute", watermark="10 minutes",
    )
    try:
        deadline = _time.time() + 90
        while _time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            _time.sleep(0.5)
        wave2 = [tick("FPT", "09:40", 87.0, 1400000)]
        kf.write_kafka_batch(
            spark.createDataFrame([(m,) for m in wave2], "value string"),
            bootstrap, topic,
        )
        bars = None
        while _time.time() < deadline:
            try:
                got = spark.read.parquet(out).collect()
            except Exception:
                got = []
            if got:
                bars = got
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    assert bars, "no bars emitted within the deadline"
    by_key = {(r.symbol, str(r.bar_start)): r for r in bars}
    fpt915 = by_key[("FPT", "2024-01-05 09:15:00")]
    assert fpt915.n_ticks == 1  # watermark dedup collapsed the duplicate
    assert fpt915.close == 85.1
