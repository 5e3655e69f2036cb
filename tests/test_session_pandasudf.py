"""Streaming session windows + the demo scalar pandas UDF (U1 parity)."""

from __future__ import annotations

from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.functions.normalize import (
    comma_number_pandas_udf,
    parse_comma_number,
)
from soict20221_bigdata_financialplatform_spark.streaming import ticks as st
from tests.test_streaming import _msg, _write_file


def test_pandas_udf_matches_native_expression(spark):
    df = spark.createDataFrame(
        [Row(s="1,234.50 "), Row(s="60,902,000,000"), Row(s="garbage"), Row(s=" 7 ")]
    )
    udf = comma_number_pandas_udf()
    out = df.select(
        udf("s").alias("via_udf"), parse_comma_number("s").alias("via_expr")
    ).collect()
    for r in out:
        assert r.via_udf == r.via_expr  # including the null for garbage


def test_streaming_session_windows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two FPT bursts separated by > 30 min; VIC single burst
    _write_file(str(src), "b1.json", [
        _msg("FPT", "2024-01-02 09:30:00", "80.0"),
        _msg("FPT", "2024-01-02 09:40:00", "81.0"),
        _msg("FPT", "2024-01-02 11:00:00", "82.0"),
        _msg("VIC", "2024-01-02 09:35:00", "55.0"),
        _msg("ZZZ", "2024-01-02 15:00:00", "1.0"),  # watermark pusher
    ])
    raw = st.read_tick_stream_json(spark, str(src))
    sessions = st.session_aggregate(st.decode_ticks(raw), gap="30 minutes")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("tick_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_file(str(src), "b2.json", [_msg("ZZZ", "2024-01-02 18:00:00", "1.0")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM tick_sessions").collect()
    finally:
        q.stop()

    fpt = sorted(
        [r for r in rows if r.symbol == "FPT"], key=lambda r: r.session_start
    )
    assert len(fpt) == 2  # the 80-min gap split the bursts
    assert fpt[0].n_ticks == 2 and fpt[0].low == 80.0 and fpt[0].high == 81.0
    assert str(fpt[0].session_start) == "2024-01-02 09:30:00"
    assert str(fpt[0].session_end) == "2024-01-02 10:10:00"  # last event + gap
    assert fpt[1].n_ticks == 1 and fpt[1].high == 82.0
