"""Streaming tick path (SURVEY §5.4): file-source micro-batches shaped like
the Kafka tick schema — bar aggregation, watermark late-row handling, dedup,
and foreachBatch idempotence under replay."""

from __future__ import annotations

import json
import os

import pytest

from soict20221_bigdata_financialplatform_spark.streaming import ticks as st


def _msg(symbol, time, close, volume="1,000"):
    return json.dumps(
        {
            "symbol": symbol,
            "time": time,
            "open": close,
            "high": close,
            "low": close,
            "close": close,
            "volume": volume,
            "previous_close": close,
            "ref": close,
            "ceil": close,
            "floor": close,
        }
    )


def _write_file(d, name, lines):
    p = os.path.join(d, name)
    with open(p + ".tmp", "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(p + ".tmp", p)  # atomic: file source must not see partial files


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    return str(src), str(out), str(ckpt)


def test_bar_aggregation_and_dedup(spark, dirs):
    src, out, ckpt = dirs
    lines = [
        _msg("FPT", "2024-01-02 09:30:05", "80.0", "1,000"),
        _msg("FPT", "2024-01-02 09:30:25", "80.5", "2,000"),
        _msg("FPT", "2024-01-02 09:30:45", "80.2", "3,000"),
        _msg("FPT", "2024-01-02 09:30:45", "80.2", "3,000"),  # duplicate tick
        _msg("FPT", "2024-01-02 09:31:10", "81.0", "4,000"),
        _msg("VIC", "2024-01-02 09:30:10", "55.0", "500"),
        # watermark pusher: advances event-time clock well past 09:31+10min
        _msg("ZZZ", "2024-01-02 10:00:00", "1.0", "1"),
    ]
    _write_file(src, "batch1.json", lines)
    q = st.run_tick_pipeline(
        spark, src, out, ckpt, window="1 minute", watermark="10 minutes"
    )
    try:
        q.processAllAvailable()
        # one more empty-ish batch so finalized windows flush in append mode
        _write_file(src, "batch2.json", [_msg("ZZZ", "2024-01-02 10:30:00", "1.0", "1")])
        q.processAllAvailable()
    finally:
        q.stop()

    bars = spark.read.parquet(out)
    rows = {(r.symbol, str(r.bar_start)): r for r in bars.collect()}
    fpt = rows[("FPT", "2024-01-02 09:30:00")]
    assert fpt.open == 80.0 and fpt.close == 80.2
    assert fpt.high == 80.5 and fpt.low == 80.0
    assert fpt.n_ticks == 3  # duplicate dropped by watermark dedup
    assert fpt.volume == 3000
    assert ("VIC", "2024-01-02 09:30:00") in rows


def test_late_row_beyond_watermark_dropped(spark, dirs):
    src, out, ckpt = dirs
    _write_file(src, "b1.json", [
        _msg("FPT", "2024-01-02 09:30:05", "80.0"),
        _msg("FPT", "2024-01-02 10:00:00", "81.0"),  # watermark -> 09:50
    ])
    q = st.run_tick_pipeline(
        spark, src, out, ckpt, window="1 minute", watermark="10 minutes",
        max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
        # 09:30 window closed (< 09:50 watermark); this row is too late
        _write_file(src, "b2.json", [_msg("FPT", "2024-01-02 09:30:59", "99.0")])
        q.processAllAvailable()
        _write_file(src, "b3.json", [_msg("FPT", "2024-01-02 10:30:00", "82.0")])
        q.processAllAvailable()
    finally:
        q.stop()

    bars = spark.read.parquet(out)
    fpt930 = [r for r in bars.collect()
              if r.symbol == "FPT" and str(r.bar_start) == "2024-01-02 09:30:00"]
    assert len(fpt930) == 1
    assert fpt930[0].n_ticks == 1  # late 09:30:59 tick NOT merged
    assert fpt930[0].close == 80.0


def test_foreachbatch_sink_idempotent_on_replay(spark, dirs):
    """Replaying the same micro-batch must not duplicate rows (dynamic
    partition overwrite keyed on bar_date)."""
    src, out, ckpt = dirs
    from pyspark.sql import Row
    import datetime as dt

    batch = spark.createDataFrame([
        Row(bar_start=dt.datetime(2024, 1, 2, 9, 30), bar_end=dt.datetime(2024, 1, 2, 9, 31),
            symbol="FPT", open=80.0, high=80.5, low=80.0, close=80.2,
            volume=3000, n_ticks=3),
    ])
    writer = st.make_bar_batch_writer(out)
    writer(batch, 0)
    writer(batch, 0)  # replay of the same micro-batch
    assert spark.read.parquet(out).count() == 1


def test_corrupt_messages_dropped(spark, dirs):
    src, out, ckpt = dirs
    lines = [
        _msg("FPT", "2024-01-02 09:30:05", "80.0"),
        "{ not json at all",
        '{"symbol": null, "time": "2024-01-02 09:30:06"}',
        "",
        _msg("ZZZ", "2024-01-02 10:00:00", "1.0"),
    ]
    _write_file(src, "b1.json", [l for l in lines if l])
    q = st.run_tick_pipeline(spark, src, out, ckpt)
    try:
        q.processAllAvailable()
        _write_file(src, "b2.json", [_msg("ZZZ", "2024-01-02 10:30:00", "1.0")])
        q.processAllAvailable()
    finally:
        q.stop()
    bars = spark.read.parquet(out)
    # only the two valid symbols produced bars; no null-key bar rows
    assert {r.symbol for r in bars.collect()} <= {"FPT", "ZZZ"}
    assert bars.where("symbol IS NULL").count() == 0


def test_compact_bars(spark, dirs, tmp_path):
    src, out, ckpt = dirs
    _write_file(src, "b1.json", [
        _msg("FPT", "2024-01-02 09:30:05", "80.0"),
        _msg("ZZZ", "2024-01-02 10:00:00", "1.0"),
    ])
    q = st.run_tick_pipeline(spark, src, out, ckpt)
    try:
        q.processAllAvailable()
        _write_file(src, "b2.json", [_msg("ZZZ", "2024-01-02 10:30:00", "1.0")])
        q.processAllAvailable()
        _write_file(src, "b3.json", [_msg("ZZZ", "2024-01-02 11:00:00", "1.0")])
        q.processAllAvailable()
    finally:
        q.stop()
    compacted = str(tmp_path / "compacted")
    st.compact_bars(spark, out, compacted)
    a = spark.read.parquet(out).drop("__batch")
    b = spark.read.parquet(compacted)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))
    assert "__batch" not in b.columns


def test_restart_from_checkpoint_exactly_once(spark, dirs):
    """Stop the query, restart from the same checkpoint, feed more data:
    no duplicated bars, no lost bars (checkpoint + idempotent sink)."""
    src, out, ckpt = dirs
    _write_file(src, "b1.json", [
        _msg("FPT", "2024-01-02 09:30:05", "80.0"),
        _msg("ZZZ", "2024-01-02 10:00:00", "1.0"),
    ])
    q1 = st.run_tick_pipeline(spark, src, out, ckpt)
    q1.processAllAvailable()
    q1.stop()

    # restart with the SAME checkpoint; new data closes earlier windows
    _write_file(src, "b2.json", [_msg("ZZZ", "2024-01-02 10:30:00", "1.0")])
    q2 = st.run_tick_pipeline(spark, src, out, ckpt)
    try:
        q2.processAllAvailable()
        _write_file(src, "b3.json", [_msg("ZZZ", "2024-01-02 11:00:00", "1.0")])
        q2.processAllAvailable()
    finally:
        q2.stop()

    bars = spark.read.parquet(out).collect()
    keys = [(r.symbol, str(r.bar_start)) for r in bars]
    assert len(keys) == len(set(keys))  # exactly-once: no duplicate bars
    assert ("FPT", "2024-01-02 09:30:00") in keys  # nothing lost across restart
    assert ("ZZZ", "2024-01-02 10:00:00") in keys


def test_stream_stream_interval_join(spark, tmp_path):
    trades_dir = tmp_path / "trades"; trades_dir.mkdir()
    quotes_dir = tmp_path / "quotes"; quotes_dir.mkdir()
    _write_file(str(trades_dir), "t1.json", [
        json.dumps({"symbol": "FPT", "time": "2024-01-02 09:30:00", "price": 80.0}),
        json.dumps({"symbol": "FPT", "time": "2024-01-02 09:40:00", "price": 81.0}),
        json.dumps({"symbol": "VIC", "time": "2024-01-02 09:30:00", "price": 55.0}),
    ])
    _write_file(str(quotes_dir), "q1.json", [
        # in [09:25, 09:30] for the first FPT trade
        json.dumps({"symbol": "FPT", "quote_time": "2024-01-02 09:28:00", "bid": 79.9}),
        # in-interval ONLY for the 09:40 trade
        json.dumps({"symbol": "FPT", "quote_time": "2024-01-02 09:39:00", "bid": 80.9}),
        # right symbol, too early for any interval
        json.dumps({"symbol": "VIC", "quote_time": "2024-01-02 09:10:00", "bid": 54.0}),
        # wrong symbol for FPT trades
        json.dumps({"symbol": "HPG", "quote_time": "2024-01-02 09:29:00", "bid": 30.0}),
    ])
    t_schema = "symbol string, time timestamp, price double"
    q_schema = "symbol string, quote_time timestamp, bid double"
    trades = spark.readStream.schema(t_schema).json(str(trades_dir))
    quotes = spark.readStream.schema(q_schema).json(str(quotes_dir))
    joined = st.interval_join_streams(
        trades, quotes, key="symbol", left_time="time",
        right_time="quote_time", lag="5 minutes",
    )
    q = (joined.writeStream.format("memory").queryName("ssj")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = {(r.symbol, str(r.time), str(r.quote_time))
                for r in spark.sql("SELECT * FROM ssj").collect()}
    finally:
        q.stop()
    assert rows == {
        ("FPT", "2024-01-02 09:30:00", "2024-01-02 09:28:00"),
        ("FPT", "2024-01-02 09:40:00", "2024-01-02 09:39:00"),
    }


def test_stream_stream_join_rejects_same_time_name(spark, tmp_path):
    d = tmp_path / "s"; d.mkdir()
    s = spark.readStream.schema("symbol string, time timestamp").json(str(d))
    with pytest.raises(ValueError):
        st.interval_join_streams(s, s, left_time="time", right_time="time")


def test_dedup_by_message_id_within_watermark(spark, dirs):
    """dropDuplicatesWithinWatermark on a producer message id: a replay
    arriving later WITH A DIFFERENT EVENT TIME is still dropped (keying on
    (id, time) would miss it; plain dropDuplicates would never free state)."""
    src, out, ckpt = dirs

    def _m(mid, time, close):
        return json.dumps({"msg_id": mid, "symbol": "FPT", "time": time,
                           "close": close})

    schema = ("msg_id LONG, symbol STRING, time TIMESTAMP, close DOUBLE")
    _write_file(src, "b1.json", [
        _m(1, "2024-01-02 09:30:00", 80.0),
        _m(1, "2024-01-02 09:30:07", 80.0),   # replay, fresh event time
        _m(2, "2024-01-02 09:30:10", 80.5),
    ])
    stream = spark.readStream.schema(schema).json(src)
    deduped = st.dedup_ticks_by_id(stream, ["msg_id"], watermark="10 minutes")
    q = (deduped.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # second batch: another replay of id 1, plus a fresh id
        _write_file(src, "b2.json", [
            _m(1, "2024-01-02 09:31:00", 80.0),
            _m(3, "2024-01-02 09:31:05", 81.0),
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted((r.msg_id, float(r.close)) for r in spark.read.parquet(out).collect())
    assert got == [(1, 80.0), (2, 80.5), (3, 81.0)]
