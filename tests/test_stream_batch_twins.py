"""Streaming ops ≡ their registered batch twins (r9 VERDICT task 6).

q325/q326 give the streaming surface DuckDB oracles by re-expressing the
stream-stream interval join and the stateful running-stats operator as
declarative batch plans. These tests close the loop on the OTHER side:
the actual streaming operators, fed micro-batches, must emit exactly
what the batch-twin shape computes on the same rows — so the chain
streaming op ≡ batch twin ≡ DuckDB oracle is pinned end to end.
"""

from __future__ import annotations

import json

from pyspark.sql import Window
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.queries import QUERIES
from soict20221_bigdata_financialplatform_spark.streaming import ticks as st
from soict20221_bigdata_financialplatform_spark.streaming.stateful import (
    running_symbol_stats,
)
from tests.test_streaming import _write_file


def test_native_session_window_boundary_and_q38_identity(spark, sf_dir):
    """Pin Spark session_window's merge boundary (an event exactly GAP
    after the previous one MERGES; one second past it splits) — the
    convention q329's oracle encodes — and the q38 identity on real
    data: same session set, native end = hand-rolled end + gap."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-02 09:00:00"), (1, "2024-01-02 09:30:00"),
         (1, "2024-01-02 10:00:01")],
        "user_id int, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("tsl"))
    rows = (
        df.groupBy("user_id", F.session_window("tsl", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sw.start")
        .collect()
    )
    assert [r.n for r in rows] == [2, 1]  # exact-gap merged, +1s split

    native = {
        (r.user_id, r.session_start, r.n_events)
        for r in QUERIES["q329_native_session_window"](spark, sf_dir).collect()
    }
    hand = QUERIES["q38_sessionization"](spark, sf_dir).collect()
    assert native == {(r.user_id, r.session_start, r.n_events) for r in hand}
    ends = {
        (r.user_id, r.session_start): r.session_end
        for r in QUERIES["q329_native_session_window"](spark, sf_dir).collect()
    }
    import datetime as dt

    for r in hand:
        assert ends[(r.user_id, r.session_start)] == (
            r.session_end + dt.timedelta(minutes=30)
        )


def test_interval_join_stream_matches_batch_twin(spark, tmp_path):
    """interval_join_streams (inner) over file micro-batches emits the
    SAME match set as the q325-shape batch equi-join-with-residual on
    the same rows — including multi-match fan-out and boundary hits."""
    trades_dir = tmp_path / "trades"; trades_dir.mkdir()
    quotes_dir = tmp_path / "quotes"; quotes_dir.mkdir()
    trades = []
    quotes = []
    for s_i, sym in enumerate(("FPT", "VIC", "HPG")):
        for k in range(8):
            # trades every 7 minutes; quotes every 3 minutes, offset per symbol
            tm = 9 * 60 + s_i + 7 * k
            trades.append({"symbol": sym,
                           "time": f"2024-01-02 {tm // 60:02d}:{tm % 60:02d}:00",
                           "price": 50.0 + k})
        for k in range(16):
            qm = 9 * 60 + 2 * s_i + 3 * k
            quotes.append({"symbol": sym,
                           "quote_time": f"2024-01-02 {qm // 60:02d}:{qm % 60:02d}:00",
                           "bid": 49.0 + k})
    # two micro-batches per side, split mid-list
    _write_file(str(trades_dir), "t1.json", [json.dumps(r) for r in trades[:12]])
    _write_file(str(trades_dir), "t2.json", [json.dumps(r) for r in trades[12:]])
    _write_file(str(quotes_dir), "q1.json", [json.dumps(r) for r in quotes[:24]])
    _write_file(str(quotes_dir), "q2.json", [json.dumps(r) for r in quotes[24:]])
    t_schema = "symbol string, time timestamp, price double"
    q_schema = "symbol string, quote_time timestamp, bid double"
    joined = st.interval_join_streams(
        spark.readStream.schema(t_schema).json(str(trades_dir)),
        spark.readStream.schema(q_schema).json(str(quotes_dir)),
        key="symbol", left_time="time", right_time="quote_time",
        lag="5 minutes",
    )
    q = (joined.writeStream.format("memory").queryName("ssj_twin")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        stream_rows = {
            (r.symbol, str(r.time), str(r.quote_time))
            for r in spark.sql("SELECT * FROM ssj_twin").collect()
        }
    finally:
        q.stop()

    # batch twin: the q325 shape (equi-key + two-sided residual bound)
    tb = spark.createDataFrame(trades).selectExpr(
        "symbol", "CAST(time AS timestamp) AS time", "price"
    )
    qb = spark.createDataFrame(quotes).selectExpr(
        "symbol AS q_symbol", "CAST(quote_time AS timestamp) AS quote_time", "bid"
    )
    cond = (
        (tb["symbol"] == qb["q_symbol"])
        & (qb["quote_time"] >= tb["time"] - F.expr("INTERVAL 5 minutes"))
        & (qb["quote_time"] <= tb["time"])
    )
    batch_rows = {
        (r.symbol, str(r.time), str(r.quote_time))
        for r in tb.join(qb, cond, "inner").collect()
    }
    assert stream_rows == batch_rows
    assert len(batch_rows) > 20  # non-trivial fan-out actually exercised


def test_running_stats_stream_matches_batch_twin(spark, tmp_path):
    """running_symbol_stats fed one micro-batch PER DAY emits, per
    (symbol, batch), exactly the q326-shape snapshot: running high/low,
    last value, cumulative count over day-grain frames."""
    from tests.test_streaming import _msg

    src = tmp_path / "src"; src.mkdir()
    days = [
        ("2024-01-02", [("FPT", "09:30:05", "80.0"), ("FPT", "09:31:00", "82.0"),
                        ("VIC", "09:30:10", "55.0")]),
        ("2024-01-03", [("FPT", "09:30:00", "79.0"), ("VIC", "09:35:00", "56.5"),
                        ("VIC", "09:36:00", "54.0")]),
        ("2024-01-04", [("FPT", "10:00:00", "85.0")]),
    ]
    raw = st.read_tick_stream_json(spark, str(src), max_files_per_trigger=1)
    stats = running_symbol_stats(st.decode_ticks(raw))
    q = (
        stats.writeStream.outputMode("update").format("memory")
        .queryName("running_twin")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        for i, (day, ticks) in enumerate(days):
            _write_file(str(src), f"b{i}.json", [
                _msg(sym, f"{day} {hms}", close) for sym, hms, close in ticks
            ])
            q.processAllAvailable()
        stream_rows = {
            (r.symbol, r.high, r.low, r.last_price, r.n_ticks)
            for r in spark.sql("SELECT * FROM running_twin").collect()
        }
    finally:
        q.stop()

    # batch twin: the q326 shape on the same rows (day agg -> running window)
    rows = [
        (sym, f"{day} {hms}", float(close))
        for day, ticks in days for sym, hms, close in ticks
    ]
    df = spark.createDataFrame(rows, "symbol string, time string, close double")
    day_col = F.date_trunc("day", F.col("time").cast("timestamp")).cast("date")
    b = df.groupBy("symbol", day_col.alias("day")).agg(
        F.max("close").alias("day_high"),
        F.min("close").alias("day_low"),
        F.max_by("close", F.col("time").cast("timestamp")).alias("day_last"),
        F.count(F.lit(1)).cast("long").alias("dn"),
    )
    w = (
        Window.partitionBy("symbol").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    batch_rows = {
        (r.symbol, r.high, r.low, r.last_price, r.n_ticks)
        for r in b.select(
            "symbol",
            F.max("day_high").over(w).alias("high"),
            F.min("day_low").over(w).alias("low"),
            F.col("day_last").alias("last_price"),
            F.sum("dn").over(w).alias("n_ticks"),
        ).collect()
    }
    assert stream_rows == batch_rows
    assert len(batch_rows) == 5  # FPT x3 days + VIC x2 days
