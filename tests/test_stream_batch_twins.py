"""Streaming ops ≡ their registered batch twins (r9 VERDICT task 6,
completed to all seven twins per r10 VERDICT task 4).

q325-q331 give the streaming surface DuckDB oracles by re-expressing the
stream-stream interval join, the stateful running-stats operator, the
watermark drop policy, bar completeness, native sessions, join-state
sizing and the dedup-watermark catch rate as declarative batch plans.
These tests close the loop on the OTHER side: the actual streaming
operators, fed micro-batches, must emit exactly what the batch-twin
shape computes / predicts on the same rows — so the chain
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

def test_watermark_drop_matches_q327_prediction(spark, tmp_path):
    """q327 is the batch-side watermark-sizing audit: with a 1-minute
    delay, rows arriving with event time behind (running max − 1 min)
    are dropped. Feed a windowed streaming aggregation ONE FILE PER
    MICRO-BATCH (arrival order = batch order, so the stream's global
    watermark IS q327's running max − delay) and assert the surviving
    tick count equals n_rows − the q327-shape drop_1m prediction on
    the same arrival sequence. Late rows sit far from window/watermark
    boundaries so the prediction is unambiguous."""
    src = tmp_path / "src"; src.mkdir()
    out = tmp_path / "out"; ckpt = tmp_path / "ckpt"
    # (arrival order, event time): batch 2 is 8 minutes behind the max
    # seen (09:40) => behind the 1-minute watermark => dropped; batch 4
    # is only late vs 09:41 by 30s => inside the delay => kept.
    arrivals = [
        "2024-01-02 09:30:00",
        "2024-01-02 09:40:00",
        "2024-01-02 09:32:00",   # late by 8 min -> dropped
        "2024-01-02 09:41:00",
        "2024-01-02 09:40:30",   # late by 30 s  -> kept
        "2024-01-02 10:30:00",   # sentinel: closes every earlier window
    ]
    schema = "symbol string, time timestamp, close double"
    stream = spark.readStream.schema(schema).json(str(src))
    bars = (
        stream.withWatermark("time", "1 minute")
        .groupBy(F.window("time", "1 minute"), "symbol")
        .agg(F.count(F.lit(1)).alias("n_ticks"))
    )
    q = (bars.writeStream.format("parquet").option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .outputMode("append").start())
    try:
        for i, t in enumerate(arrivals):
            _write_file(str(src), f"b{i}.json", [json.dumps(
                {"symbol": "FPT", "time": t, "close": 80.0})])
            q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.read.parquet(str(out)).agg(
        F.sum("n_ticks").alias("s")).first().s or 0

    # q327 shape on the same arrival sequence (arrival index = event_id)
    rows = [(1, i, t) for i, t in enumerate(arrivals)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts string")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    pred = (
        df.select(us.alias("t"), F.max(us).over(w).alias("pm"))
        .agg(F.count(F.when(
            F.col("t") < F.col("pm") - F.lit(60_000_000), F.lit(1)
        )).alias("drop_1m_n"))
        .first().drop_1m_n
    )
    assert pred == 1                       # the fixture's designed drop
    # sentinel's own window never closes (nothing advances wm past it)
    assert emitted == (len(arrivals) - 1) - pred


def test_bar_aggregate_completeness_matches_q328(spark, tmp_path):
    """q328 audits 1-minute bar completeness: n_active_min is exactly
    the number of bars ``bar_aggregate`` emits per (symbol, day), and
    span − active = the gap count a bar consumer alarms on. Run the
    REAL streaming bar aggregation (complete mode, memory sink) over a
    gappy fixture and assert the emitted bar set reproduces the
    q328-shape numbers."""
    from tests.test_streaming import _msg

    src = tmp_path / "src"; src.mkdir()
    ticks = [  # FPT: minutes 30,31,34,36 (gaps 32,33,35); VIC: 30,40
        ("FPT", "09:30:05"), ("FPT", "09:30:40"), ("FPT", "09:31:10"),
        ("FPT", "09:34:59"), ("FPT", "09:36:00"),
        ("VIC", "09:30:00"), ("VIC", "09:40:00"),
    ]
    _write_file(str(src), "b0.json", [
        _msg(sym, f"2024-01-02 {hms}", "80.0") for sym, hms in ticks
    ])
    raw = st.read_tick_stream_json(spark, str(src))
    bars = st.bar_aggregate(st.decode_ticks(raw), window="1 minute")
    q = (bars.writeStream.format("memory").queryName("bar_gap_twin")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        emitted = spark.sql(
            "SELECT symbol, bar_start FROM bar_gap_twin").collect()
    finally:
        q.stop()
    got = {}
    for r in emitted:
        got.setdefault(r.symbol, set()).add(
            int(r.bar_start.timestamp()) // 60)

    # q328 shape on the same ticks: minute buckets by integer division
    rows = [(sym, f"2024-01-02 {hms}") for sym, hms in ticks]
    df = spark.createDataFrame(rows, "symbol string, time string")
    us = F.unix_micros(F.col("time").cast("timestamp"))
    span = F.max("mb") - F.min("mb") + F.lit(1)
    audit = {
        r.symbol: (r.n_active_min, r.span_min, r.n_gap_min)
        for r in df.select("symbol", us.alias("t"))
        .select("symbol", F.expr("t div 60000000").alias("mb"))
        .groupBy("symbol").agg(
            F.count_distinct("mb").alias("n_active_min"),
            span.alias("span_min"),
            (span - F.count_distinct("mb")).alias("n_gap_min"))
        .collect()
    }
    assert audit["FPT"] == (4, 7, 3) and audit["VIC"] == (2, 11, 9)
    for sym, (active, span_n, gaps) in audit.items():
        mins = got[sym]
        assert len(mins) == active            # emitted bars = active minutes
        assert max(mins) - min(mins) + 1 == span_n
        assert span_n - len(mins) == gaps


def test_interval_join_fanout_matches_q330_state_count(spark, tmp_path):
    """q330 sizes the interval join's per-key state: st(row) = rows of
    the same user within the trailing 10-minute horizon. A stream-stream
    SELF interval join probes exactly that buffer — each probe row at
    time p matches the in-horizon rows [p−10m, p] — so the per-probe
    match fan-out must equal the q330-shape RANGE-window count on the
    same rows."""
    src = tmp_path / "views"; src.mkdir()
    views = [  # (user, time): A bursts then quiets; B tight pair
        ("A", "09:00:00"), ("A", "09:05:00"), ("A", "09:12:00"),
        ("A", "09:30:00"), ("B", "09:01:00"), ("B", "09:02:00"),
    ]
    _write_file(str(src), "v.json", [json.dumps(
        {"user_id": u, "t": f"2024-01-02 {hms}"}) for u, hms in views])
    left = spark.readStream.schema("user_id string, t timestamp").json(
        str(src)).withColumnRenamed("t", "vt")
    right = spark.readStream.schema("user_id string, t timestamp").json(
        str(src)).withColumnRenamed("t", "pt")
    joined = st.interval_join_streams(
        left, right, key="user_id", left_time="vt", right_time="pt",
        lag="10 minutes",
    )
    # interval_join_streams matches right_time in [left_time - lag,
    # left_time], so the PROBE rides the LEFT (vt) side and the buffered
    # horizon is the RIGHT (pt) side: each probe at vt fans out to the
    # rows inside its trailing 10-minute window — q330's st exactly.
    q = (joined.writeStream.format("memory").queryName("state_twin")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        fanout = {
            (r.user_id, str(r.vt)): r.n
            for r in spark.sql(
                "SELECT user_id, vt, count(*) AS n FROM state_twin "
                "GROUP BY user_id, vt").collect()
        }
    finally:
        q.stop()

    df = spark.createDataFrame(
        [(u, f"2024-01-02 {hms}") for u, hms in views],
        "user_id string, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("vt"),
             F.unix_micros(F.col("ts").cast("timestamp")).alias("t"))
    w = (Window.partitionBy("user_id").orderBy("t")
         .rangeBetween(-600_000_000, Window.currentRow))
    expected = {
        (r.user_id, str(r.vt)): r.st
        for r in df.select(
            "user_id", "vt", F.count(F.lit(1)).over(w).alias("st")
        ).collect()
    }
    assert expected[("A", "2024-01-02 09:12:00")] == 2  # 09:05 in, 09:00 out
    assert fanout == expected


def test_dedup_watermark_catch_and_escape_matches_q331(spark, tmp_path):
    """q331 predicts what dropDuplicatesWithinWatermark catches: replays
    within the 10-minute horizon of the first occurrence are dropped;
    replays arriving after the watermark evicted the key's state pass
    through. Drive the REAL operator through both fates with per-batch
    watermark control and assert emitted counts = firsts + escapes,
    exactly the q331-shape n_dups − n_caught_10m arithmetic."""
    src = tmp_path / "src"; src.mkdir()
    out = tmp_path / "out"; ckpt = tmp_path / "ckpt"
    schema = "symbol string, time timestamp, close double"

    def _row(sym, t, close):
        return json.dumps({"symbol": sym, "time": f"2024-01-02 {t}",
                           "close": close})

    batches = [
        [_row("FPT", "09:00:00", 80.0)],            # first occurrence
        [_row("FPT", "09:05:00", 80.0)],            # replay +5m: caught
        [_row("GAS", "09:40:00", 10.0)],            # advances wm to 09:30
        [_row("FPT", "09:45:00", 80.0)],            # replay +45m: ESCAPES
    ]
    stream = spark.readStream.schema(schema).json(str(src))
    deduped = st.dedup_ticks_by_id(
        stream, ["symbol", "close"], watermark="10 minutes")
    q = (deduped.writeStream.format("parquet").option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .outputMode("append").start())
    try:
        for i, lines in enumerate(batches):
            _write_file(str(src), f"b{i}.json", lines)
            q.processAllAvailable()
    finally:
        q.stop()
    emitted = [
        (r.symbol, str(r.time))
        for r in spark.read.parquet(str(out)).collect()
    ]
    assert sorted(emitted) == [
        ("FPT", "2024-01-02 09:00:00"), ("FPT", "2024-01-02 09:45:00"),
        ("GAS", "2024-01-02 09:40:00"),
    ]

    # q331 shape on the same rows, keyed (symbol, close), 10m horizon
    rows = [("FPT", 80.0, "2024-01-02 09:00:00"),
            ("FPT", 80.0, "2024-01-02 09:05:00"),
            ("GAS", 10.0, "2024-01-02 09:40:00"),
            ("FPT", 80.0, "2024-01-02 09:45:00")]
    df = spark.createDataFrame(rows, "symbol string, close double, ts string")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pk = ["symbol", "close"]
    wo = Window.partitionBy(*pk).orderBy("t")
    wu = Window.partitionBy(*pk)
    k = df.select("symbol", "close", us.alias("t")).select(
        "symbol", "t",
        F.row_number().over(wo).alias("rn"), F.min("t").over(wu).alias("t0"))
    dup = F.col("rn") > 1
    caught = dup & ((F.col("t") - F.col("t0")) <= F.lit(600_000_000))
    audit = k.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(dup, 1)).alias("n_dups"),
        F.count(F.when(caught, 1)).alias("n_caught")).collect()
    a = {r.symbol: r for r in audit}
    assert (a["FPT"].n_dups, a["FPT"].n_caught) == (2, 1)
    n_emitted_by_sym = {
        s: sum(1 for e, _ in emitted if e == s) for s in ("FPT", "GAS")
    }
    for s, r in a.items():
        firsts = r.n - r.n_dups
        escapes = r.n_dups - r.n_caught
        assert n_emitted_by_sym[s] == firsts + escapes
