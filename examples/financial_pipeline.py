"""End-to-end walkthrough of the reference platform's workflow on this
engine — everything a user of the reference does today, Spark-first:

 1. raw scrape-shaped JSON bars  -> normalize -> indicators -> partitioned store
 2. the four serving endpoints over that store
 3. the interactive range query (``Query(start, end, kind, ticker)``)
 4. the streaming tick path: JSON-lines "topic" -> watermark dedup ->
    1-minute OHLC bars -> idempotent parquet sink
 5. news dedup-by-title serving

Run: python examples/financial_pipeline.py   (writes only under /tmp)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark import api, get_spark
from soict20221_bigdata_financialplatform_spark.operators.serving import range_query
from soict20221_bigdata_financialplatform_spark.plans.linter import assert_scalable
from soict20221_bigdata_financialplatform_spark.streaming import ticks as st


def launch(df):
    """Pre-launch scale gate (r9 VERDICT task 4): every batch stage frame
    goes through ``assert_scalable`` BEFORE its first action — plan-shape
    only, runs no tasks. A plan that would not survive the 100 TB target
    (global ordered window, conditional BNLJ, per-row Python UDF) raises
    ``ValueError`` here instead of launching a job."""
    assert_scalable(df)
    return df


def make_raw_bars(n_days: int = 300, symbols=("FPT", "VIC", "HPG")) -> list[Row]:
    """Scrape-shaped rows: dd/MM/yyyy dates, comma thousands, trailing spaces
    (what data/data_olhc/*.json looks like in the reference)."""
    rng = random.Random(1)
    rows = []
    for sym in symbols:
        px = 50.0 + 10 * len(sym)
        day = dt.date(2023, 1, 2)
        for _ in range(n_days):
            px = max(1.0, px + rng.uniform(-1.5, 1.5))
            rows.append(Row(
                symbol=sym, date=day.strftime("%d/%m/%Y"),
                open=f"{px:,.2f} ", high=f"{px+0.7:,.2f} ",
                low=f"{px-0.7:,.2f} ", close=f"{px+0.2:,.2f} ",
                volume=f"{rng.randint(100, 900) * 1000:,} ",
                value=f"{rng.randint(10, 99) * 10**9:,} ",
            ))
            day += dt.timedelta(days=1)
    return rows


def main() -> None:
    spark = get_spark("financial-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="finplat_example_")
    store = os.path.join(work, "historical")

    # 1. batch backfill (reference to_db.py, minus the per-row INSERT loop)
    t0 = time.time()
    api.backfill(launch(spark.createDataFrame(make_raw_bars())), store)
    bars = launch(api.load_bars(spark, store))
    print(f"[backfill] {bars.count()} rows with indicators in {time.time()-t0:.1f}s "
          f"-> {store}")

    # 2. serving endpoints (reference API.py)
    print("[/OLHC/FPT/5]")
    launch(api.olhc(bars, "FPT", 5)).select("symbol", "date", "close", "ema_25", "rsi_14").show()
    print("[/info/VIC] newest row:")
    launch(api.info(bars, "VIC", limit=1)).select("symbol", "date", "close", "change_pct").show()

    # 3. interactive range query (reference Query.ipynb)
    print("[Query(2023-03-01, 2023-04-01, close, FPT)]")
    launch(range_query(
        bars, order_col="date",
        lo=dt.date(2023, 3, 1), hi=dt.date(2023, 4, 1),
        kind="close", key_col="symbol", key="FPT",
    )).show(5)

    # 4. streaming tick path (reference producer->Kafka->warehouse)
    topic_dir = os.path.join(work, "tick_topic")
    os.makedirs(topic_dir)
    msgs = []
    base = dt.datetime(2023, 6, 1, 9, 30)
    for i in range(240):
        msgs.append(json.dumps({
            "symbol": "FPT", "time": (base + dt.timedelta(seconds=10 * i)).isoformat(sep=" "),
            "open": "80.0", "high": "80.5", "low": "79.5",
            "close": f"{80 + 0.01 * i:.2f}", "volume": f"{(i+1)*1000:,}",
            "previous_close": "79.9", "ref": "80.0", "ceil": "85.6", "floor": "74.4",
        }))
    msgs.append(json.dumps({  # watermark pusher
        "symbol": "ZZZ", "time": "2023-06-01 12:00:00", "open": "1", "high": "1",
        "low": "1", "close": "1", "volume": "1", "previous_close": "1",
        "ref": "1", "ceil": "1", "floor": "1"}))
    with open(os.path.join(topic_dir, "batch1.json"), "w") as f:
        f.write("\n".join(msgs))
    bars_out = os.path.join(work, "bars_1min")
    q = st.run_tick_pipeline(
        spark, topic_dir, bars_out, os.path.join(work, "ckpt"),
        window="1 minute", watermark="10 minutes",
    )
    q.processAllAvailable()
    q.stop()
    got = launch(spark.read.parquet(bars_out))
    print(f"[streaming] {got.count()} finalized 1-minute bars:")
    got.orderBy("bar_start").select(
        "symbol", "bar_start", "open", "high", "low", "close", "n_ticks"
    ).show(5)

    # 5. news dedup-by-title (reference /news)
    news = spark.createDataFrame([
        Row(time=dt.datetime(2023, 6, 1, 8), title="Thị trường tăng điểm", source="a", img="i1"),
        Row(time=dt.datetime(2023, 6, 1, 9), title="Thị trường tăng điểm", source="b", img="i2"),
        Row(time=dt.datetime(2023, 6, 1, 7), title="Khối ngoại mua ròng", source="c", img="i3"),
    ])
    print("[/news]")
    launch(api.news_latest(news, n=6)).show(truncate=False)

    print("example complete; artifacts under", work)


if __name__ == "__main__":
    main()
