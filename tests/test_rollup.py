"""Cascading rollups must equal direct aggregation from raw ticks."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.operators import rollup


def _ticks(spark, n=500, symbols=("FPT", "VIC")):
    rng = random.Random(3)
    rows = []
    t = dt.datetime(2024, 1, 2, 9, 0)
    for i in range(n):
        t += dt.timedelta(seconds=rng.randint(5, 120))
        rows.append(Row(
            symbol=symbols[i % len(symbols)], time=t,
            close=round(50 + rng.uniform(-5, 5), 2), volume=i * 10,
        ))
    return spark.createDataFrame(rows)


def test_cascade_equals_direct(spark):
    ticks = _ticks(spark)
    levels = rollup.cascade(ticks, ("1 minute", "1 hour", "1 day"))
    direct_hour = rollup.bars_from_ticks(ticks, "1 hour")
    via_cascade = levels["1 hour"]
    a = {(r.symbol, str(r.bar_start)): (r.open, r.high, r.low, r.close, r.volume)
         for r in direct_hour.collect()}
    b = {(r.symbol, str(r.bar_start)): (r.open, r.high, r.low, r.close, r.volume)
         for r in via_cascade.collect()}
    assert a == b
    # n_ticks conserved through the hierarchy
    total = ticks.count()
    for w, df in levels.items():
        assert sum(r.n_ticks for r in df.collect()) == total


def test_rollup_ohlc_semantics(spark):
    ticks = spark.createDataFrame([
        Row(symbol="FPT", time=dt.datetime(2024, 1, 2, 9, 0, 10), close=10.0, volume=1),
        Row(symbol="FPT", time=dt.datetime(2024, 1, 2, 9, 20, 0), close=30.0, volume=2),
        Row(symbol="FPT", time=dt.datetime(2024, 1, 2, 9, 59, 0), close=20.0, volume=3),
    ])
    hour = rollup.cascade(ticks, ("1 minute", "1 hour"))["1 hour"].collect()[0]
    assert hour.open == 10.0    # first sub-bar's open
    assert hour.close == 20.0   # last sub-bar's close
    assert hour.high == 30.0 and hour.low == 10.0
    assert hour.volume == 3 and hour.n_ticks == 3
