"""End-to-end batch pipeline + serving endpoints + reference-format readers
(S1 multiline JSON, S2 CSV) + K3 to_json inverse."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark import api
from soict20221_bigdata_financialplatform_spark.sources.readers import (
    read_bars_csv,
    read_bars_json,
)
from tests.test_normalize import RAW_ROWS


def test_backfill_roundtrip_and_endpoints(spark, tmp_path):
    out = str(tmp_path / "historical")
    api.backfill(spark.createDataFrame(RAW_ROWS), out, ema_n=3, rsi_n=3, sma_n=3)

    bars = api.load_bars(spark, out)
    assert {"symbol", "date", "close", "change_abs", "change_pct",
            "sma_3", "rsi_3", "ema_3"} <= set(bars.columns)
    # partition layout: one dir per symbol
    import os
    assert sorted(
        d for d in os.listdir(out) if d.startswith("symbol=")
    ) == ["symbol=FPT", "symbol=VIC"]

    top = api.olhc(bars, "FPT", 1).collect()
    assert len(top) == 1 and top[0].date == datetime.date(2023, 2, 7)
    inf = api.info(bars, "FPT").collect()
    assert len(inf) == 2  # all FPT days, newest first
    assert inf[0].date > inf[1].date
    # warm-up indicator rows were null-filled for change only
    assert inf[-1].change_abs == 0.0


def test_serving_endpoints_prune_symbol_partitions(spark, tmp_path):
    """The Cassandra-read-path claim (api.py module docstring): olhc/info's
    symbol predicate must PRUNE PARTITIONS of the backfill-written
    ``partitionBy("symbol")`` layout — the scan reads one symbol directory,
    not the table. Machine-checks what the docstring promises."""
    from soict20221_bigdata_financialplatform_spark.plans import checks

    out = str(tmp_path / "historical")
    api.backfill(spark.createDataFrame(RAW_ROWS), out, ema_n=3, rsi_n=3, sma_n=3)
    bars = api.load_bars(spark, out)
    for q in (api.olhc(bars, "FPT", 5), api.info(bars, "FPT")):
        plan = checks.formatted_plan(q)
        scan = "\n".join(
            line for line in plan.splitlines() if "PartitionFilters" in line
        )
        # the equality predicate sits in PartitionFilters (directory pruning),
        # not in the post-scan data filters
        assert "symbol" in scan and "FPT" in scan, plan


def test_news_latest_dedup_by_title(spark):
    t0 = datetime.datetime(2024, 1, 1, 9)
    news = spark.createDataFrame([
        Row(time=t0, title="markets rally", source="a", img="x"),
        Row(time=t0 + datetime.timedelta(hours=1), title="markets rally", source="b", img="y"),
        Row(time=t0, title="other headline", source="c", img="z"),
    ])
    out = api.news_latest(news, n=6).collect()
    assert len(out) == 2
    rally = [r for r in out if r.title == "markets rally"][0]
    assert rally.source == "b"  # newest wins (upsert-by-title semantics)


def test_read_bars_json_reference_format(spark, tmp_path):
    # the reference's data/data_olhc/*.json: multiline array of all-string objs
    p = tmp_path / "FPT.json"
    p.write_text(json.dumps([
        {"symbol": "FPT", "date": "07/02/2023", "open": "80.50 ",
         "high": "81.00 ", "low": "79.90 ", "close": "80.70 ",
         "volume": "750,800 ", "value": "60,902,000,000 "},
        {"symbol": "FPT", "date": "06/02/2023", "open": "79.00",
         "high": "80.10", "low": "78.80", "close": "80.00",
         "volume": "1,200,000", "value": "95,000,000,000"},
    ], indent=2))
    df = read_bars_json(spark, str(p))
    assert df.count() == 2
    assert dict(df.dtypes)["close"] == "string"  # schema-on-read, all strings
    from soict20221_bigdata_financialplatform_spark.functions.normalize import normalize_bars
    typed = normalize_bars(df)
    r = typed.where("date = date'2023-02-07'").collect()[0]
    assert r.close == 80.70 and r.volume == 750_800


def test_read_bars_csv_notebook_schema(spark, tmp_path):
    p = tmp_path / "excel_bab.csv"
    p.write_text(
        "Ticker,DTYYYYMMDD,OpenFixed(K),HighFixed(K),LowFixed(K),CloseFixed(K),Volume\n"
        "bab,20230207,80.5,81.0,79.9,80.7,750800\n"
        "bab,20230206,79.0,80.1,78.8,80.0,1200000\n"
    )
    df = read_bars_csv(spark, str(p))
    assert df.count() == 2
    assert dict(df.dtypes)["CloseFixed(K)"] == "double"
    # the notebook's numeric-string range query works as-is
    q = df.where((df["DTYYYYMMDD"] > 20230206) & (df["DTYYYYMMDD"] < 20230208))
    assert q.count() == 1


def test_to_kafka_payload_real_json(spark):
    df = spark.createDataFrame([Row(symbol="FPT", close=80.7)])
    out = api.to_kafka_payload(df, key_col="symbol").collect()[0]
    assert out.key == "FPT"
    assert json.loads(out.value) == {"symbol": "FPT", "close": 80.7}


def test_realtime_endpoint(spark):
    import datetime as dt
    ticks = spark.createDataFrame([
        Row(symbol="FPT", time=dt.datetime(2024, 1, 2, 9, 30), close=80.0),
        Row(symbol="FPT", time=dt.datetime(2024, 1, 2, 9, 31), close=80.5),
        Row(symbol="VIC", time=dt.datetime(2024, 1, 2, 9, 32), close=55.0),
    ])
    out = api.realtime(ticks, "FPT").collect()
    assert len(out) == 1 and out[0].close == 80.5  # newest FPT tick only


def test_to_local_ts_shift(spark):
    import datetime as dt
    from soict20221_bigdata_financialplatform_spark.functions.normalize import to_local_ts
    df = spark.createDataFrame([Row(t=dt.datetime(2024, 1, 2, 9, 0))])
    out = df.select(to_local_ts("t").alias("local")).collect()[0].local
    assert out == dt.datetime(2024, 1, 2, 16, 0)  # UTC+7 (Asia/Ho_Chi_Minh)


def test_write_partitioned_sorted_layout(spark, tmp_path):
    import os
    from soict20221_bigdata_financialplatform_spark.sources.layout import write_partitioned_sorted
    df = spark.createDataFrame(
        [Row(symbol=s, date=d, close=float(d))
         for s in ("AAA", "BBB") for d in (3, 1, 2)]
    )
    out = str(tmp_path / "store")
    write_partitioned_sorted(df, out, "symbol", ["date"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("symbol="))
    assert dirs == ["symbol=AAA", "symbol=BBB"]
    back = spark.read.parquet(out)
    assert back.count() == 6


def test_read_evolving_parquet_merges_schema_versions(spark, tmp_path):
    """Corpus versions that grew columns read back as one unified schema:
    old files null-fill the new column, pushdown still prunes."""
    from pyspark.sql import Row

    from soict20221_bigdata_financialplatform_spark.sources.readers import (
        read_evolving_parquet,
    )

    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(doc_id=1, text="v1 doc")]
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [Row(doc_id=2, text="v2 doc", lang="en")]
    ).write.mode("append").parquet(path)

    df = read_evolving_parquet(spark, path)
    assert set(df.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].lang is None and rows[2].lang == "en"
    # filter on the evolved column only matches files that have it
    assert df.where(df.lang == "en").count() == 1
