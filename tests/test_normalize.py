"""Normalization fixtures (SURVEY §5.5): messy string-typed bars — commas,
nbsp, dd/MM/yyyy, duplicates — must land as the typed twin."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.functions.normalize import (
    normalize_bars,
    parse_comma_number,
    parse_pct_change,
    parse_vn_date,
)

RAW_ROWS = [
    # mirrors data/data_olhc/FPT.json quirks: trailing space, nbsp, commas
    Row(symbol="FPT", date="07/02/2023", open="80.50 ", high="81.00 ",
        low="79.90 ", close="80.70 ", volume="750,800 ", value="60,902,000,000 "),
    Row(symbol="FPT", date="07/02/2023", open="80.50 ", high="81.00 ",
        low="79.90 ", close="80.70 ", volume="750,800 ", value="60,902,000,000 "),  # dup
    Row(symbol="FPT", date="06/02/2023", open="79.00", high="80.10",
        low="78.80", close="80.00", volume="1,200,000", value="95,000,000,000"),
    Row(symbol="VIC", date="07/02/2023", open="55.00", high="56.00",
        low="54.50", close="55.50", volume="500,000", value="27,500,000,000"),
]


def test_normalize_bars_types_and_values(spark):
    out = normalize_bars(spark.createDataFrame(RAW_ROWS))
    assert dict(out.dtypes) == {
        "symbol": "string", "date": "date", "open": "double", "high": "double",
        "low": "double", "close": "double", "volume": "bigint", "value": "bigint",
    }
    rows = {(r.symbol, r.date): r for r in out.collect()}
    assert len(rows) == 3  # keyed dedup collapsed the duplicate
    fpt = rows[("FPT", datetime.date(2023, 2, 7))]
    assert fpt.open == 80.50 and fpt.high == 81.00 and fpt.close == 80.70
    assert fpt.volume == 750_800 and fpt.value == 60_902_000_000


def test_normalize_idempotent(spark):
    raw = spark.createDataFrame(RAW_ROWS)
    once = normalize_bars(raw)
    assert once.count() == 3
    # re-normalizing typed output is a no-op on cardinality
    assert once.dropDuplicates(["symbol", "date"]).count() == 3


def test_scalar_parsers(spark):
    df = spark.range(1).select(
        parse_comma_number(__import__("pyspark").sql.functions.lit("1,234.5 ")).alias("num"),
        parse_comma_number(__import__("pyspark").sql.functions.lit("garbage")).alias("bad"),
        parse_vn_date(__import__("pyspark").sql.functions.lit("31/12/2020")).alias("d"),
        parse_pct_change(__import__("pyspark").sql.functions.lit("(+1.2 %)")).alias("pos"),
        parse_pct_change(__import__("pyspark").sql.functions.lit("(-0.85 %)")).alias("neg"),
    )
    r = df.collect()[0]
    assert r.num == 1234.5
    assert r.bad is None  # try_cast: malformed -> null, not ANSI error
    assert r.d == datetime.date(2020, 12, 31)
    assert abs(r.pos - 0.012) < 1e-12
    assert abs(r.neg - (-0.0085)) < 1e-12
