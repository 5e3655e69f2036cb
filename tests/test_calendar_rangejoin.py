"""F13 prev_weekday, F14 trading-hour clamp, and the bucketized range join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.functions.normalize import (
    clamp_to_trading_hours,
    prev_weekday,
)
from soict20221_bigdata_financialplatform_spark.operators.asof import range_join


def test_prev_weekday(spark):
    df = spark.createDataFrame([
        Row(d=dt.date(2024, 1, 6)),   # Saturday
        Row(d=dt.date(2024, 1, 7)),   # Sunday
        Row(d=dt.date(2024, 1, 8)),   # Monday
        Row(d=dt.date(2024, 1, 10)),  # Wednesday
    ])
    out = [r.w for r in df.select(prev_weekday("d").alias("w")).collect()]
    assert out == [dt.date(2024, 1, 5), dt.date(2024, 1, 5),
                   dt.date(2024, 1, 8), dt.date(2024, 1, 10)]


def test_clamp_to_trading_hours(spark):
    df = spark.createDataFrame([
        Row(t=dt.datetime(2024, 1, 10, 7, 30)),    # before open -> prev 16:00
        Row(t=dt.datetime(2024, 1, 10, 11, 0)),    # in session -> unchanged
        Row(t=dt.datetime(2024, 1, 10, 18, 45)),   # after close -> today 16:00
    ])
    out = [r.c for r in df.select(clamp_to_trading_hours("t").alias("c")).collect()]
    assert out == [
        dt.datetime(2024, 1, 9, 16, 0),
        dt.datetime(2024, 1, 10, 11, 0),
        dt.datetime(2024, 1, 10, 16, 0),
    ]


def _range_fixture(spark):
    left = spark.createDataFrame([
        Row(k="a", ts=dt.datetime(2024, 1, 1, 10, 30), v=1),
        Row(k="a", ts=dt.datetime(2024, 1, 1, 13, 0), v=2),
        Row(k="b", ts=dt.datetime(2024, 1, 1, 10, 30), v=3),
    ])
    right = spark.createDataFrame([
        Row(k="a", s=dt.datetime(2024, 1, 1, 10, 0), e=dt.datetime(2024, 1, 1, 12, 0), tag="m"),
        Row(k="a", s=dt.datetime(2024, 1, 1, 12, 0), e=dt.datetime(2024, 1, 1, 14, 0), tag="n"),
    ])
    return left, right


def test_range_join_inner(spark):
    left, right = _range_fixture(spark)
    out = {(r.k, r.v, r.tag) for r in range_join(
        left, right, on=["k"], left_ts="ts", right_start="s", right_end="e",
        bucket_seconds=1800).collect()}
    assert out == {("a", 1, "m"), ("a", 2, "n")}


def test_range_join_interval_spanning_many_buckets(spark):
    left, right = _range_fixture(spark)
    # tiny buckets: each interval explodes into many buckets, result identical
    out = {(r.k, r.v, r.tag) for r in range_join(
        left, right, on=["k"], left_ts="ts", right_start="s", right_end="e",
        bucket_seconds=60).collect()}
    assert out == {("a", 1, "m"), ("a", 2, "n")}


def test_range_join_left_outer(spark):
    left, right = _range_fixture(spark)
    out = {(r.k, r.v, r.tag) for r in range_join(
        left, right, on=["k"], left_ts="ts", right_start="s", right_end="e",
        bucket_seconds=1800, how="left").collect()}
    assert out == {("a", 1, "m"), ("a", 2, "n"), ("b", 3, None)}


def test_range_join_boundary_semantics(spark):
    """Start inclusive, end exclusive."""
    left = spark.createDataFrame([
        Row(k="a", ts=dt.datetime(2024, 1, 1, 10, 0), v=1),   # == start
        Row(k="a", ts=dt.datetime(2024, 1, 1, 12, 0), v=2),   # == end
    ])
    right = spark.createDataFrame([
        Row(k="a", s=dt.datetime(2024, 1, 1, 10, 0), e=dt.datetime(2024, 1, 1, 12, 0), tag="m"),
    ])
    out = {(r.v, r.tag) for r in range_join(
        left, right, on=["k"], left_ts="ts", right_start="s", right_end="e",
        bucket_seconds=3600).collect()}
    assert out == {(1, "m")}
