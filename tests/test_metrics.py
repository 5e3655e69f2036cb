"""observe-based metrics: exact counts piggyback on the existing action."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark import metrics as mx


def test_observed_rides_existing_action(spark):
    df = spark.range(1000).select(
        "id", F.when(F.col("id") % 10 == 0, None).otherwise("x").alias("s")
    )
    inst, obs = mx.observed(
        df,
        "stage1",
        {"rows": F.count(F.lit(1)), "max_id": F.max("id")},
    )
    out = inst.where(F.col("id") >= 0).count()  # the ONE action
    assert out == 1000
    got = obs.get
    assert got["rows"] == 1000 and got["max_id"] == 999


def test_quality_metrics_null_counts(spark):
    rows = [Row(a=1, b="x"), Row(a=None, b="y"), Row(a=3, b=None),
            Row(a=None, b=None)]
    df = spark.createDataFrame(rows)
    inst, obs = mx.quality_metrics(df, "gate", ["a", "b"])
    inst.collect()
    got = obs.get
    assert got["rows"] == 4
    assert got["nulls_a"] == 2 and got["nulls_b"] == 2
