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


def test_observed_stream_metrics_on_progress(spark, tmp_path):
    """Per-micro-batch observed metrics appear on streaming progress."""
    import json

    from pyspark.sql import types as T

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"id": i}) for i in range(25))
    )
    schema = T.StructType([T.StructField("id", T.LongType())])
    stream = spark.readStream.schema(schema).json(str(src))
    inst = mx.observed_stream(
        stream, "ingest", {"rows": F.count(F.lit(1)), "max_id": F.max("id")}
    )
    q = (
        inst.writeStream.format("memory")
        .queryName("obs_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = None
        for p in q.recentProgress:
            om = p["observedMetrics"].get("ingest") if p["observedMetrics"] else None
            if om is not None:
                got = om
        assert got is not None, "no observedMetrics on any progress event"
        assert got["rows"] == 25 and got["max_id"] == 24
    finally:
        q.stop()
