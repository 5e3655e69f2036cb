"""Shared synthetic fixtures for bench.py and tools/scale_smoke.py.

The salted-join measurement exists in BOTH instruments — bench.py times
its constant factor at a fixed size, scale_smoke.py measures its scaling
exponent — and SCALE.md pairs the two numbers, which is only meaningful
while they measure the SAME regime. Keeping the fixture (90%-hot-key
fact, 1k-row dim) and the broadcast-disable protocol in one place removes
the drift risk of two hand-synced copies.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_KEY_FRACTION = "9 of 10"  # documented: pmod(id,10) < 9 -> key 0
N_DIM_ROWS = 1000
SALT = 16


def skew_fact(spark: SparkSession, n_rows: int, id_col="id") -> DataFrame:
    """n_rows fact frame where 90% of rows share key 0 and the rest
    spread uniformly over [0, N_DIM_ROWS) — the hot-key regime
    ``skew.salted_join`` exists for. Caller supplies the id source when
    deriving from an existing frame (scale_smoke derives from events)."""
    return spark.range(n_rows).select(
        skew_key(F.col(id_col)).alias("k"),
        F.col(id_col).alias("payload"),
    )


def skew_key(id_col) -> F.Column:
    return (
        F.when(F.pmod(id_col, F.lit(10)) < 9, F.lit(0))
        .otherwise(F.pmod(id_col, F.lit(N_DIM_ROWS)))
        .cast("long")
    )


def skew_dim(spark: SparkSession) -> DataFrame:
    return spark.range(N_DIM_ROWS).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim"), F.col("id").cast("string")).alias("attr"),
    )


@contextmanager
def no_auto_broadcast(spark: SparkSession):
    """Disable auto-broadcast for the duration — salting only matters when
    the small side CANNOT broadcast (a broadcastable dim never shuffles,
    so there would be nothing to skew)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
