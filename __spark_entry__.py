"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` — name -> (spark, sf_dir) -> DataFrame, one per implemented
operator from SURVEY.md §2 (registry lives in
``soict20221_bigdata_financialplatform_spark/queries.py``).
``oracle_sql()`` — DuckDB twins with identical column names/rounding.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soict20221_bigdata_financialplatform_spark.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship parameterized range query (SURVEY §2.11 ``Query(...)``) on
    sf0.001; driver checks rows>0."""
    return QUERIES["q02_flagship_range"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
