from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from soict20221_bigdata_financialplatform_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "spark-finplat-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.streaming.schemaInference": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
