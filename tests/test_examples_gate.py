"""The examples' pre-launch scale gate (r7 VERDICT task 5) actually
gates: both pipeline examples route every stage frame through
``launch`` = ``assert_scalable``, and a planted global ordered window —
the canonical does-not-scale plan — must raise BEFORE any job launches,
while a clean frame passes through unchanged."""

from __future__ import annotations

import importlib.util
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

_EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(_EXAMPLES_DIR, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize(
    "example",
    [
        "training_data_pipeline",
        "corpus_pipeline",
        "financial_ml_pipeline",
        "financial_pipeline",
        "multimodal_pipeline",
    ],
)
def test_example_launch_gate_trips_on_global_window(spark, example):
    mod = _load(example)
    planted = spark.range(100).withColumn(
        "cum", F.sum("id").over(Window.orderBy("id"))
    )
    with pytest.raises(ValueError, match="global-ordered-window"):
        mod.launch(planted)
    clean = spark.range(10).groupBy((F.col("id") % 2).alias("g")).count()
    assert mod.launch(clean) is clean


def test_examples_route_stages_through_gate():
    """Source-level pin: the gate is actually WIRED — every stage
    assignment in ALL FIVE examples goes through launch(...)."""
    for name, min_calls in [
        ("training_data_pipeline", 15),
        ("corpus_pipeline", 8),
        ("financial_ml_pipeline", 5),
        ("financial_pipeline", 7),
        ("multimodal_pipeline", 6),
    ]:
        src = open(os.path.join(_EXAMPLES_DIR, f"{name}.py")).read()
        calls = src.count("launch(") - src.count("def launch(")
        assert calls >= min_calls, (name, calls)
