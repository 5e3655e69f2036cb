"""Connected components, parquet MERGE upsert, incremental end-of-day
update."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.operators.components import (
    cluster_near_dups,
    connected_components,
)
from soict20221_bigdata_financialplatform_spark.operators.merge import (
    incremental_daily_update,
    merge_upsert,
)


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),  # chain
         Row(id_a=10, id_b=11),                                           # island
         Row(id_a=20, id_b=21), Row(id_a=22, id_b=21)]                    # vee
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20


def test_connected_components_long_chain_pointer_doubling(spark):
    """A 200-node chain converges well inside 12 rounds (pointer doubling:
    ~log2(L), not the ~L that one-hop propagation needs) and reports its
    convergence metric through ``stats``."""
    pairs = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(200)]
    )
    stats: dict = {}
    comp = {
        r.node: r.component
        for r in connected_components(pairs, max_iterations=12, stats=stats)
        .collect()
    }
    assert set(comp.values()) == {0}
    assert stats["converged"] is True
    assert stats["iterations"] <= 12


def test_connected_components_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(60)])
    import pytest

    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(pairs, max_iterations=2)
    # allow_partial downgrades to a warning and returns partial labels
    import warnings

    stats: dict = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(
            pairs, max_iterations=2, allow_partial=True, stats=stats
        )
        assert out.count() == 61
        assert any("PARTIAL" in str(x.message) for x in w)
    assert stats["converged"] is False


def test_cluster_near_dups_singletons_keep_own_id(spark):
    docs = spark.createDataFrame([Row(doc_id=i, text=f"d{i}") for i in range(5)])
    pairs = spark.createDataFrame([Row(id_a=1, id_b=3)])
    out = {r.doc_id: r.cluster_id for r in cluster_near_dups(docs, pairs).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4}


def _store(spark, path):
    df = spark.createDataFrame([
        Row(symbol="FPT", date=dt.date(2023, 1, d), close=80.0 + d) for d in (1, 2, 3)
    ] + [
        Row(symbol="VIC", date=dt.date(2023, 1, d), close=55.0 + d) for d in (1, 2)
    ])
    (df.repartition("symbol").write.mode("overwrite")
       .partitionBy("symbol").parquet(path))
    return df


def test_merge_upsert_update_and_insert(spark, tmp_path):
    path = str(tmp_path / "store")
    _store(spark, path)
    updates = spark.createDataFrame([
        Row(symbol="FPT", date=dt.date(2023, 1, 3), close=99.0),   # update
        Row(symbol="FPT", date=dt.date(2023, 1, 4), close=84.0),   # insert
    ])
    merge_upsert(spark, path, updates, keys=["symbol", "date"], partition_col="symbol")
    out = spark.read.parquet(path)
    fpt = {r.date: r.close for r in out.where("symbol='FPT'").collect()}
    assert fpt == {dt.date(2023, 1, 1): 81.0, dt.date(2023, 1, 2): 82.0,
                   dt.date(2023, 1, 3): 99.0, dt.date(2023, 1, 4): 84.0}
    # untouched partition intact
    assert out.where("symbol='VIC'").count() == 2
    # idempotent: re-applying the same updates changes nothing
    merge_upsert(spark, path, updates, keys=["symbol", "date"], partition_col="symbol")
    assert spark.read.parquet(path).count() == 6


def test_incremental_daily_update_matches_full_recompute(spark, tmp_path):
    from soict20221_bigdata_financialplatform_spark.functions.indicators import sma

    def recompute(df):
        return sma(df, 2, ("symbol",), "date", "close")

    path = str(tmp_path / "store")
    base_raw = spark.createDataFrame([
        Row(symbol="FPT", date=dt.date(2023, 1, d), close=80.0 + d) for d in (1, 2, 3)
    ] + [
        Row(symbol="VIC", date=dt.date(2023, 1, d), close=55.0 + d) for d in (1, 2)
    ])
    (recompute(base_raw).repartition("symbol").write.mode("overwrite")
       .partitionBy("symbol").parquet(path))

    new_bar = spark.createDataFrame([Row(symbol="FPT", date=dt.date(2023, 1, 4), close=90.0)])
    incremental_daily_update(
        spark, path, new_bar, recompute, context_rows=5,
    )
    got = spark.read.parquet(path)
    # full recompute over everything = the oracle
    full = recompute(base_raw.unionByName(new_bar))
    g = {(r.symbol, r.date): (r.close, r.sma_2) for r in got.collect()}
    f = {(r.symbol, r.date): (r.close, r.sma_2) for r in full.collect()}
    assert g == f
    # only FPT partition rewritten; VIC rows identical and present
    assert got.where("symbol='VIC'").count() == 2


def test_incremental_update_corrected_bar_wins_collision(spark, tmp_path):
    """A re-emitted bar for an EXISTING (symbol, date) must replace the stored
    row — update-wins, deterministically (regression: dropDuplicates kept an
    arbitrary survivor, so a correction could silently lose)."""
    from soict20221_bigdata_financialplatform_spark.functions.indicators import sma

    def recompute(df):
        return sma(df, 2, ("symbol",), "date", "close")

    path = str(tmp_path / "store")
    base_raw = spark.createDataFrame([
        Row(symbol="FPT", date=dt.date(2023, 1, d), close=80.0 + d) for d in (1, 2, 3)
    ])
    (recompute(base_raw).repartition("symbol").write.mode("overwrite")
       .partitionBy("symbol").parquet(path))

    corrected = spark.createDataFrame(
        [Row(symbol="FPT", date=dt.date(2023, 1, 3), close=70.0)]  # collides
    )
    incremental_daily_update(spark, path, corrected, recompute, context_rows=5)
    got = spark.read.parquet(path)
    corrected_raw = spark.createDataFrame([
        Row(symbol="FPT", date=dt.date(2023, 1, 1), close=81.0),
        Row(symbol="FPT", date=dt.date(2023, 1, 2), close=82.0),
        Row(symbol="FPT", date=dt.date(2023, 1, 3), close=70.0),
    ])
    full = recompute(corrected_raw)
    g = {(r.symbol, r.date): (r.close, r.sma_2) for r in got.collect()}
    f = {(r.symbol, r.date): (r.close, r.sma_2) for r in full.collect()}
    assert g == f
