"""Cross-engine NUMERIC-semantics pins (r13): the asymmetry classes the
dirty-numeric gate (`tools/dirty_numeric_gate.py`) surfaced — measured
behaviors that make a naive oracle pairing diverge on dirty rows even
when both sides are "correct". Each test documents the asymmetry so a
behavior change in either engine fails CI and the affected idioms can be
revisited. The engine-side policies these forced:

- IEEE specials quarantine to NULL at the events scan
  (``readers._quarantine_specials`` + parity_check's view DDL).
- No oracle-paired query calls builtin ``corr`` where a zero-variance
  group is reachable — guarded covar/var chains instead (q164/q168).
- Orderings over nullable columns state NULL placement or filter NULLs.
- ``count_distinct`` over nullable columns sentinel-coalesces (q241).
- Day-close / asof picks tiebreak on the unique (ts, event_id) key.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_duckdb_aborts_on_stddev_and_quantile_over_nan(con):
    """DuckDB ABORTS on stddev over NaN; Spark returns NaN. This is WHY
    specials quarantine to NULL at the scan — no aggregate pairing can
    hold once a NaN reaches it."""
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute(
            "select stddev_samp(x) from (values (1.0),(2.0),"
            "('NaN'::DOUBLE)) t(x)"
        ).fetchone()


def test_duckdb_aborts_on_nonfinite_bigint_cast_spark_saturates(con, spark):
    """floor(x*1e6+0.5)::BIGINT — the micro-unit quantizer — ABORTS in
    DuckDB for NaN/Inf/overflow inputs while Spark returns 0 (NaN) or
    saturates to LONG_MAX: the quantizer's inputs must be finite and
    budgeted on BOTH sides."""
    for bad in ("'NaN'::DOUBLE", "'Infinity'::DOUBLE", "1e22"):
        with pytest.raises(duckdb.ConversionException):
            con.execute(
                f"select floor({bad} * 1e6 + 0.5)::BIGINT"
            ).fetchone()
    row = spark.sql(
        "SELECT cast(floor(cast('NaN' as double) * 1e6 + 0.5) as bigint) a,"
        " cast(floor(cast('Infinity' as double) * 1e6 + 0.5) as bigint) b"
    ).first()
    assert row.a == 0 and row.b == 9223372036854775807


def test_duckdb_aborts_on_log_of_nonpositive_spark_returns_null(con, spark):
    """ln(x<=0): Spark NULL, DuckDB abort — every oracle-paired ln needs
    a positivity guard on BOTH sides (invariant 4's transcendental
    sibling)."""
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute("select ln(-5.0)").fetchone()
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute("select sqrt(-1.0)").fetchone()
    row = spark.sql("SELECT ln(-5.0) a, sqrt(-1.0) b").first()
    assert row.a is None
    import math

    assert math.isnan(row.b)


def test_spark_ansi_corr_throws_on_zero_variance_duckdb_null(con, spark):
    """Spark 4 ANSI builtin ``corr`` throws DIVIDE_BY_ZERO on a
    zero-variance input; DuckDB returns NULL. The engine's guarded
    covar/var Pearson chain returns NULL like DuckDB."""
    assert (
        con.execute(
            "select corr(x, y) from (values (0.0,0.0),(0.0,0.0)) t(x,y)"
        ).fetchone()[0]
        is None
    )
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 0.0, 0.0)], "g int, x double, y double"
    )
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        df.groupBy("g").agg(F.corr("x", "y")).collect()
    guarded = (
        df.groupBy("g")
        .agg(
            F.covar_pop("x", "y").alias("cv"),
            F.var_pop("x").alias("vx"),
            F.var_pop("y").alias("vy"),
        )
        .select(
            F.when(
                (F.col("vx") != 0) & (F.col("vy") != 0),
                F.col("cv") / F.sqrt(F.col("vx") * F.col("vy")),
            ).alias("corr")
        )
        .first()
    )
    assert guarded.corr is None


def test_null_ordering_defaults_differ(con, spark):
    """ASC ordering: Spark defaults NULLS FIRST, DuckDB NULLS LAST — any
    oracle-paired ORDER BY / window over a nullable column must state
    placement explicitly (or filter the NULLs, which most r13 fixes
    do)."""
    dk = [
        r[0]
        for r in con.execute(
            "select x from (values (2.0),(NULL),(1.0)) t(x) order by x"
        ).fetchall()
    ]
    assert dk == [1.0, 2.0, None]
    sp = [
        r.x
        for r in spark.createDataFrame([(2.0,), (None,), (1.0,)], "x double")
        .orderBy("x")
        .collect()
    ]
    assert sp == [None, 1.0, 2.0]


def test_spark_count_distinct_drops_any_null_row_duckdb_keeps(con, spark):
    """count(DISTINCT (a, b)): DuckDB counts a row struct with a NULL
    member; Spark's count_distinct drops rows where ANY argument is
    NULL. Sentinel-coalesce nullable members on both sides (q241)."""
    dk = con.execute(
        "select count(distinct (a, b)) from (values (1, NULL),(1, 2),"
        "(1, NULL)) t(a, b)"
    ).fetchone()[0]
    assert dk == 2
    df = spark.createDataFrame([(1, None), (1, 2), (1, None)], "a int, b int")
    assert df.select(F.count_distinct("a", "b")).first()[0] == 1


def test_quarantined_view_ddl_matches_loader(con):
    """The parity harness's events view applies the identical specials
    quarantine as readers._quarantine_specials (full three-way check
    lives in test_dirty_data.py)."""
    got = con.execute(
        "select case when isfinite(x) then x end from (values"
        " ('NaN'::DOUBLE),('Infinity'::DOUBLE),('-Infinity'::DOUBLE),"
        " (1.5),(NULL)) t(x)"
    ).fetchall()
    assert [r[0] for r in got] == [None, None, None, 1.5, None]
