"""DP release mechanisms (operators/privacy.py): replayability, clipping
sensitivity bounds, noise shape sanity, and dirty-row behavior. The
distributional *privacy* guarantee itself is a mathematical property of
the mechanism, not testable per-example — what IS testable: the noise is
the deterministic seeded Laplace the docstring promises, the clip bound
really bounds every row's contribution, and a fresh seed re-draws."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.operators import privacy as pv


def _toy(spark, n_groups=40, rows_per_group=5):
    rows = [
        Row(g=f"g{i}", v=float(j + 1))
        for i in range(n_groups)
        for j in range(rows_per_group)
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_dp_counts_replayable_and_seed_sensitive(spark):
    df = _toy(spark)
    a = {r.g: r.noisy_count for r in pv.dp_laplace_counts(df, ["g"], seed="s1").collect()}
    b = {r.g: r.noisy_count for r in pv.dp_laplace_counts(df, ["g"], seed="s1").collect()}
    c = {r.g: r.noisy_count for r in pv.dp_laplace_counts(df, ["g"], seed="s2").collect()}
    assert a == b  # replay reproduces the published release
    assert a != c  # a fresh seed is a fresh draw
    # per-group noise differs across groups (not one shared draw)
    noises = {round(v - 5, 6) for v in a.values()}
    assert len(noises) > 1


def test_dp_counts_noise_is_laplace_shaped(spark):
    """Across many groups: noise centers near 0, signs roughly balance,
    and the empirical mean |noise| is within a loose factor of the
    Laplace(1/eps) expectation 1/eps."""
    df = _toy(spark, n_groups=300, rows_per_group=1)
    eps = 1.0
    out = pv.dp_laplace_counts(df, ["g"], epsilon=eps).collect()
    noise = [r.noisy_count - r.n_true for r in out]
    n = len(noise)
    assert n == 300
    neg = sum(1 for x in noise if x < 0)
    assert 0.35 * n < neg < 0.65 * n
    mean_abs = sum(abs(x) for x in noise) / n
    assert 0.5 / eps < mean_abs < 2.0 / eps
    assert abs(sum(noise) / n) < 3.0 / (eps * math.sqrt(n)) * 2


def test_dp_counts_epsilon_scales_noise(spark):
    df = _toy(spark, n_groups=100, rows_per_group=1)
    loose = pv.dp_laplace_counts(df, ["g"], epsilon=0.1, seed="e").collect()
    tight = pv.dp_laplace_counts(df, ["g"], epsilon=10.0, seed="e").collect()
    mean_loose = sum(abs(r.noisy_count - r.n_true) for r in loose) / len(loose)
    mean_tight = sum(abs(r.noisy_count - r.n_true) for r in tight) / len(tight)
    # same seed -> identical underlying draws, scaled 100x apart
    assert mean_loose > 20 * mean_tight


def test_dp_sum_clips_every_contribution(spark):
    rows = [
        Row(g="a", v=1000.0),   # clipped to 3
        Row(g="a", v=2.5),      # kept
        Row(g="a", v=-50.0),    # clamped to 0
        Row(g="a", v=None),     # contributes 0, still counted
        Row(g="b", v=0.5),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r.g: (r.n_rows, r.sum_clipped)
        for r in pv.dp_laplace_sum(df, ["g"], "v", clip=3.0).collect()
    }
    assert out["a"] == (4, 5.5)  # 3 + 2.5 + 0 + 0
    assert out["b"] == (1, 0.5)
    # the release never crashes on dirty rows and the clipped sum is
    # bounded by n_rows * clip — the sensitivity argument in numbers
    for n_rows, s in out.values():
        assert 0.0 <= s <= n_rows * 3.0


def test_dp_sum_noise_scales_with_clip(spark):
    df = _toy(spark, n_groups=100, rows_per_group=2)
    small = pv.dp_laplace_sum(df, ["g"], "v", clip=1.0, seed="c").collect()
    big = pv.dp_laplace_sum(df, ["g"], "v", clip=100.0, seed="c").collect()
    mean_small = sum(abs(r.noisy_sum - r.sum_clipped) for r in small) / len(small)
    mean_big = sum(abs(r.noisy_sum - r.sum_clipped) for r in big) / len(big)
    assert mean_big > 20 * mean_small


def test_dp_counts_plan_is_one_aggregate(spark):
    """The mechanism must add NO shuffle beyond the count's own: the
    noise projection sits above the aggregate. One Exchange in the
    plan."""
    df = _toy(spark)
    plan = pv.dp_laplace_counts(df, ["g"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan


def test_dp_gumbel_topk_selects_k_and_is_replayable(spark):
    df = _toy(spark, n_groups=30, rows_per_group=3)
    a = [(r.g, r.noisy_score) for r in pv.dp_gumbel_topk(df, ["g"], k=5, seed="t").collect()]
    b = [(r.g, r.noisy_score) for r in pv.dp_gumbel_topk(df, ["g"], k=5, seed="t").collect()]
    c = [(r.g, r.noisy_score) for r in pv.dp_gumbel_topk(df, ["g"], k=5, seed="u").collect()]
    assert a == b and len(a) == 5
    assert [x[1] for x in a] == sorted((x[1] for x in a), reverse=True)
    assert a != c  # fresh seed, fresh draw


def test_dp_null_group_key_draws_real_noise_matching_oracle(spark):
    """A NULL group key must get a REAL deterministic draw, identical to
    what the oracle's ``coalesce(col, chr(31) || 'null')`` recomputes —
    not the silently-different draw concat_ws's NULL-skipping used to
    produce (r12 ADVICE item 3; the r11 lesson-g NULL-divergence class,
    invisible to NULL-free testdata)."""
    import duckdb

    rows = [Row(g="a", v=1.0), Row(g=None, v=2.0), Row(g=None, v=3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r.noisy_count for r in pv.dp_laplace_counts(df, ["g"], seed="nn").collect()}
    assert out[None] is not None and out[None] == out[None]  # real, not NULL/NaN
    oracle = duckdb.sql(
        """
        SELECT 2 + (
          round(ln((('0x' || substr(md5('dpL1|nn|' || coalesce(NULL, chr(31) || 'null')), 1, 15))
                      ::UBIGINT::BIGINT + 1) / 1.152921504606846976e+18), 6)
        - round(ln((('0x' || substr(md5('dpL2|nn|' || coalesce(NULL, chr(31) || 'null')), 1, 15))
                      ::UBIGINT::BIGINT + 1) / 1.152921504606846976e+18), 6)
        ) * 1.0
        """
    ).fetchone()[0]
    assert out[None] == oracle
    # and the NULL group's draw differs from every named group's
    assert out[None] != out["a"]


def test_gumbel_inner_log_clamp_never_nulls(spark):
    """When u rounds to ln(u)==0 at 6dp (u within ~5e-7 of 1), the
    unclamped outer log(0) returns NULL in Spark / aborts in DuckDB
    (r12 ADVICE item 2). The clamp at -1e-6 must yield a finite draw.
    Direct expression probe at the pathological u."""
    df = spark.range(1).select(F.lit(0.9999999).alias("u"))
    clamped = df.select(
        (-F.round(F.log(-F.least(F.round(F.log("u"), 6), F.lit(-1e-6))), 6)
         * F.lit(10.0)).alias("draw"),
        F.log(-F.round(F.log("u"), 6)).alias("unclamped_outer"),
    ).first()
    assert clamped.unclamped_outer is None  # the failure mode is real
    assert clamped.draw is not None and math.isfinite(clamped.draw)
    # bit-identical to the DuckDB oracle formulation
    import duckdb

    ora = duckdb.sql(
        "SELECT - round(ln(- least(round(ln(0.9999999), 6), -1e-6)), 6) * 10.0"
    ).fetchone()[0]
    assert clamped.draw == ora


def test_dp_gumbel_topk_tracks_true_counts_at_high_epsilon(spark):
    """With epsilon huge the noise vanishes and the selection IS the true
    top-k; with epsilon tiny the selection departs from it — the
    utility/privacy dial works in both directions."""
    rows = [Row(g=f"g{i}", v=1.0) for i in range(20) for _ in range(1 + i)]
    df = spark.createDataFrame(rows, "g string, v double")
    exact = {"g19", "g18", "g17", "g16", "g15"}
    tight = {r.g for r in pv.dp_gumbel_topk(df, ["g"], k=5, epsilon=1e6).collect()}
    assert tight == exact
    loose = [
        {r.g for r in pv.dp_gumbel_topk(df, ["g"], k=5, epsilon=0.01, seed=s).collect()}
        for s in ("s1", "s2", "s3", "s4")
    ]
    assert any(sel != exact for sel in loose)
