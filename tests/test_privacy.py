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
