"""Heavy hitters: exact baseline golden + Misra-Gries mergeable-summary
guarantees (capacity-k undercount bound, superset-of-frequent property)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.operators import sketch as sk


def _items(spark, counts: dict[str, int], partitions: int = 8):
    rows = [Row(item=it) for it, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows).repartition(partitions)


SKEWED = {
    "the": 400, "of": 250, "and": 180,          # heavy
    **{f"w{i}": 7 for i in range(40)},          # long tail
    **{f"x{i}": 2 for i in range(60)},
}


def test_exact_heavy_hitters_golden(spark):
    df = _items(spark, SKEWED)
    n = sum(SKEWED.values())
    got = {
        r["item"]: (r["cnt"], r["frac"])
        for r in sk.heavy_hitters_exact(df, "item", 0.1).collect()
    }
    expect = {it: c for it, c in SKEWED.items() if c >= 0.1 * n}
    assert set(got) == set(expect)
    for it, c in expect.items():
        assert got[it][0] == c
        assert got[it][1] == c / n


def test_mg_superset_and_undercount_bound(spark):
    k = 16
    df = _items(spark, SKEWED)
    n = sum(SKEWED.values())
    got = {
        r["item"]: r["mg_count"]
        for r in sk.heavy_hitters_mg(df, "item", k).collect()
    }
    assert len(got) <= k
    bound = n / (k + 1)
    # every item with true frequency > n/(k+1) must survive …
    for it, c in SKEWED.items():
        if c > bound:
            assert it in got, f"{it} (true {c} > bound {bound:.1f}) missing"
    # … and every reported count is an undercount by at most n/(k+1)
    for it, mg in got.items():
        true = SKEWED[it]
        assert mg <= true
        assert true - mg <= bound


def test_mg_exact_when_under_capacity(spark):
    counts = {"a": 50, "b": 30, "c": 20}
    df = _items(spark, counts, partitions=4)
    got = {
        r["item"]: r["mg_count"]
        for r in sk.heavy_hitters_mg(df, "item", 64).collect()
    }
    assert got == counts  # no eviction ever fires -> counts are exact


def test_mg_agrees_with_exact_on_heavy_set(spark):
    """The sketch's survivors at generous capacity cover the exact ≥5% set."""
    df = _items(spark, SKEWED)
    exact = {
        r["item"] for r in sk.heavy_hitters_exact(df, "item", 0.05).collect()
    }
    mg = {r["item"] for r in sk.heavy_hitters_mg(df, "item", 32).collect()}
    assert exact <= mg


def test_cms_est_bounds(spark):
    """CM guarantee: est >= true for every queried item, and on a zipf-ish
    planted distribution the overcount stays within eps*N for the heavy
    items (eps = e/width; collisions add at most the colliding mass)."""
    import math

    from pyspark.sql import Row
    from soict20221_bigdata_financialplatform_spark.operators.sketch import cms_estimates

    rows = []
    truth = {}
    for i in range(40):
        cnt = max(1, 500 // (i + 1))
        truth[f"item{i}"] = cnt
        rows += [Row(item=f"item{i}")] * cnt
    df = spark.createDataFrame(rows)
    queries = spark.createDataFrame([Row(item=f"item{i}") for i in range(10)])
    est = {r.item: r.cms_est for r in cms_estimates(
        df, "item", queries, depth=4, width=64).collect()}
    n = sum(truth.values())
    eps = math.e / 64
    for i in range(10):
        item = f"item{i}"
        assert est[item] >= truth[item]
        assert est[item] <= truth[item] + eps * n


def test_cms_mergeable(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly — counter
    matrices are additive, the property that makes the CM sketch
    maintainable over micro-batches / per-shard corpora."""
    from pyspark.sql import Row
    from soict20221_bigdata_financialplatform_spark.operators.sketch import (
        cms_matrix, cms_merge,
    )

    a = spark.createDataFrame([Row(item=f"a{i % 7}") for i in range(50)])
    b = spark.createDataFrame([Row(item=f"b{i % 5}") for i in range(30)])
    merged = {(r["__s"], r["__b"]): r["__c"] for r in cms_merge(
        cms_matrix(a, "item"), cms_matrix(b, "item")).collect()}
    union = {(r["__s"], r["__b"]): r["__c"] for r in cms_matrix(
        a.unionByName(b), "item").collect()}
    assert merged == union


def test_microunit_scores_partition_invariant(spark):
    """The integer micro-unit machinery's core claim: DSIR and perplexity
    scores are bit-identical regardless of partitioning (1 vs 32
    partitions), because per-doc accumulations are exact integer sums."""
    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        dsir_scores, lm_perplexity_scores,
    )
    from pyspark.sql import functions as F

    rows = [
        Row(doc_id=i, text=" ".join(f"w{(i * 7 + j) % 23}" for j in range(30)))
        for i in range(60)
    ]
    one = spark.createDataFrame(rows).repartition(1)
    many = spark.createDataFrame(rows).repartition(32)
    tgt = F.col("doc_id") % 3 == 0
    d1 = sorted((r.doc_id, r.dsir_score) for r in dsir_scores(one, tgt).collect())
    d2 = sorted((r.doc_id, r.dsir_score) for r in dsir_scores(many, tgt).collect())
    assert d1 == d2
    p1 = sorted((r.doc_id, r.ppl_proxy) for r in lm_perplexity_scores(one).collect())
    p2 = sorted((r.doc_id, r.ppl_proxy) for r in lm_perplexity_scores(many).collect())
    assert p1 == p2


def test_cms_store_incremental_and_replay_idempotent(spark, tmp_path):
    """Streaming maintenance: per-batch matrices land under batch_id
    partitions (dynamic overwrite), the global matrix is their key-wise
    sum, and REPLAYING a batch (foreachBatch redelivery) changes
    nothing."""
    from pyspark.sql import Row
    from soict20221_bigdata_financialplatform_spark.operators.sketch import (
        cms_matrix, cms_store_matrix, cms_store_update,
    )

    store = str(tmp_path / "cms_store")
    b0 = spark.createDataFrame([Row(item=f"x{i % 5}") for i in range(40)])
    b1 = spark.createDataFrame([Row(item=f"y{i % 3}") for i in range(20)])
    cms_store_update(b0, 0, store, "item")
    cms_store_update(b1, 1, store, "item")

    def snap(df):
        return {(r["__s"], r["__b"]): r["__c"] for r in df.collect()}

    want = snap(cms_matrix(b0.unionByName(b1), "item"))
    assert snap(cms_store_matrix(spark, store)) == want
    # replay batch 1: idempotent, not double-counted
    cms_store_update(b1, 1, store, "item")
    assert snap(cms_store_matrix(spark, store)) == want


def _tokens(spark, words, partitions: int = 8):
    return spark.createDataFrame(
        [Row(word=w) for w in words]
    ).repartition(partitions)


def test_hll_md5_error_bound_and_full_registers(spark):
    """HLL m=16 standard error is 1.04/sqrt(16) = 26%: on 5000 distinct
    tokens the estimate lands within 2.5 sigma, all registers are occupied,
    and duplicate tokens never move the registers (distinct-ness is the
    whole point)."""
    words = [f"tok{i}" for i in range(5000)]
    regs = sk.hll_md5_registers(_tokens(spark, words), "word")
    est = sk.hll_md5_estimate(regs).collect()[0]
    assert est.n_zero_regs == 0
    assert abs(est.hll_est - 5000) / 5000 <= 0.65
    # duplicates are invisible: registers identical after tripling the data
    regs3 = sk.hll_md5_registers(_tokens(spark, words * 3), "word")
    assert sorted(map(tuple, regs.collect())) == sorted(map(tuple, regs3.collect()))


def test_hll_md5_mergeability(spark):
    """Mergeable-summary property: registers of a union == key-wise MAX of
    the halves' registers (what makes HLL shardable across 1000 executors
    — each partition sketches locally, one m-row max combines)."""
    words = [f"w{i}" for i in range(2000)]
    a = sk.hll_md5_registers(_tokens(spark, words[:1200]), "word")
    b = sk.hll_md5_registers(_tokens(spark, words[800:]), "word")
    union = sk.hll_md5_registers(_tokens(spark, words), "word")
    merged = (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union.collect())
    )


def test_hll_md5_small_range_linear_counting(spark):
    """With 3 distinct tokens the raw harmonic estimate falls under 2.5m and
    the linear-counting branch fires: est = m * round(ln(m / V), 6) with V =
    empty registers — verified against the collected register state."""
    import math

    regs = sk.hll_md5_registers(_tokens(spark, ["a", "b", "c"]), "word")
    v = sum(1 for r in regs.collect() if r.m_reg == 0)
    est = sk.hll_md5_estimate(regs).collect()[0]
    assert est.n_zero_regs == v and v >= 13
    assert est.hll_est == pytest.approx(16.0 * round(math.log(16.0 / v), 6))


def test_md5_bernoulli_sample_deterministic_and_mergeable(spark):
    """Key-stable Bernoulli sampling: the same rows are chosen on every run
    AND regardless of how the input is split — sample(A ∪ B) equals
    sample(A) ∪ sample(B) row-for-row (membership is a per-row predicate,
    the property that makes the quantile sketch shard-mergeable)."""
    rows = spark.range(4000).selectExpr("id AS k", "id * 2.5 AS v")
    once = sk.md5_bernoulli_sample(rows, ("k",), 16)
    twice = sk.md5_bernoulli_sample(rows, ("k",), 16)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    a = sk.md5_bernoulli_sample(rows.where("k < 2500"), ("k",), 16)
    b = sk.md5_bernoulli_sample(rows.where("k >= 2500"), ("k",), 16)
    assert sorted(map(tuple, a.unionByName(b).collect())) == sorted(
        map(tuple, once.collect())
    )
    # rate ~ 1/16 within binomial noise (4000 trials, p=1/16 -> sd ~ 15)
    n = once.count()
    assert abs(n - 4000 / 16) <= 5 * 15.3


def test_sampled_quantiles_rank_error_bound(spark):
    """The 1/16 sample's quantile sits within a small RANK band of the true
    quantile: on 20k uniform values, sample-p50 must fall between the true
    p45 and p55 (rank error ~ 1/sqrt(1250) ~ 2.8%; 5% band = ~1.8 sigma...
    use p40/p60 for a 3.5-sigma-safe deterministic fixture check)."""
    rows = spark.range(20000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    samp = sk.md5_bernoulli_sample(rows, ("k",), 16)
    got = samp.agg(F.expr("percentile(v, 0.5)").alias("p50")).collect()[0].p50
    assert 20000 * 0.40 <= got <= 20000 * 0.60


def test_hll_store_update_replay_idempotent(spark, tmp_path):
    """MAX-mergeable twin of the CMS store: per-batch register states
    under batch_id partitions, global state = key-wise MAX, replaying a
    batch changes nothing, and the merged state equals the one-shot
    sketch of the unioned stream."""
    from pyspark.sql import Row
    from soict20221_bigdata_financialplatform_spark.operators.sketch import (
        hll_md5_registers, hll_store_registers, hll_store_update,
    )

    store = str(tmp_path / "hll_store")
    b0 = spark.createDataFrame([Row(item=f"u{i}") for i in range(80)])
    b1 = spark.createDataFrame([Row(item=f"u{i}") for i in range(40, 120)])
    hll_store_update(b0, 0, store, "item")
    hll_store_update(b1, 1, store, "item")

    def snap(df):
        return {r.register: r.m_reg for r in df.collect()}

    want = snap(hll_md5_registers(b0.unionByName(b1), "item"))
    assert snap(hll_store_registers(spark, store)) == want
    hll_store_update(b1, 1, store, "item")  # replay
    assert snap(hll_store_registers(spark, store)) == want
