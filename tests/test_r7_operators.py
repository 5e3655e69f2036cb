"""Round-7 operator semantics on hand-checkable fixtures: span-level
memorization report, per-partition HLL union, the md5 minhash band
report, and TF-IDF cosine."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.operators import corpus as cp
from soict20221_bigdata_financialplatform_spark.operators import dedup as dd
from soict20221_bigdata_financialplatform_spark.operators import sketch as sk

SPAN = "one two three four five six seven eight nine ten"


def test_span_contamination_report_hand_checked(spark):
    """Eval doc 1 embeds a verbatim 10-token train span -> longest span
    10 with 1 partner; eval doc 3 shares the same span from TWO train
    docs -> 2 partners; eval doc 5 (no overlap) is absent."""
    train = spark.createDataFrame(
        [
            Row(doc_id=0, text=f"prefix words here {SPAN} suffix words"),
            Row(doc_id=2, text=f"{SPAN} completely other tail content"),
            Row(doc_id=4, text="unrelated training text goes right here"),
        ]
    )
    ev = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"eval padding {SPAN} more eval padding"),
            Row(doc_id=3, text=f"{SPAN}"),
            Row(doc_id=5, text="totally novel evaluation document words"),
        ]
    )
    out = {
        r.doc_id: r
        for r in cp.span_contamination_report(
            ev, train, gram=5, min_span=8
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1].longest_train_span == 10
    assert out[1].n_train_partners == 2  # both train docs carry the span
    assert out[3].longest_train_span == 10
    assert out[3].n_train_partners == 2


def test_hll_union_equals_global_sketch(spark):
    """union-of-per-day-sketches must equal the sketch of the union,
    register by register — the mergeable-summary property q228 oracles."""
    rows = [
        Row(day=d, user_id=u)
        for d in range(5)
        for u in range(d * 40, d * 40 + 60)  # overlapping user ranges
    ]
    df = spark.createDataFrame(rows)
    merged = sk.hll_union(
        sk.hll_md5_registers_by(df, "user_id", "day")
    )
    direct = sk.hll_md5_registers(df, "user_id")
    got = {r.register: r.m_reg for r in merged.collect()}
    want = {r.register: r.m_reg for r in direct.collect()}
    assert got == want and len(got) == 16
    # and the estimate is within the usual m=16 error of the exact count
    est = sk.hll_md5_estimate(merged).collect()[0].hll_est
    exact = df.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.6


def test_minhash_md5_hot_band_report_counts_boilerplate(spark):
    """5 identical docs agree on every md5 band: the report must show all
    8 band buckets at size 5 — exactly what the q57 candidate join would
    walk (bucket_size^2/2 pairs per bucket)."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the windowsill"
    )
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=base) for i in range(5)]
    )
    rows = dd.minhash_md5_hot_band_report(docs).collect()
    assert len(rows) == 8
    assert all(r.bucket_size == 5 for r in rows)


def test_tfidf_cosine_identical_docs_is_one(spark):
    """Two identical docs have identical rare-term weight vectors ->
    cosine 1.0 up to the sqrt(x)^2 ulp (dq == na == nb)."""
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs = spark.createDataFrame(
            [
                Row(doc_id=0, text="alpha beta gamma delta epsilon zeta",
                    lang="en", source="s0", n_chars=35),
                Row(doc_id=1, text="alpha beta gamma delta epsilon zeta",
                    lang="en", source="s1", n_chars=35),
                Row(doc_id=2, text="totally different words entirely here now",
                    lang="en", source="s2", n_chars=41),
            ]
        )
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["q231_tfidf_cosine_pairs"](spark, d).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(0, 1)]
        assert abs(out[0].cosine - 1.0) < 1e-12


def test_cms_union_equals_global_matrix(spark):
    """Σᵢ sketch(Aᵢ) must equal sketch(∪ᵢ Aᵢ) cell-by-cell — the additive
    mergeability q233 oracles (cms_matrix_by + cms_union vs cms_matrix)."""
    rows = [
        Row(part=p, word=f"w{(i * 7 + p) % 40}")
        for p in range(4)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    merged = sk.cms_union(sk.cms_matrix_by(df, "word", "part"))
    direct = sk.cms_matrix(df, "word")
    got = {(r["__s"], r["__b"]): r["__c"] for r in merged.collect()}
    want = {(r["__s"], r["__b"]): r["__c"] for r in direct.collect()}
    assert got == want and sum(got.values()) == 4 * 200 * 4  # depth=4


def test_suggest_minhash_cap_budget_and_auto(spark):
    """MinHash twin of the simhash work-budget pre-flight: boilerplate
    corpus + small budget -> the budgeted cap; healthy corpus -> None,
    and max_bucket_size='auto' equals the uncapped pair set exactly."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill tonight"
    )
    hot = spark.createDataFrame(
        [Row(doc_id=i, text=base) for i in range(100)]
    )
    assert dd.suggest_minhash_cap(hot, max_pairs_per_bucket=2048) == 64
    healthy = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=f"distinct text {i} alpha{i} beta{i} gamma{i} "
                f"delta{i} epsilon{i} zeta{i}",
            )
            for i in range(20)
        ]
    )
    assert dd.suggest_minhash_cap(healthy) is None
    auto = sorted(
        (r.id_a, r.id_b)
        for r in dd.minhash_near_dup_pairs(
            healthy, max_bucket_size="auto", jaccard_threshold=0.5
        ).collect()
    )
    exact = sorted(
        (r.id_a, r.id_b)
        for r in dd.minhash_near_dup_pairs(
            healthy, jaccard_threshold=0.5
        ).collect()
    )
    assert auto == exact
