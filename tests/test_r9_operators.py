"""Round-9 operator semantics + plan shape: store-grain dedup
attribution, the Bernoulli sample store, the DoReMi mixer, LSH precision
eval, and signature-store novelty (q251-q255)."""

from __future__ import annotations

import pyspark.sql.functions as F

from soict20221_bigdata_financialplatform_spark.plans import checks
from soict20221_bigdata_financialplatform_spark.plans.checks import (
    conditional_bnlj_count,
)
from soict20221_bigdata_financialplatform_spark.queries import QUERIES


def test_q251_attribution_accounting_identity(spark, sf_dir):
    """Every non-first (doc, segment) occurrence is attributed to exactly
    one store batch: Σ n_dropped == |distinct (doc, dg)| − |distinct dg|,
    and no attribution points forward in time (store ≤ ingest)."""
    out = QUERIES["q251_store_dedup_attribution"](spark, sf_dir).collect()
    assert out, "corpus has shared boilerplate segments"
    assert all(r.store_batch <= r.ingest_batch for r in out)
    from soict20221_bigdata_financialplatform_spark.functions import text as tx
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", tx.words(F.col("text")).alias("w")
    ).where(F.size("w") >= 12)
    seg = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.floor(F.size("w") / 12).cast("int") - 1)
        ).alias("i"),
        "w",
    ).select(
        "doc_id",
        F.md5(F.array_join(F.slice("w", F.col("i") * 12 + 1, 12), " ")).alias(
            "dg"
        ),
    ).distinct()
    n_pairs, n_digests = seg.agg(
        F.count(F.lit(1)), F.count_distinct("dg")
    ).first()
    assert sum(r.n_dropped for r in out) == n_pairs - n_digests


def test_q252_union_of_stores_equals_direct_sample(spark, sf_dir):
    row = QUERIES["q252_bernoulli_sample_store"](spark, sf_dir).first()
    assert row.n_shards == 8
    assert row.sum_shard_n == row.n_sample  # mergeability proof
    assert row.min_shard_n >= 0 and row.max_shard_n >= row.min_shard_n


def test_q253_mixer_invariants(spark, sf_dir):
    """Weights are positive integers, shares sum to ~1, the hardest
    (highest-BPB) domain carries the max weight, and the total
    allocation never exceeds the 25% budget."""
    rows = QUERIES["q253_doremi_curriculum_mixer"](spark, sf_dir).collect()
    assert len(rows) == 20  # one per source
    assert all(r.weight_micro >= 1000000 for r in rows)
    assert abs(sum(r.weight_share for r in rows) - 1.0) < 1e-9
    hardest = max(rows, key=lambda r: r.bits_per_byte)
    assert hardest.weight_micro == max(r.weight_micro for r in rows)
    budget = sum(r.n_tokens for r in rows) // 4
    assert sum(r.alloc_tokens for r in rows) <= budget


def test_q254_precision_eval_bounds_and_plan(spark, sf_dir):
    """Precision/MAE stay in [0,1] with n_true ≤ n_pairs; the candidate
    stage plans an EQUI-join (no conditional nested loop — the invariant
    13 shape the oracle's OR-join would naively produce)."""
    q = QUERIES["q254_neardup_precision_eval"](spark, sf_dir)
    assert conditional_bnlj_count(q) == 0
    for r in q.collect():
        assert 0 <= r.n_true <= r.n_pairs
        assert 0.0 <= r.prec_05 <= 1.0
        assert 0.0 <= r.mae <= 1.0


def test_q255_epoch_zero_is_fully_novel(spark, sf_dir):
    """Epoch 0 has no prior store, so nothing can collide; later epochs
    are monotone in exposure only statistically, but counts must bound."""
    q = QUERIES["q255_minhash_store_novelty"](spark, sf_dir)
    plan = checks.executed_plan(q)
    assert "Window" not in plan  # pure join/agg pipeline
    rows = {r.epoch: r for r in q.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0].n_collided == 0 and rows[0].novelty == 1.0
    for r in rows.values():
        assert 0 <= r.n_collided <= r.n_docs
