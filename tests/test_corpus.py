"""Corpus-cleaning pipeline: stage policies on planted fixtures."""

from __future__ import annotations

from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.operators import corpus
from tests.test_dedup_similarity import BASE


def _docs(spark):
    rows = [
        Row(doc_id=0, text=BASE),
        Row(doc_id=1, text=BASE),                              # exact dup -> dropped
        Row(doc_id=2, text=BASE.replace("garden", "meadow")),  # near dup -> dropped
        Row(doc_id=3, text="short junk"),                      # fails quality gate
        Row(doc_id=4, text="a completely different well formed document about "
                           "the architecture of distributed query engines and "
                           "the cost of shuffles in large clusters"),
    ]
    return spark.createDataFrame(rows)


def test_quality_filter_drops_junk(spark):
    kept = {r.doc_id for r in corpus.quality_filter(_docs(spark)).collect()}
    assert 3 not in kept
    assert {0, 1, 4} <= kept


def test_drop_exact_dups_keeps_min_id(spark):
    kept = {r.doc_id for r in corpus.drop_exact_dups(_docs(spark)).collect()}
    assert 0 in kept and 1 not in kept


def test_clean_corpus_end_to_end(spark):
    kept = {r.doc_id for r in
            corpus.clean_corpus(_docs(spark), jaccard_threshold=0.5).collect()}
    assert kept == {0, 4}  # dup, near-dup and junk all removed; min-id wins


def test_train_test_split_disjoint_covering_stable(spark, sf_dir):
    from soict20221_bigdata_financialplatform_spark.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    train, test = corpus.train_test_split(docs, test_fraction=0.2, seed=7)
    n, ntr, nte = docs.count(), train.count(), test.count()
    assert ntr + nte == n                      # covering, disjoint by construction
    assert 0.05 <= nte / n <= 0.4             # ratio in the right ballpark
    # key-stable: same ids land in test across runs
    _, test2 = corpus.train_test_split(docs, test_fraction=0.2, seed=7)
    assert {r.doc_id for r in test.collect()} == {r.doc_id for r in test2.collect()}
    # different seed -> different split
    _, test3 = corpus.train_test_split(docs, test_fraction=0.2, seed=8)
    assert {r.doc_id for r in test.collect()} != {r.doc_id for r in test3.collect()}


def test_stratified_sample_reproducible(spark, sf_dir):
    from soict20221_bigdata_financialplatform_spark.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    a = corpus.stratified_sample(docs, "lang", default_fraction=0.3, seed=5)
    b = corpus.stratified_sample(docs, "lang", default_fraction=0.3, seed=5)
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())
    assert 0 < a.count() < docs.count()


def test_stratified_sample_explicit_fractions_per_stratum(spark, sf_dir):
    from soict20221_bigdata_financialplatform_spark.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    langs = [r[0] for r in docs.select("lang").distinct().collect()]
    keep, drop = langs[0], langs[1]
    out = corpus.stratified_sample(
        docs, "lang", fractions={keep: 1.0, drop: 0.0}, seed=5
    )
    got = {r.lang for r in out.select("lang").distinct().collect()}
    assert keep in got and drop not in got


def test_stratified_sample_high_cardinality_stratum_no_driver_melt(spark, sf_dir):
    """fractions=None on a HIGH-CARDINALITY stratum column (the doc id —
    every row its own stratum) must not enumerate strata on the driver;
    the hash path samples it fine (regression for the distinct().collect())."""
    from soict20221_bigdata_financialplatform_spark.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    out = corpus.stratified_sample(docs, "doc_id", default_fraction=0.5, seed=5)
    assert 0 < out.count() < docs.count()


def test_stratified_sample_oversized_fractions_dict_rejected(spark):
    import pytest

    docs = _docs(spark)
    too_many = {i: 0.5 for i in range(corpus.MAX_AUTO_STRATA + 1)}
    with pytest.raises(ValueError, match="MAX_AUTO_STRATA"):
        corpus.stratified_sample(docs, "doc_id", fractions=too_many)


def test_pack_sequences_equals_direct_cumsum(spark):
    """Distributed prefix-sum packing == the direct per-shard window cumsum,
    across many sub-shard boundaries and multiple shards."""
    import random

    from pyspark.sql import Row, Window
    from pyspark.sql import functions as F
    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        pack_sequences,
    )

    rng = random.Random(7)
    rows = [
        Row(source=f"s{i % 3}", doc_id=i, n_tokens=rng.randint(1, 500))
        for i in range(1000)
    ]
    docs = spark.createDataFrame(rows)

    got = {
        (r.source, r.doc_id): (r.seq_id, r.seq_offset)
        for r in pack_sequences(
            docs, block=1024, sub_shard_size=50  # 20 sub-shards per shard
        ).collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    want = {
        (r.source, r.doc_id): (r.seq_id, r.seq_offset)
        for r in docs.select(
            "source",
            "doc_id",
            F.floor(start / F.lit(1024)).cast("long").alias("seq_id"),
            (start % F.lit(1024)).cast("long").alias("seq_offset"),
        ).collect()
    }
    assert got == want


def test_incremental_ingest_dedup_across_batches(spark, tmp_path):
    """Exact-dedup ingest against a persisted digest store: in-batch dups
    collapse, cross-batch dups (and replayed batches) are dropped, fresh
    docs survive."""
    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        incremental_ingest_dedup,
    )

    store = str(tmp_path / "digests")
    b1 = spark.createDataFrame(
        [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="alpha"),
         Row(doc_id=3, text="beta")]
    )
    out1 = incremental_ingest_dedup(b1, store)
    assert {(r.doc_id, r.text) for r in out1.collect()} == {(1, "alpha"), (3, "beta")}

    b2 = spark.createDataFrame(
        [Row(doc_id=4, text="alpha"),   # cross-batch duplicate
         Row(doc_id=5, text="gamma")]
    )
    out2 = incremental_ingest_dedup(b2, store)
    assert {(r.doc_id, r.text) for r in out2.collect()} == {(5, "gamma")}

    # replay of batch 2 (foreachBatch redelivery): fully idempotent
    out2_replay = incremental_ingest_dedup(b2, store)
    assert out2_replay.count() == 0


def test_incremental_ingest_dedup_as_foreachbatch(spark, tmp_path):
    """The documented usage: a JSONL document stream deduped incrementally
    inside foreachBatch, corpus + digest store growing together."""
    import json

    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        incremental_ingest_dedup,
    )

    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "digests")
    corpus_dir = str(tmp_path / "corpus")

    def write_batch(name, rows):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in rows))

    write_batch("b1.jsonl", [
        {"doc_id": 1, "text": "alpha"},
        {"doc_id": 2, "text": "alpha"},
        {"doc_id": 3, "text": "beta"},
    ])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )

    def ingest(batch_df, batch_id):
        fresh = incremental_ingest_dedup(batch_df, store)
        fresh.write.mode("append").parquet(corpus_dir)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b2.jsonl", [
            {"doc_id": 4, "text": "alpha"},  # cross-batch dup
            {"doc_id": 5, "text": "gamma"},
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.doc_id, r.text) for r in spark.read.parquet(corpus_dir).collect()}
    assert got == {(1, "alpha"), (3, "beta"), (5, "gamma")}


def test_fixed_k_sample_exact_size_and_stability(spark, sf_dir):
    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        fixed_k_sample,
    )
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = fixed_k_sample(docs, "lang", k=20)
    sizes = {r.lang: r.n for r in
             out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, n in sizes.items():
        assert n == min(20, totals[lang])
    # key-stable: identical membership across runs
    again = fixed_k_sample(docs, "lang", k=20)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # different seed -> different sample
    other = fixed_k_sample(docs, "lang", k=20, seed=7)
    assert {r.doc_id for r in out.collect()} != {r.doc_id for r in other.collect()}


def test_corpus_clean_lsh_sandwiched_by_exact_twins(spark, sf_dir):
    """q49's survivor set is provably sandwiched: the MinHash-LSH stage
    verifies every candidate with EXACT Jaccard, so its pair set is a
    subset of the exact all-pairs set — it can only MISS near-dups, never
    invent them. Hence q60 (exact pairs) ⊆ q49 (LSH pairs) ⊆ q48 (no
    near-dup stage), and the LSH miss count is bounded (16-band recall at
    j≥0.8 is ≈1 − (1−0.8⁴)¹⁶ ≈ 0.9996 per pair)."""
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES

    q48 = {r.doc_id for r in QUERIES["q48_corpus_survivors"](spark, sf_dir).collect()}
    q49 = {r.doc_id for r in QUERIES["q49_corpus_clean"](spark, sf_dir).collect()}
    q60 = {r.doc_id for r in QUERIES["q60_corpus_clean_exact"](spark, sf_dir).collect()}
    assert q60 <= q49 <= q48
    # missed near-dups = docs q49 kept but the exact twin removed
    missed = len(q49 - q60)
    removed_exact = len(q48 - q60)
    assert missed <= max(1, removed_exact // 10), (
        f"LSH missed {missed} of {removed_exact} exact near-dup removals"
    )


def test_ingest_clean_batch_full_hygiene_gate(spark, tmp_path):
    """quality -> decontamination -> incremental dedup in one foreachBatch
    body, with per-stage survivor counts and replay idempotence."""
    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        eval_gram_set,
        ingest_clean_batch,
    )

    leak = "alpha beta gamma delta epsilon zeta eta theta"  # an 8-gram
    good = ("solid document with plenty of words and the usual amount "
            "of real content for the quality gate to accept it fine")
    evals = spark.createDataFrame(
        [Row(doc_id=900, text=leak + " benchmark continuation words here")]
    )
    grams = eval_gram_set(evals, n=8)
    store = str(tmp_path / "digests")

    b1 = spark.createDataFrame(
        [
            Row(doc_id=1, text=good + " one"),
            Row(doc_id=2, text=good + " one"),          # in-batch dup
            Row(doc_id=3, text=leak + " " + good),      # contaminated
            Row(doc_id=4, text="x"),                    # fails quality
        ]
    )
    stats: dict = {}
    out1 = ingest_clean_batch(b1, store, eval_grams=grams, stats=stats)
    assert {r.doc_id for r in out1.collect()} == {1}
    assert stats["after_quality"] == 3         # doc 4 gone
    assert stats["after_decontamination"] == 2  # doc 3 gone
    assert stats["after_dedup"] == 1            # doc 2 gone

    # second batch: cross-batch dup dies, fresh clean doc survives
    b2 = spark.createDataFrame(
        [Row(doc_id=5, text=good + " one"), Row(doc_id=6, text=good + " two")]
    )
    out2 = ingest_clean_batch(b2, store, eval_grams=grams)
    assert {r.doc_id for r in out2.collect()} == {6}
    # replay (foreachBatch redelivery): idempotent
    assert ingest_clean_batch(b2, store, eval_grams=grams).count() == 0


def test_dsir_scores_prefers_target_vocabulary(spark):
    """Docs written in the target slice's vocabulary score higher than docs
    in the off-domain vocabulary, and n_tokens counts duplicates."""
    from pyspark.sql import functions as F

    from soict20221_bigdata_financialplatform_spark.operators.corpus import dsir_scores

    tgt_words = "finance market equity bond yield"
    off_words = "banana kiwi mango papaya lychee"
    rows = [
        # target slice: doc_id < 10 (marked via the is_target column below)
        Row(doc_id=i, text=tgt_words) for i in range(5)
    ] + [
        Row(doc_id=100 + i, text=off_words) for i in range(5)
    ] + [
        # held-out docs, one per vocabulary
        Row(doc_id=500, text=tgt_words),
        Row(doc_id=501, text=off_words),
    ]
    docs = spark.createDataFrame(rows)
    out = dsir_scores(docs, is_target=F.col("doc_id") < 10, n_buckets=64)
    scores = {r.doc_id: r for r in out.collect()}
    assert scores[500].dsir_score > scores[501].dsir_score
    assert scores[500].n_tokens == 5
    # deterministic: a second run is bit-identical (integer micro-unit sums)
    again = {r.doc_id: r.dsir_score for r in dsir_scores(
        docs, is_target=F.col("doc_id") < 10, n_buckets=64).collect()}
    assert again == {k: v.dsir_score for k, v in scores.items()}


def test_lm_perplexity_scores_flags_gibberish(spark):
    """A doc whose bigrams are common in the corpus scores lower (more
    fluent) than a doc of corpus-unseen bigrams; short docs are absent."""
    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        lm_perplexity_scores,
    )

    common = "the market closed higher today"
    rows = [Row(doc_id=i, text=common) for i in range(20)]
    rows.append(Row(doc_id=100, text="zq xv qj vx jq zx"))  # gibberish
    rows.append(Row(doc_id=101, text="one"))                # no bigrams
    out = {r.doc_id: r for r in lm_perplexity_scores(
        spark.createDataFrame(rows)).collect()}
    assert 101 not in out
    assert out[0].ppl_proxy < out[100].ppl_proxy
    assert out[0].n_bigrams == 4


def test_rake_keywords_reference_example(spark):
    """RAKE semantics on a hand-computable doc: phrases split at stopwords,
    multi-word phrases outscore lone frequent words (degree rewards
    co-occurrence), top_k + tiebreaks deterministic."""
    from soict20221_bigdata_financialplatform_spark.operators.corpus import rake_keywords

    text = "linear diophantine equations and strict inequations in the criteria"
    out = rake_keywords(
        spark.createDataFrame([Row(doc_id=1, text=text)]), top_k=2
    ).collect()
    by_rank = {r.rank: r for r in out}
    # phrases: "linear diophantine equations" (3 words, each deg=3 freq=1
    # -> score 9), "strict inequations" (score 4), "criteria" (score 1)
    assert by_rank[1].phrase == "linear diophantine equations"
    assert by_rank[1].rake_score == 9.0
    assert by_rank[2].phrase == "strict inequations"
    assert by_rank[2].rake_score == 4.0


def test_weighted_sample_es_contract(spark):
    """Efraimidis-Spirakis WOR sampler: deterministic (same seed -> same
    sample), selection invariant under scaling every weight by a
    constant (keys scale monotonically), a dominating weight is always
    selected, and NULL / non-positive weights are dropped."""
    rows = [Row(doc_id=i, w=(1 if i else 10_000_000)) for i in range(40)]
    rows += [Row(doc_id=90, w=None), Row(doc_id=91, w=0), Row(doc_id=92, w=-5)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    pick = lambda df, **kw: [
        r.doc_id
        for r in corpus.weighted_sample_es(
            df, k=8, weight_col="w", **kw
        ).collect()
    ]
    got = pick(d)
    assert got == pick(d)  # deterministic
    assert 0 in got  # dominating weight always sampled
    assert not ({90, 91, 92} & set(got))  # dirty weights dropped
    scaled = d.selectExpr("doc_id", "w * 7 AS w")
    assert set(pick(scaled)) == set(got)  # scale-invariant selection
    assert 0 in pick(d, seed="other")  # dominance holds under any seed
