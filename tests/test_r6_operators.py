"""Round-6 operator semantics on hand-checkable fixtures: BPE merge
learning, paragraph-grain dedup with reassembly, the ExactSubstr digest
join key, and simhash hot-chunk observability."""

from __future__ import annotations

from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.operators import corpus as cp
from soict20221_bigdata_financialplatform_spark.operators import dedup as dd

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


def test_bpe_learn_merges_hand_checked(spark):
    """Corpus {aa×3-ish}: round 1 must merge the most frequent adjacent
    char pair (a,a) weighted by corpus word counts; round 2 the next."""
    docs = spark.createDataFrame(
        [Row(text="aa ab"), Row(text="aa aa b")]
    )
    out = cp.bpe_learn_merges(docs, rounds=2).collect()
    assert [(r.bpe_round, r.sym1, r.sym2, r.merged, r.pair_weight) for r in out] == [
        (1, "a", "a", "aa", 3),  # 'aa' appears 3 times -> pair (a,a) wins
        (2, "a", "b", "ab", 1),  # only 'ab' still has a pair
    ]


def test_bpe_merge_is_leftmost_nonoverlapping(spark):
    """'aaa' + merge (a,a) must become (aa)(a), not (a)(aa) — BPE's
    leftmost-first order, carried by plain string replace."""
    docs = spark.createDataFrame([Row(text="aaa aaa ba")])
    out = cp.bpe_learn_merges(docs, rounds=2).collect()
    assert (out[0].sym1, out[0].sym2) == ("a", "a")
    # round 2: 'aaa' is now <aa><a> -> pair (aa, a) weight 2; 'ba' has
    # (b, a) weight 1 -> (aa, a) wins
    assert (out[1].sym1, out[1].sym2, out[1].pair_weight) == ("aa", "a", 2)


def test_bpe_vocab_exhaustion_stops_early(spark):
    """When a round finds no adjacent pair the loop must STOP (fewer rows
    than requested), not crossJoin an empty winner and silently empty the
    vocab (r6 ADVICE). 'ab' exhausts after one merge; asking for 4 rounds
    returns exactly 1 rule."""
    docs = spark.createDataFrame([Row(text="ab ab")])
    out = cp.bpe_learn_merges(docs, rounds=4).collect()
    assert [(r.bpe_round, r.merged, r.pair_weight) for r in out] == [
        (1, "ab", 2)
    ]
    # all-single-symbol vocabulary from the start: empty result, right schema
    docs1 = spark.createDataFrame([Row(text="a b c")])
    out1 = cp.bpe_learn_merges(docs1, rounds=2)
    assert out1.columns == ["bpe_round", "sym1", "sym2", "merged", "pair_weight"]
    assert out1.count() == 0


def test_paragraph_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="x y z p q r"),
            Row(doc_id=1, text="x y z different words here"),
            Row(doc_id=2, text="p q r"),
        ]
    )
    out = {
        r.doc_id: r
        for r in cp.paragraph_dedup(docs, seg_words=3).collect()
    }
    assert (out[0].n_segs, out[0].n_kept, out[0].kept_text) == (
        2, 2, "x y z p q r"
    )
    assert (out[1].n_segs, out[1].n_kept, out[1].kept_text) == (
        2, 1, "different words here"
    )
    assert (out[2].n_segs, out[2].n_kept, out[2].kept_text) == (2 - 1, 0, "")


def _lcr_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text=BASE),
            Row(doc_id=1, text=BASE),
            Row(doc_id=2, text=BASE.replace("garden", "meadow")),
            Row(
                doc_id=3,
                text="completely different content about spark engines "
                "and distributed query processing at large scale",
            ),
        ]
    )


def test_longest_common_run_digest_key_equivalent(spark):
    """gram_key='digest' (md5 join key, constant shuffle width) must
    produce the identical pair set and run lengths as the raw-gram path."""
    docs = _lcr_docs(spark)
    raw = sorted(
        (r.id_a, r.id_b, r.longest_common_tokens)
        for r in dd.longest_common_run_pairs(docs, min_run=10).collect()
    )
    dig = sorted(
        (r.id_a, r.id_b, r.longest_common_tokens)
        for r in dd.longest_common_run_pairs(
            docs, min_run=10, gram_key="digest"
        ).collect()
    )
    assert raw == dig and raw  # equivalent AND non-empty (0-1 full overlap)


def test_simhash_hot_chunk_report_counts_boilerplate(spark):
    """8 identical docs share every simhash chunk: the report must show
    all 4 chunk buckets at size 8 — exactly what a max_bucket_size<8 cap
    would drop (measured, not silent)."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=BASE) for i in range(8)]
    )
    rows = dd.simhash_hot_chunk_report(docs).collect()
    assert len(rows) == 4
    assert all(r.bucket_size == 8 for r in rows)


def test_minhash_hot_band_report_counts_boilerplate(spark):
    """Minhash-band twin of the simhash report (r6 VERDICT symmetry item):
    6 identical docs agree on every band, so all 16 band buckets must show
    size 6 — the load a max_bucket_size<6 cap would drop, measured."""
    docs = spark.createDataFrame([Row(doc_id=i, text=BASE) for i in range(6)])
    rows = dd.minhash_hot_band_report(docs, num_hashes=64, bands=16).collect()
    assert len(rows) == 16
    assert all(r.bucket_size == 6 for r in rows)
    assert [r.bucket_size for r in rows] == sorted(
        (r.bucket_size for r in rows), reverse=True
    )


def test_suggest_simhash_cap_budget_and_healthy(spark):
    """Work-budget pre-flight: a boilerplate-heavy corpus (100 identical
    docs) with a 2048-pair-per-bucket budget must suggest the budgeted
    cap (isqrt(2*2048) = 64) BELOW the hot-bucket size; a small
    all-distinct corpus must suggest None (no silent cap on healthy
    data); and max_bucket_size='auto' on the healthy corpus must equal
    the uncapped pair set exactly."""
    hot = spark.createDataFrame(
        [Row(doc_id=i, text=BASE) for i in range(100)]
        + [
            Row(
                doc_id=100 + i,
                text=f"unique document number {i} with its own words "
                f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}",
            )
            for i in range(5)
        ]
    )
    cap = dd.suggest_simhash_cap(hot, max_pairs_per_bucket=2048)
    assert cap == 64

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
    assert dd.suggest_simhash_cap(healthy) is None
    auto = sorted(
        (r.id_a, r.id_b)
        for r in dd.simhash_near_dup_pairs(
            healthy, max_bucket_size="auto"
        ).collect()
    )
    exact = sorted(
        (r.id_a, r.id_b)
        for r in dd.simhash_near_dup_pairs(healthy).collect()
    )
    assert auto == exact
