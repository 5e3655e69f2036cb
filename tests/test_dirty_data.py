"""Dirty-data hardening: NULL/empty inputs must not kill distributed jobs.

The parity gate can never catch this class — the driver testdata carries no
NULLs (the r10 ADVICE observation that motivated the Gram-pass NULL guard).
At 100 TB a single dirty row that throws inside a stage kills the whole job,
so every library entry point a pipeline feeds raw data into is pinned here:
either it processes dirty rows with sane semantics or it excludes them, but
it never crashes, and excluding them never changes the clean rows' results.

(The one deliberate exception stays: ``ema_segmented`` documents that NULL
values RAISE, because pandas ewm renormalizes decay across NaN gaps and
would silently break the seed-chain algebra — densify first.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from soict20221_bigdata_financialplatform_spark.operators import (
    corpus,
    dedup,
    multimodal as mm,
    similarity as sim,
)

DOC_SCHEMA = "doc_id long, text string"
EMB_SCHEMA = "vec_id long, embedding array<float>"


@pytest.fixture()
def dirty_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "the quick brown fox jumps over the lazy dog again and again today"),
            (3, None),
            (4, ""),
            (5, "   "),
            (6, "completely different text about financial markets and volume"),
        ],
        DOC_SCHEMA,
    )


@pytest.fixture()
def emb_frames(spark):
    clean = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 10) / 10.0 for j in range(4)])
         for i in range(20)],
        EMB_SCHEMA,
    )
    dirty = clean.unionByName(
        spark.createDataFrame([(99, None), (98, None)], EMB_SCHEMA)
    )
    return clean, dirty


def test_exact_dedup_null_and_empty_text(dirty_docs):
    """NULL text is not a dup of empty text: the digest groupBy keys on
    md5(text), NULL hashes to NULL (its own group, distinct from the
    empty and whitespace digests), the (1,2) dup pair collapses to its
    min-id survivor, and nothing throws."""
    out = {r.keep_id: r.n_copies for r in dedup.exact_dedup(dirty_docs).collect()}
    assert out == {1: 2, 3: 1, 4: 1, 5: 1, 6: 1}


def test_minhash_simhash_pair_mining_tolerates_dirty_docs(dirty_docs):
    """Banded pair mining over NULL/empty docs must not throw, and the
    real near-dup pair must still be found. Empty/NULL docs may
    legitimately band-collide with each other (zero-shingle signatures
    are all equal — the hot-band cap bounds that bucket at scale) but
    must never pair with a real document."""
    for pairs in (
        dedup.minhash_near_dup_pairs(dirty_docs),
        dedup.minhash_md5_pairs(dirty_docs),
        dedup.simhash_near_dup_pairs(dirty_docs),
    ):
        got = {(r[0], r[1]) for r in pairs.select(pairs.columns[:2]).collect()}
        assert (1, 2) in got or (2, 1) in got
        degenerate = {3, 4, 5}
        for a, b in got:
            real = {a, b} - degenerate
            assert real <= {1, 2} or not ({a, b} & degenerate), (
                f"dirty doc paired with a real one: {(a, b)}"
            )


def test_clean_corpus_drops_dirty_keeps_survivor(dirty_docs):
    """The full cleaning composite on dirty input: quality gate removes
    NULL/empty rows (no tokens -> no score), dedup keeps one of the
    identical pair, and nothing throws."""
    out = corpus.clean_corpus(dirty_docs, min_quality=0.1,
                              jaccard_threshold=0.8)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids <= {1, 2, 6} and 6 in ids and len(ids & {1, 2}) == 1


def test_ivf_topk_null_corpus_rows_excluded(spark, emb_frames):
    """MLlib KMeans.fit throws FAILED_EXECUTE_UDF on a NULL feature row —
    one dirty row would kill the whole training job. ivf_topk drops NULL
    embeddings up front; results over (clean ∪ NULLs) must equal results
    over clean alone."""
    clean, dirty = emb_frames
    queries = spark.createDataFrame(
        [(0, [0.5, 0.4, 0.3, 0.2])], "query_id long, embedding array<float>"
    )
    res = lambda c: sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in sim.ivf_topk(c, queries, k=3, nlist=4).collect()
    )
    assert res(dirty) == res(clean)


def test_brute_force_topk_null_rows_sink(spark, emb_frames):
    """The exact scorer keeps NULL rows but their score is NULL, which
    sorts below every real score — the top-k never surfaces them."""
    clean, dirty = emb_frames
    queries = spark.createDataFrame(
        [(0, [0.5, 0.4, 0.3, 0.2])], "query_id long, embedding array<float>"
    )
    got = sim.brute_force_topk(dirty, queries, k=3).collect()
    assert len(got) == 3
    assert all(r.vec_id not in (98, 99) for r in got)
    assert all(r.score is not None for r in got)


def test_kmeans_lloyd_det_ignores_null_rows(spark, emb_frames):
    """The deterministic Lloyd trainer (the oracle-checked IVF/PQ/SemDeDup
    foundation) must produce BIT-IDENTICAL centroids with NULL rows
    present — NULL assignments fall out of the argmin groupBy."""
    clean, dirty = emb_frames
    init = clean.where("vec_id < 4").select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    cents = lambda c: sorted(
        (r[0], tuple(r[1])) for r in sim.kmeans_lloyd_det(c, init).collect()
    )
    assert cents(dirty) == cents(clean)


def test_decode_image_features_null_and_garbage_content(spark):
    """The multimodal decode path must emit a decoded=false row for NULL
    and garbage blobs (per-row try + content-or-empty), never throw."""
    media = spark.createDataFrame(
        [(1, None, "image", "bmp", 2, 2),
         (2, b"", "image", "bmp", 0, 0),
         (3, b"\x00\x01garbage-not-an-image", "image", "png", 0, 0)],
        "media_id long, content binary, kind string, format string, "
        "width int, height int",
    )
    rows = {r.media_id: r for r in mm.decode_image_features(media).collect()}
    assert set(rows) == {1, 2, 3}
    assert not any(r.decoded for r in rows.values())
