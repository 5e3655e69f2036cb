"""Composite corpus-cleaning pipeline — the end-to-end shape of a
training-data preparation job: text features → quality filter → exact dedup →
near-dup removal.

Each stage is one of the engine's tested operators; this module owns the
composition and the survivor policy (min doc_id wins, matching the dedup
operators). Stage order matters at scale: cheap row-local filters first
(quality — a projection), then the digest group-by (exact dedup — one
shuffle of digests), then MinHash LSH only over the survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.functions.text import quality_score
from soict20221_bigdata_financialplatform_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
)


def quality_filter(
    docs: DataFrame, text_col: str = "text", min_quality: float = 0.5
) -> DataFrame:
    """Row-local quality gate — runs inside the scan's codegen stage."""
    return docs.where(quality_score(text_col) >= min_quality)


def drop_exact_dups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the minimum-id representative of every distinct text."""
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, on=id_col, how="left_semi")


def drop_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Remove the higher-id member of every near-duplicate pair (transitive
    chains collapse toward the smallest id over iterations; one pass is the
    standard practical policy)."""
    pairs = minhash_near_dup_pairs(
        docs, text_col, id_col,
        num_hashes=num_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")


def train_test_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    test_fraction: float = 0.1,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, key-stable train/test split: bucket = hash(id, seed)
    mod 10^6; test = the lowest ``test_fraction`` of bucket space.

    Key-stable means a document keeps its side across runs AND across corpus
    versions (no ``rand()``, no count-dependent quantiles) — the property
    that prevents train/test leakage when the corpus is re-built. Returns
    (train, test); provably disjoint and covering."""
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    cut = int(test_fraction * 1_000_000)
    test = docs.where(bucket < cut)
    train = docs.where(bucket >= cut)
    return train, test


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    fractions: dict | None = None,
    default_fraction: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): the corpus-balancing
    primitive (e.g. downsample dominant languages). Seeded → reproducible."""
    if fractions is None:
        values = [r[0] for r in docs.select(strata_col).distinct().collect()]
        fractions = {v: default_fraction for v in values}
    return docs.sampleBy(strata_col, fractions, seed=seed)


def profile(docs: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Data-quality profile in ONE aggregation pass: per column — null count,
    exact distinct count, and for string columns min/max length. Long-format
    output (col_name, n_null, n_distinct, min_len, max_len)."""
    cols = cols or docs.columns
    dtypes = dict(docs.dtypes)
    pieces = []
    for c in cols:
        is_str = dtypes[c] == "string"
        pieces.append(
            docs.agg(
                F.lit(c).alias("col_name"),
                F.count(F.when(F.col(c).isNull(), 1)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                (F.min(F.length(c)) if is_str else F.lit(None).cast("int")).alias("min_len"),
                (F.max(F.length(c)) if is_str else F.lit(None).cast("int")).alias("max_len"),
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """quality gate → exact dedup → near-dup removal."""
    out = quality_filter(docs, text_col, min_quality)
    out = drop_exact_dups(out, text_col, id_col)
    out = drop_near_dups(out, text_col, id_col, jaccard_threshold)
    return out
