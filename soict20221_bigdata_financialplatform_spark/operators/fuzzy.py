"""Blocked fuzzy matching (entity resolution) — find value pairs within
edit distance without the all-pairs cross join.

The scale design is DICTIONARY-FIRST: real corpora repeat their dirty
strings (names, titles, vendor labels) millions of times, so the operator

  1. collapses the column to its DISTINCT values + occurrence counts
     (one shuffle on the value — the dictionary is usually orders of
     magnitude smaller than the row count);
  2. assigns each dictionary entry a cheap BLOCKING key (default: last
     whitespace token — product type / surname-shaped); candidate pairs
     are an EQUI-join on the block key, never a cross join (invariant:
     OR-of-equalities / theta joins plan BroadcastNestedLoopJoin);
  3. scores candidates with ``levenshtein`` (JVM builtin, codegen) and
     keeps pairs within ``max_dist``, ordered pairs ``a < b`` so each
     unordered pair appears once;
  4. (caller-side) maps matches back onto rows with a broadcast join of
     the (value -> canonical) mapping — the dictionary is small.

A hot block (one dominant product type) degrades to |block|^2 candidate
pairs; cap it the same way LSH buckets are capped
(``dedup.minhash_near_dup_pairs(max_bucket_size=...)``) or refine the
block key (last token + length bucket). Multi-token blocking (a pair is
a candidate if it shares ANY token) is posexplode -> equi-join on the
token -> distinct-pair collapse, exactly the q57/q64 LSH-band shape —
never an OR-condition join.

Reference parity: the reference fuzzy-matches nothing; engine-added
(large-scale-pipeline brief: entity resolution / label canonicalization
before grouping) — the q115 registry entry cross-checks the whole
pipeline against DuckDB's ``levenshtein``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token(col: Column | str) -> Column:
    """Default blocking key: the last whitespace-separated token."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, " "), -1)


def blocked_levenshtein_pairs(
    df: DataFrame,
    value_col: str,
    max_dist: int = 2,
    block_key=last_token,
    max_block_size: int | None = None,
) -> DataFrame:
    """``(value_a, value_b, dist, cnt_a, cnt_b)`` for every DISTINCT pair
    of column values sharing a block key with ``levenshtein <= max_dist``
    (``value_a < value_b``); ``cnt_*`` are row occurrence counts so the
    caller can canonicalize toward the more frequent spelling.

    ``max_block_size`` caps the quadratic hot-block failure mode exactly
    like the LSH bucket cap (``dedup.minhash_near_dup_pairs``): blocks
    with more distinct values than the cap are DROPPED from candidate
    generation (a block that big means the key under-discriminates —
    refine the key rather than pay |block|² comparisons). The cap is a
    windowless group-count semi-join, so enforcing it costs one extra
    tiny aggregate, not a shuffle of the data."""
    dic = (
        df.groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("blk", block_key("value"))
        .persist()
    )
    if max_block_size is not None:
        ok = (
            dic.groupBy("blk")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .where(F.col("__bn") <= max_block_size)
            .select("blk")
        )
        dic = dic.join(F.broadcast(ok), "blk", "left_semi")
    a = dic.select(
        F.col("blk"),
        F.col("value").alias("value_a"),
        F.col("cnt").alias("cnt_a"),
    )
    b = dic.select(
        F.col("blk"),
        F.col("value").alias("value_b"),
        F.col("cnt").alias("cnt_b"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("value_a") < F.col("value_b"))
        .withColumn("dist", F.levenshtein("value_a", "value_b"))
        .where(F.col("dist") <= max_dist)
        .select("value_a", "value_b", "dist", "cnt_a", "cnt_b")
    )


def canonicalize(
    df: DataFrame,
    value_col: str,
    max_dist: int = 2,
    block_key=last_token,
    max_block_size: int | None = None,
) -> DataFrame:
    """The full entity-resolution pass: fuzzy-match the value dictionary
    (:func:`blocked_levenshtein_pairs`), cluster matches transitively
    (pointer-doubling connected components over the pair graph), pick the
    most frequent spelling per cluster as canonical (ties → lexicographic
    min), and map every ROW to its canonical value — added as
    ``<value_col>_canonical``.

    Everything after the dictionary collapse happens on the dictionary
    (distinct values), so the row-side cost is ONE broadcast join of the
    (value -> canonical) mapping — the dictionary-first scale design end
    to end. Unmatched values are their own canonical."""
    from soict20221_bigdata_financialplatform_spark.operators.components import (
        connected_components,
    )

    dic = (
        df.groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    pairs = blocked_levenshtein_pairs(
        df, value_col, max_dist=max_dist, block_key=block_key,
        max_block_size=max_block_size,
    )
    comp = connected_components(pairs, src="value_a", dst="value_b")
    clustered = dic.join(comp, dic["value"] == comp["node"], "left").select(
        "value", "cnt", F.coalesce("component", "value").alias("cluster")
    )
    reps = clustered.groupBy("cluster").agg(
        F.min_by(
            "value", F.struct((-F.col("cnt")).alias("nc"), F.col("value"))
        ).alias("canonical")
    )
    mapping = F.broadcast(
        clustered.join(reps, "cluster").select("value", "canonical")
    )
    return df.join(
        mapping, df[value_col] == mapping["value"], "left"
    ).select(
        *df.columns,
        F.coalesce("canonical", F.col(value_col)).alias(
            f"{value_col}_canonical"
        ),
    )
