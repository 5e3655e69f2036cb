"""Frequent-items (heavy hitters) — exact and mergeable-sketch forms.

The exact form is the oracle-checkable baseline: one grouped count plus a
broadcast grand-total scalar (the q77 scalar-threshold pattern — never a
single-partition window over the grouped frame, whose distinct-item count is
unbounded at corpus scale).

The sketch form is distributed Misra-Gries (the mergeable-summaries
construction of Agarwal et al., PODS 2012): each partition maintains a
capacity-k weighted MG summary over Arrow batches, the ≤ partitions·k
partial rows merge by key-sum, and one final MG decrement restores the
global bound — any item with true frequency > n/(k+1) survives, and every
reported count is within n/(k+1) below its true count. State per partition
is O(k); nothing ever shuffles per input row. This is the 100 TB shape for
"which tokens/domains/templates dominate the corpus" (boilerplate and
stopword discovery) where the exact form's per-token shuffle is the cost.

Reference parity: the reference has no frequency analysis; this extends the
driver-brief pipeline operators alongside HLL (q87) and GK quantiles (q92).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitters_exact(
    df: DataFrame, col: str, min_frac: float = 0.005
) -> DataFrame:
    """(item, cnt, frac) for every item whose frequency ≥ ``min_frac`` of
    all rows. One grouped count (map-side combined); the grand total is an
    aggregate OF the grouped frame (no second scan) broadcast back as a
    scalar. ``frac`` is a single-op ratio of exact longs — emitted unrounded
    per the float policy."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).persist()
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(min_frac) * F.col("total"))
        .select(col, "cnt", (F.col("cnt") / F.col("total")).alias("frac"))
    )


def heavy_hitters_mg(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Capacity-``k`` distributed Misra-Gries summary: ≤ k (item,
    mg_count) rows, each mg_count an UNDER-estimate by at most n/(k+1).

    Per-partition pass is Arrow-batched: each batch collapses to its
    ``value_counts`` (vectorized) and merges into the partition's weighted
    MG dict (≤ k entries; a weighted decrement evicts the minimum mass when
    capacity overflows). Partials merge by key-sum — at most partitions·k
    rows cross the wire regardless of input size — and one final decrement
    at rank k+1 restores the mergeable-summary error bound."""
    out_field = df.schema[col]
    partial_schema = T.StructType(
        [out_field, T.StructField("mg_count", T.LongType())]
    )

    def _partition_mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts(dropna=True)
            for item, cnt in vc.items():
                summary[item] = summary.get(item, 0) + int(cnt)
            if len(summary) > k:
                # weighted decrement: remove the smallest masses until ≤ k
                # items remain, subtracting the pivot mass from survivors.
                sorted_counts = sorted(summary.values())
                pivot = sorted_counts[len(summary) - k - 1]
                summary = {
                    i: c - pivot for i, c in summary.items() if c > pivot
                }
        yield pd.DataFrame(
            {col: list(summary.keys()), "mg_count": list(summary.values())}
        )

    partials = df.select(col).mapInPandas(_partition_mg, schema=partial_schema)
    # persist: the pivot branch and the output branch both read this tiny
    # (≤ partitions·k rows) frame — without it each re-runs the full scan.
    merged = (
        partials.groupBy(col).agg(F.sum("mg_count").alias("mg_count")).persist()
    )
    # Final trim on the tiny merged frame (≤ partitions·k rows): subtract the
    # (k+1)-th largest mass so at most k items survive with the global bound.
    # orderBy().limit() plans TakeOrderedAndProject (per-partition partial
    # top-k, no single-partition WindowExec); the pivot is the minimum of the
    # top k+1 — NULL when ≤ k items survived the merge, so nothing is
    # subtracted in that case.
    top = merged.orderBy(F.desc("mg_count"), col).limit(k + 1)
    pivot = top.agg(
        F.when(F.count(F.lit(1)) > k, F.min("mg_count"))
        .otherwise(F.lit(None))
        .alias("__pivot")
    )  # exactly one row
    return (
        merged.crossJoin(F.broadcast(pivot))
        .withColumn(
            "mg_count",
            F.col("mg_count") - F.coalesce(F.col("__pivot"), F.lit(0)),
        )
        .where(F.col("mg_count") > 0)
        .select(col, "mg_count")
    )


def cms_estimates(
    df: DataFrame,
    col: str,
    query_items: DataFrame,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-Min sketch point estimates (Cormode & Muthukrishnan 2005): a
    depth×width counter matrix built in one grouped count, point queries as
    the MIN over each item's ``depth`` counters. Guarantees (pinned by
    pytest AND the q134 oracle): est ≥ true always (counters only ever
    over-count via collisions); est ≤ true + εN with probability 1−δ for
    ε = e/width, δ = e^−depth.

    Unlike HLL/GK/Misra-Gries (rows-only — their internals are
    engine-specific), the CM sketch IS cross-engine checkable: the hash
    family is the md5-prefix trick (seed-prefixed, mod width), so DuckDB
    builds the bit-identical counter matrix and takes the same mins — the
    one sketch whose whole construction has a DuckDB oracle.

    Scale shape: the matrix build explodes each row into ``depth`` (row,
    bucket) pairs and grouped-counts them — map-side combine collapses to
    ≤ depth×width rows per partition before the one tiny shuffle; the
    matrix state is depth×width counters TOTAL regardless of corpus size
    (the sketch's point). Queries hash the same way and hash-join the
    matrix; the min is a ``depth``-row groupBy per item. Merge across
    corpora/streams = add matrices (counts are additive — the mergeable-
    summary property)."""
    matrix = cms_matrix(df, col, depth=depth, width=width)
    return cms_query(matrix, query_items, col, depth=depth, width=width)


def _cms_bucket(col: str, width: int):
    # bucket(s, x) = md5-prefix("cms{s}|" + x) mod width
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.concat(F.lit("cms"), F.col("__s").cast("string")),
                        F.lit("|"),
                        F.col(col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_matrix(
    df: DataFrame, col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """The CM counter matrix as a (row, bucket, count) frame — ≤ depth×width
    rows total. MERGEABLE: the sketch of a union is the key-wise SUM of the
    two matrices (:func:`cms_merge`), which is what makes it maintainable
    incrementally over streaming micro-batches or per-shard corpora."""
    rows = F.array(*[F.lit(s) for s in range(depth)])
    return (
        df.select(col)
        .select(col, F.explode(rows).alias("__s"))
        .select("__s", _cms_bucket(col, width).alias("__b"))
        .groupBy("__s", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CM matrices (same depth/width/hash family): key-wise
    counter addition — sketch(A ∪ B) == merge(sketch(A), sketch(B))
    exactly, pinned by pytest."""
    return (
        a.unionByName(b)
        .groupBy("__s", "__b")
        .agg(F.sum("__c").alias("__c"))
    )


def cms_query(
    matrix: DataFrame,
    query_items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate read path over a prebuilt :func:`cms_matrix`."""
    rows = F.array(*[F.lit(s) for s in range(depth)])
    probes = (
        query_items.select(col)
        .select(col, F.explode(rows).alias("__s"))
        .select(col, "__s", _cms_bucket(col, width).alias("__b"))
    )
    return (
        probes.join(matrix, ["__s", "__b"])
        .groupBy(col)
        .agg(F.min("__c").alias("cms_est"))
    )


def cms_store_update(
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    col: str,
    depth: int = 4,
    width: int = 64,
) -> None:
    """foreachBatch body for INCREMENTAL CM-sketch maintenance over a
    stream: write this micro-batch's matrix under its ``batch_id``
    partition with dynamic partition overwrite — REPLAY-IDEMPOTENT (a
    redelivered batch overwrites its own partition instead of
    double-counting; the (partition, batch_id) overwrite pattern of the
    bar sink, invariant 5). The store is the set of per-batch matrices;
    :func:`cms_store_matrix` folds them by counter addition (mergeable-
    summary property) at query time — or compact periodically with the
    same groupBy. State on disk is ≤ batches·depth·width tiny rows."""
    m = cms_matrix(batch, col, depth=depth, width=width).withColumn(
        "batch_id", F.lit(int(batch_id))
    )
    (
        m.write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(store_path)
    )


def cms_store_matrix(spark, store_path: str) -> DataFrame:
    """The current global CM matrix: key-wise sum of every per-batch
    matrix in the store."""
    return (
        spark.read.parquet(store_path)
        .groupBy("__s", "__b")
        .agg(F.sum("__c").alias("__c"))
    )
