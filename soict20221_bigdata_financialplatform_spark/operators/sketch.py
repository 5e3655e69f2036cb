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

    Unlike GK/Misra-Gries (rows-only — their internals are
    engine-specific), the CM sketch IS cross-engine checkable: the hash
    family is the md5-prefix trick (seed-prefixed, mod width), so DuckDB
    builds the bit-identical counter matrix and takes the same mins. The
    md5 family also oracle-checks HLL (:func:`hll_md5_registers`, q186)
    and the sampled-quantile sketch (:func:`md5_bernoulli_sample`, q187).

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


def cms_matrix_by(
    df: DataFrame, col: str, part_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Per-partition CM counter matrices — :func:`cms_matrix` keyed by
    ``part_col`` (a source, a day, an ingest shard): ≤ depth×width rows
    PER partition value, the state an incremental pipeline stores per
    batch and later sums with :func:`cms_union`. Returns
    (part, __s, __b, __c)."""
    rows = F.array(*[F.lit(s) for s in range(depth)])
    return (
        df.select(F.col(part_col).alias("part"), col)
        .select("part", col, F.explode(rows).alias("__s"))
        .select("part", "__s", _cms_bucket(col, width).alias("__b"))
        .groupBy("part", "__s", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def cms_union(matrices: DataFrame) -> DataFrame:
    """Sum a STACK of per-partition CM matrices (the
    :func:`cms_matrix_by` output, any number of parts) into one matrix:
    counter addition is exactly the sketch of the unioned stream —
    sketch(∪ᵢ Aᵢ) == Σᵢ sketch(Aᵢ), the additive-mergeable property the
    q233 oracle checks cell-by-cell. One ≤ depth×width-row grouped
    SUM."""
    return (
        matrices.groupBy("__s", "__b")
        .agg(F.sum("__c").cast("long").alias("__c"))
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


def hll_store_update(
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    col: str,
    m: int = 16,
) -> None:
    """foreachBatch body for INCREMENTAL HLL maintenance over a stream —
    the MAX-mergeable twin of :func:`cms_store_update` (additive): write
    this micro-batch's 16-register state under its ``batch_id`` partition
    with dynamic partition overwrite, so a replayed batch overwrites its
    own partition (idempotent; and unlike a counter sketch, HLL's MAX
    merge would even tolerate double-counting — max is idempotent — the
    overwrite just keeps the store canonical). Read back with
    :func:`hll_store_registers` → :func:`hll_md5_estimate`. On-disk
    state is ≤ batches·m tiny rows."""
    regs = hll_md5_registers(batch, col, m=m).withColumn(
        "batch_id", F.lit(int(batch_id))
    )
    (
        regs.write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(store_path)
    )


def hll_store_registers(spark, store_path: str) -> DataFrame:
    """The current global HLL register state: key-wise MAX of every
    per-batch state in the store (:func:`hll_union`)."""
    return hll_union(spark.read.parquet(store_path))


# ---------------------------------------------------------------------------
# HyperLogLog with the md5-prefix hash family — the SECOND oracle-able sketch
# ---------------------------------------------------------------------------

# Scale factor for the harmonic-mean denominator: every register term
# 2^(-M) is carried as the exact integer 2^(CAP - M), so the denominator is
# an exact BIGINT sum (order-independent — zero float-sum parity risk) and
# 2^(-M) only turns into a double at the single final division. CAP=48
# keeps the max term (empty register, M=0) at 2^48 and the m-register sum
# under 2^53 for m <= 16 — exactly representable AND far from BIGINT
# overflow at any corpus size (the sum depends on m, never on rows).
_HLL_CAP = 48
_HLL_REST_BITS = 56  # 60-bit md5 prefix minus the 4 register-index bits


def hll_md5_registers(
    df: DataFrame, col: str, m: int = 16
) -> DataFrame:
    """HyperLogLog register state (Flajolet et al. 2007) with the md5-prefix
    hash family: h = first 15 md5 hex chars as a 60-bit int, register =
    h mod m, rho = leading-zero rank of the remaining 56 bits (via
    ``length(bin(rest))`` — both engines print minimal binary), register
    value = max rho. Returns ALL ``m`` rows (empty registers as 0), so two
    sketches merge by key-wise MAX — the mergeable-summary property the
    pytest pins.

    Unlike ``approx_count_distinct`` (q87 — engine-internal HLL++, rows-only
    forever), every piece here is deterministic and cross-engine: q186's
    DuckDB oracle rebuilds the full register state AND the estimate
    bit-identically, making HLL the second fully oracle-checked sketch
    after the q134 Count-Min. Scale: one grouped MAX over m registers —
    map-side combine collapses each partition to <= m rows before a tiny
    shuffle; state is m integers regardless of corpus size."""
    assert m == 16, "register-index arithmetic is pinned to m=16 (4 bits)"
    spark = df.sparkSession
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    hashed = df.select(h.alias("__h")).select(
        F.pmod(F.col("__h"), F.lit(m)).alias("register"),
        F.shiftright(F.col("__h"), 4).alias("__rest"),
    )
    rho = F.when(
        F.col("__rest") > 0,
        F.lit(_HLL_REST_BITS) - F.length(F.bin("__rest")) + F.lit(1),
    ).otherwise(F.lit(_HLL_REST_BITS + 1))
    present = (
        hashed.select("register", rho.alias("__rho"))
        .groupBy("register")
        .agg(F.max("__rho").alias("__mx"))
    )
    allregs = spark.range(m).select(F.col("id").alias("register"))
    return allregs.join(present, "register", "left").select(
        "register",
        F.coalesce(F.col("__mx"), F.lit(0)).cast("long").alias("m_reg"),
    )


def hll_md5_estimate(regs: DataFrame, m: int = 16) -> DataFrame:
    """One-row (hll_est, n_zero_regs) from a register frame: harmonic-mean
    raw estimate with the standard small-range linear-counting correction.
    Float policy: the denominator is an exact integer sum (see _HLL_CAP);
    alpha·m²·2^CAP is embedded as ONE pre-folded literal so both engines
    start from the identical double; ln (small-range branch only) is
    rounded at the transcendental."""
    assert m == 16
    alpha_num = 4.84947607875255e16  # 0.673 * 256.0 * 2^48, pre-folded
    # pyspark's F.shiftleft only takes a literal bit count — the per-row
    # shift goes through the SQL expression form
    scaled = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"CAST({_HLL_CAP} - LEAST(m_reg, {_HLL_CAP}) AS INT))"
    )
    s = regs.agg(
        F.sum(scaled).cast("long").alias("__ssum"),
        F.sum(F.when(F.col("m_reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_regs"),
    )
    raw = F.lit(alpha_num) / F.col("__ssum")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero_regs") > 0),
        F.lit(float(m)) * F.round(F.log(F.lit(float(m)) / F.col("n_zero_regs")), 6),
    ).otherwise(raw)
    return s.select(est.alias("hll_est"), "n_zero_regs")


def hll_md5_registers_by(
    df: DataFrame, col: str, part_col: str, m: int = 16
) -> DataFrame:
    """Per-partition HLL register state — ``hll_md5_registers`` keyed by
    ``part_col`` (a day, a shard, a source): one DENSE m-row register frame
    per partition value, the shape an incremental pipeline stores per
    ingest batch and later MAX-merges with ``hll_union``. Returns
    (part, register, m_reg). Scale: grouped MAX with map-side combine —
    each executor partition collapses to ≤ m rows per part before the
    shuffle; the densify join runs on the (parts × m) frame, bounded by
    partition-key cardinality, never the data."""
    assert m == 16, "register-index arithmetic is pinned to m=16 (4 bits)"
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(F.col(part_col).alias("part"), h.alias("__h")).select(
        "part",
        F.pmod(F.col("__h"), F.lit(m)).alias("register"),
        F.shiftright(F.col("__h"), 4).alias("__rest"),
    )
    rho = F.when(
        F.col("__rest") > 0,
        F.lit(_HLL_REST_BITS) - F.length(F.bin("__rest")) + F.lit(1),
    ).otherwise(F.lit(_HLL_REST_BITS + 1))
    present = (
        hashed.select("part", "register", rho.alias("__rho"))
        .groupBy("part", "register")
        .agg(F.max("__rho").alias("__mx"))
    )
    spark = df.sparkSession
    allregs = (
        df.select(F.col(part_col).alias("part"))
        .distinct()
        .crossJoin(
            F.broadcast(spark.range(m).select(F.col("id").alias("register")))
        )
    )
    return allregs.join(present, ["part", "register"], "left").select(
        "part",
        "register",
        F.coalesce(F.col("__mx"), F.lit(0)).cast("long").alias("m_reg"),
    )


def hll_union(regs: DataFrame) -> DataFrame:
    """MAX-merge a stack of HLL register frames (any rows carrying
    (register, m_reg) — e.g. ``hll_md5_registers_by`` output across days)
    into ONE register frame, the mergeable-summary property that makes HLL
    a distributed sketch at all: union-of-sketches == sketch-of-union,
    exactly, because each register is a max. Feed the result to
    ``hll_md5_estimate``. Scale: one m-row grouped MAX."""
    return regs.groupBy("register").agg(
        F.max("m_reg").cast("long").alias("m_reg")
    )


def md5_bernoulli_sample(
    df: DataFrame, key_cols: list[str] | tuple, denom: int = 16
) -> DataFrame:
    """Deterministic hash-Bernoulli sample (rate 1/denom) keyed on the md5
    prefix of the row's unique key — the sampling primitive behind the
    q187 quantile sketch. Key-stable (a row keeps its fate across runs AND
    across corpus versions — no rand(), no RNG state to replay) and
    trivially mergeable: sample(A ∪ B) = sample(A) ∪ sample(B) because
    membership is a per-row predicate. Cross-engine exact: DuckDB computes
    the identical member set from the same md5 prefix. Scale: a pure scan
    predicate — no shuffle, works at any cardinality, composes with
    partition pruning."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return df.where(F.pmod(h, F.lit(denom)) == 0)
