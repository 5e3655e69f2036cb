"""Storage-layout helpers: the physical design knobs (SURVEY §1.3/§4).

Two layouts the engine writes:

1. **Partition + sort** (`write_partitioned_sorted`): one directory per
   partition key value, rows sorted within files on the clustering column —
   partition pruning + row-group min/max pruning on reads. The parquet
   reproduction of Cassandra's ``PRIMARY KEY (SYMBOL, TIME)``.
2. **Bucketed tables** (`write_bucketed`): hash-bucket both sides of a
   recurring join on the join key; Spark's bucketing metadata lets the join
   run with NO exchange on either side — the 100 TB answer to "this join
   shuffles 10 TB every night". Requires ``saveAsTable`` (bucket info lives
   in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_col: str,
    sort_cols: list[str],
    mode: str = "overwrite",
) -> None:
    (
        df.repartition(partition_col)
        .sortWithinPartitions(partition_col, *sort_cols)
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted catalog table on the join key."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def morton_key(col_a, col_b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative integer columns into
    one clustering key — ``bits`` low bits of each input, alternated
    a15 b15 a14 b14 … — as a pure JVM expression tree (shiftleft/or, no
    UDF). Sorting by this key keeps rows that are close in EITHER dimension
    physically close, so parquet min/max stats prune files/row-groups for
    predicates on a, on b, or on both — the multi-dimensional data-skipping
    layout a single-column sort cannot give."""
    from pyspark.sql import functions as F

    acc = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        abit = F.shiftright(col_a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(col_b.cast("long"), i).bitwiseAND(F.lit(1))
        acc = F.shiftleft(acc, 2).bitwiseOR(F.shiftleft(abit, 1)).bitwiseOR(bbit)
    return acc


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: range-partition on the Morton key (each
    output file owns a contiguous Z-curve segment — a small rectangle-ish
    region of (a, b) space), sort within files so row groups subdivide it.
    At 100 TB this is the layout for "filter by user AND by time" workloads
    where partitioning can only serve one of the two dimensions. The key is
    computed once per row at write; reads need no knowledge of it (pruning
    works off the per-file a/b min-max stats parquet already keeps)."""
    from pyspark.sql import functions as F

    zkey = morton_key(F.col(col_a), F.col(col_b), bits).alias("__zkey")
    (
        df.withColumn("__zkey", zkey)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def compact_partitioned(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    partition_cols: list[str],
    rows_per_file: int = 1_000_000,
) -> None:
    """Small-file compaction for a partitioned parquet dataset: rewrite each
    partition directory into at most ``ceil(rows / rows_per_file)`` files
    (slots that hash to the same task merge — strictly fewer, never more).

    Incremental pipelines (micro-batch appends, per-day merges) fragment
    partitions into thousands of tiny files; at 100 TB the scan's task-setup
    and footer-read overhead then dominates. This rewrites with exactly one
    shuffle: per-partition row counts (an aggregate of partition keys only —
    tiny) broadcast back, every row gets a deterministic file slot
    ``xxhash64(row) mod n_files``, and one hash repartition on
    (partition, slot) lands each output file in exactly one task. No
    collect, no per-partition driver loop; skew is impossible by
    construction (slots are uniform within a partition).

    Writes to ``out_path`` (copy-compact); compact-in-place should stage
    and swap — self-overwrite of a dataset being read is not defined in
    Spark's commit protocol.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(in_path)
    data_cols = [c for c in df.columns if c not in partition_cols]
    counts = (
        df.groupBy(*partition_cols)
        .count()
        .withColumn(
            "__nf",
            F.greatest(
                F.lit(1), F.ceil(F.col("count") / rows_per_file)
            ).cast("int"),
        )
        .drop("count")
    )
    slotted = (
        df.join(F.broadcast(counts), partition_cols)
        .withColumn(
            "__slot", F.pmod(F.xxhash64(*data_cols), F.col("__nf"))
        )
    )
    (
        slotted.repartition(*partition_cols, "__slot")
        .drop("__nf", "__slot")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(out_path)
    )
