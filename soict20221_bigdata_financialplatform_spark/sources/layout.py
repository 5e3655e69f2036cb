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
