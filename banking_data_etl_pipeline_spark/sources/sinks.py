"""Layout-managed sinks: the write-side half of the 100 TB posture.

A table that will be read selectively should be WRITTEN for those
reads: hive-style partition directories turn query predicates into
directory pruning (the scan never opens non-matching files), an
explicit ``repartition`` on the partition key bounds the file count
(without it every task writes a file per partition value — the classic
small-files explosion), and ``sortWithinPartitions`` gives parquet
min/max row-group statistics their selectivity for range predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as hive-partitioned parquet with bounded file
    counts and optional within-file ordering.

    ``files_per_partition=1`` clusters each partition value into one
    task -> one file. For partition values too large for a single task
    (skewed event types at 100 TB), raise it: a salt column spreads
    each value over that many tasks/files, still directory-pruned."""
    if files_per_partition <= 1:
        out = df.repartition(*[F.col(c) for c in partition_by])
    else:
        salt = (F.rand(seed=7) * files_per_partition).cast("int")
        out = df.withColumn("_salt", salt).repartition(
            *[F.col(c) for c in partition_by], F.col("_salt")
        ).drop("_salt")
    if sort_by:
        out = out.sortWithinPartitions(*partition_by, *sort_by)
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; predicates on the partition column
    become PartitionFilters (verify via .explain — no data files from
    non-matching partitions are opened)."""
    return spark.read.parquet(path)
