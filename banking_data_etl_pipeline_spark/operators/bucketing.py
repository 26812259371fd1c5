"""Bucketed-table helpers: pre-shuffle data ONCE at write time so
every later equi-join/aggregation on the bucket key is shuffle-free.

At 100 TB this is the difference between re-shuffling the fact table
per query and reading co-located buckets: `write_bucketed` pays one
shuffle at ingest; subsequent joins between tables bucketed on the
same key (same bucket count) plan as SortMergeJoin with NO Exchange on
either side (asserted in tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on ``key``."""
    w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
