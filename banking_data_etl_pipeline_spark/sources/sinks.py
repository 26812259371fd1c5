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


def zorder_key(a, b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns,
    JVM-side: bit i of each input lands at bits 2i / 2i+1 of the key.
    Inputs must already be quantized to ``bits`` bits (rank or
    fixed-width bucket them first).

    The expression is 2*bits constant shifts — folded into one
    codegen'd expression, no UDF."""
    key = F.lit(0).cast("long")
    av = a.cast("long")
    bv = b.cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(av, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str,
    files: int = 8, bits: int = 16,
) -> None:
    """Write parquet clustered on the Z-curve of two columns: range-
    partition on the interleaved key, sort within partitions. Each
    output file then covers a bounded RECTANGLE in (a, b) space — so
    parquet min/max row-group stats prune scans filtered on EITHER
    column, which a single-column sort only gives you for its leading
    column. This is the data-skipping layout for the two-predicate
    scan pattern (e.g. time × tenant).

    Inputs are QUANTIZED here before interleaving (fixed-width bucket
    to ``bits`` bits from each column's observed min/max — an identity
    mapping when the column already fits): ``zorder_key`` silently
    drops bits above ``bits``, which would collapse distant values
    onto one Morton key and void the bounded-rectangle property. The
    min/max pull is two scalars per column — model-parameter scale,
    same budget class as PageRank's node count."""
    # persist: the min/max scalar pull and the write are two actions
    # over the same (possibly expensive) input plan
    df = df.persist()
    mm = df.agg(
        F.min(col_a).alias("a_mn"), F.max(col_a).alias("a_mx"),
        F.min(col_b).alias("b_mn"), F.max(col_b).alias("b_mx"),
    ).collect()[0]
    if None in (mm.a_mn, mm.a_mx, mm.b_mn, mm.b_mx):
        # empty input or an all-NULL cluster column: no quantization
        # domain exists — write the plain layout rather than crash (a
        # scheduled job's no-data day must still produce its output)
        df.write.mode("overwrite").parquet(path)
        df.unpersist()
        return

    def quantized(c: str, mn, mx) -> F.Column:
        # power-of-two bucket width -> the quantization is an exact
        # integer shiftright (double division would round above 2^53);
        # shift 0 (identity) when the span already fits in ``bits``
        span = int(mx) - int(mn) + 1
        shift = max(0, (span - 1).bit_length() - bits)
        base = F.coalesce(F.col(c), F.lit(int(mn))).cast("long") - F.lit(int(mn))
        return F.shiftright(base, shift)

    z = zorder_key(
        quantized(col_a, mm.a_mn, mm.a_mx),
        quantized(col_b, mm.b_mn, mm.b_mx),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    df.unpersist()


def compact(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(n / target_rows_per_file)`` files and atomically swap it in.
    Returns the new file count.

    The small-files problem is the classic slow killer of streaming
    sinks and over-parallel writers (every file costs a task + a
    metadata op per downstream scan); periodic compaction is the
    standard fix. The rewrite is one shuffle-free coalesce when
    shrinking.

    Swap semantics, honestly stated: plain POSIX cannot exchange two
    directories atomically, so there is a sub-millisecond window
    between the two renames in which ``path`` does not exist and a
    concurrent open fails (a reader mid-scan of already-opened files
    is unaffected; it never sees a MIX of layouts). Crash recovery is
    handled at entry instead of pretending the window away: a crash
    inside the window leaves ``path`` missing and ``.old`` intact, and
    the next call restores it; stale ``.old``/``.compact_tmp``
    leftovers from any earlier crash are cleared so reruns cannot fail
    on ENOTEMPTY. Single-compactor discipline assumed (run it from one
    scheduler slot). For readers that cannot tolerate the window, use
    the versioned-directory + pointer-file protocol in
    ``streaming.upsert`` — at the price of pointer-aware reads."""
    import math
    import os
    import shutil

    old = path + ".old"
    tmp = path + ".compact_tmp"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # crashed inside a previous swap window
    shutil.rmtree(tmp, ignore_errors=True)  # half-written rewrite
    shutil.rmtree(old, ignore_errors=True)  # superseded layout

    df = spark.read.parquet(path)
    n = df.count()
    files = max(1, math.ceil(n / target_rows_per_file))
    df.coalesce(files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return files


def zorder_layout_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    buckets_log2: int = 4,
) -> DataFrame:
    """The data-skipping proof behind ``write_zordered``, as a query:
    quantize both cluster columns exactly as the writer does, interleave
    into the Morton key, split the curve into ``2**buckets_log2``
    FIXED-WIDTH key ranges (deterministic — unlike
    ``repartitionByRange``'s sampled boundaries, so the result is
    oracle-checkable), and report each bucket's bounding rectangle in
    quantized (a, b) space plus its row count.

    Why it matters at 100 TB: each bucket stands for one output file's
    min/max footer stats; the tighter the rectangles, the more files a
    two-predicate scan can skip. The whole computation is one scalar
    min/max pull (model-parameter scale) + one map pass + a groupBy on
    <= 2**buckets_log2 keys — map-side combine collapses every
    partition to a handful of rows before the shuffle.

    Returns (bucket, n_rows, a_min, a_max, b_min, b_max)."""
    mm = df.agg(
        F.min(col_a).alias("a_mn"), F.max(col_a).alias("a_mx"),
        F.min(col_b).alias("b_mn"), F.max(col_b).alias("b_mx"),
    ).collect()[0]
    if None in (mm.a_mn, mm.a_mx, mm.b_mn, mm.b_mx):
        raise ValueError("zorder_layout_stats: empty input or all-NULL "
                         "cluster column — no quantization domain")

    def quantized(c: str, mn, mx) -> F.Column:
        shift = max(0, (int(mx) - int(mn)).bit_length() - bits)
        base = F.coalesce(F.col(c), F.lit(int(mn))).cast("long") - F.lit(int(mn))
        return F.shiftright(base, shift)

    qa = quantized(col_a, mm.a_mn, mm.a_mx)
    qb = quantized(col_b, mm.b_mn, mm.b_mx)
    z = zorder_key(qa, qb, bits)
    bucket = F.shiftright(z, 2 * bits - buckets_log2)
    return (
        df.select(bucket.alias("bucket"), qa.alias("_qa"), qb.alias("_qb"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_qa").alias("a_min"),
            F.max("_qa").alias("a_max"),
            F.min("_qb").alias("b_min"),
            F.max("_qb").alias("b_max"),
        )
    )


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> str:
    """Write ``df`` as a BUCKETED parquet table (hash-clustered into
    ``n_buckets`` files per task-set on ``bucket_col``, sorted within
    buckets) and register it in the catalog — the write-side half of
    the shuffle-free join: two tables bucketed the same way on their
    join key sort-merge-join WITHOUT EXCHANGING EITHER SIDE, because
    the hash-clustering the shuffle would produce is already baked
    into the files. At 100 TB this converts every repeated fact⋈fact
    join on the bucket key from two full-table shuffles into a
    per-bucket streamed merge (AND pre-sorts the merge input); the
    write itself needs NO shuffle either — each task hash-splits its
    rows across its own bucket files.

    Bucket metadata lives in the CATALOG, not the files (a plain
    ``spark.read.parquet`` of the same path would forget the
    clustering and re-shuffle), which is why this writer takes the
    session and returns the table name. Idempotent per session: an
    already-registered ``table`` is reused as-is (the build-once /
    join-many lifecycle, same shape as the prebuilt IVF index)."""
    if spark.catalog.tableExists(table):
        return table
    (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .saveAsTable(table)
    )
    return table
