"""Orderless table checksums — the data-reconciliation primitive for
comparing replicas/snapshots across systems without sorting or moving
either side: each row hashes to a 60-bit integer, and the table
fingerprint is the SUM (commutative, so partitioning and row order
can't change it) plus the row count.

Scale shape: map-only hash + one global ungrouped aggregate whose
shuffle is one partial row per task — the cheapest possible full-table
operation. For targeted diffs, `grouped_checksum` keys the same hash
sum by a bucket column so two sides can binary-search a mismatch down
to a bucket without exchanging data.

Cross-engine notes: the row hash is md5-hex (identical everywhere);
the 15-hex-char slice keeps the value in 60 bits so BIGINT conversion
is exact in any engine; float columns should be cast to fixed DECIMAL
by the caller first — raw double-to-string rendering is not portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\\N"


def row_hash(cols: list[Column]) -> Column:
    """60-bit integer hash of the row's canonical string form."""
    canon = F.concat_ws(
        "|", *[F.coalesce(c.cast("string"), F.lit(NULL_SENTINEL)) for c in cols]
    )
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """(n_rows, checksum) — one row; checksum as string (38-digit
    decimal exceeds bigint)."""
    h = row_hash([F.col(c) for c in cols])
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).cast("decimal(38,0)").cast("string").alias("checksum"),
    )


def grouped_checksum(df: DataFrame, bucket: Column, cols: list[str]) -> DataFrame:
    """Per-bucket (n_rows, checksum): compare bucket rows between two
    sides to localize a divergence without a full-data diff."""
    h = row_hash([F.col(c) for c in cols])
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(h).cast("decimal(38,0)").cast("string").alias("checksum"),
        )
    )
