"""Schema evolution on read: long-lived tables accumulate writer
generations (columns added over time), and the scan must present one
unified schema without rewriting history.

Parquet + ``mergeSchema`` handles the additive case natively: new
columns surface as nulls on old files, and column pruning still works
per file. The helpers below make the policy explicit and auditable:

- ``read_evolved``: merge all generations' schemas (additive-only —
  the parquet reader refuses incompatible type changes, which is the
  behavior you want: silent coercion hides corruption).
- At 100 TB, schema merging costs one footer read PER FILE at
  planning; pin the CURRENT schema with ``spark.read.schema(...)``
  once it stabilizes (the fast path — no footer sampling), and fall
  back to merge only in migration windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read one-or-more parquet generations under the union of their
    schemas; columns absent in a generation read as null."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
