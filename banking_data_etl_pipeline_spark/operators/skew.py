"""Skew mitigation utilities.

Spark's hash aggregation already does map-side partial aggregation for
algebraic aggregates (count/sum/min/max), and AQE splits skewed join
partitions at runtime (`spark.sql.adaptive.skewJoin.enabled`, on in
session.get_spark). Explicit salting is for the cases those don't
cover: holistic aggregates (collect_list, exact distinct, percentile)
and windowed ranks over hot keys — one hot key otherwise lands on one
reducer no matter how many executors exist.

The two-phase shape below is semantics-preserving for decomposable
aggregates: phase 1 aggregates (key, salt) — the hot key spreads over
``buckets`` reducers — phase 2 merges the per-salt partials. The
result is bit-identical to the unsalted aggregate (the oracle twin IS
the plain GROUP BY), which is exactly what makes it safe to deploy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(unique_col: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): md5-based so the same row
    always lands in the same bucket (restart/retry-stable, and
    portable to an oracle if one ever needs to see the salt)."""
    return F.pmod(
        F.conv(F.substring(F.md5(unique_col.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )


def salted_counts_sums(
    df: DataFrame,
    key: str,
    value_col: str,
    unique_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted count+sum per ``key``. Sum goes through
    DECIMAL(18,6) so the merge order introduced by salting cannot
    change the double result."""
    phase1 = (
        df.withColumn("_salt", salt_column(F.col(unique_col), buckets))
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_s"),
        )
    )
    return (
        phase1.groupBy(key)
        .agg(
            F.sum("_n").alias("n_rows"),
            F.round(F.sum("_s").cast("double"), 4).alias("sum_value"),
        )
    )


def salted_broadcast_replicate_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    unique_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-proof fact⋈dim join by SALT-AND-REPLICATE: each fact row
    gets a deterministic salt, the (small) dim side is replicated once
    per salt bucket, and the join keys on (key, salt) — a hot join key
    spreads over ``buckets`` reducers instead of melting one.

    This is the shuffle-join fallback for when the dim side is too big
    to broadcast outright but hot fact keys overwhelm AQE's skew
    splitting (which can only split a partition, not a single key).
    The replicated dim is built with a map-only ``explode`` —
    ``buckets`` × |dim| rows, still far below the fact side. Result is
    row-identical to the plain join (the oracle twin)."""
    salted_facts = facts.withColumn(
        "_salt", salt_column(F.col(unique_col), buckets)
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    return salted_facts.join(replicated_dim, [key, "_salt"]).drop("_salt")
