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


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Join/agg-key skew diagnostic: one row of distribution stats for
    ``key`` — the "should this join be salted?" report a platform runs
    BEFORE committing to a shuffle strategy at 100 TB.

    Shape: one groupBy(key) with map-side combine (the same shuffle
    the real join would pay, so profiling on a sample upstream is the
    production pattern), then a single global aggregate over the
    key-count table (one row per key — already far smaller than the
    data). top-share numerators use max() and a TakeOrdered-style
    sorted-limit only on the key-count table, never the raw rows.

    Output: n_rows, n_keys, max_per_key, top10_rows (rows under the 10
    hottest keys), top1_share / top10_share (6-dp), avg_per_key
    (6-dp). A top1_share near 1/n_keys is uniform; salting pays off
    roughly when max_per_key spans multiple shuffle partitions' worth
    of rows."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("kn"))
    top10 = (
        counts.orderBy(F.desc("kn"), F.asc(key))
        .limit(10)
        .agg(F.sum("kn").alias("top10_rows"), F.max(F.lit(1)).alias("_k"))
    )
    stats = counts.agg(
        F.sum("kn").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("kn").alias("max_per_key"),
        F.max(F.lit(1)).alias("_k"),
    )
    # 1-row x 1-row combine as an equi-join on an AGGREGATED key
    # (max(lit) — a plain lit(1) key constant-folds back into a
    # nested-loop cross join), keeping the repo invariant that no
    # plan contains a nested loop
    return stats.join(F.broadcast(top10), "_k").select(
        "n_rows",
        "n_keys",
        "max_per_key",
        "top10_rows",
        F.round(F.col("max_per_key") / F.col("n_rows").cast("double"), 6).alias(
            "top1_share"
        ),
        F.round(F.col("top10_rows") / F.col("n_rows").cast("double"), 6).alias(
            "top10_share"
        ),
        F.round(F.col("n_rows") / F.col("n_keys").cast("double"), 6).alias(
            "avg_per_key"
        ),
    )
