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


def salted_self_pair_join(
    rows: DataFrame,
    keys: list[str],
    id_col: str,
    payload: list[str],
    hot_threshold: int = 256,
    target_block: int = 128,
    max_salts: int = 32,
) -> DataFrame:
    """Skew-proof SELF pair join: all unordered row pairs sharing a
    key, with hot keys fragment-replicated so no single reducer owns a
    d²/2 pair block. This is the pair-generation analogue of
    ``salted_broadcast_replicate_join`` — AQE's skew split cannot help
    here because a self-join key's whole d² block lives inside ONE
    key, and splitting a partition cannot split a key.

    Scheme (1-Bucket-Theta fragmenting, hot keys only): a key with d
    rows above ``hot_threshold`` gets s = min(ceil(d/target_block),
    max_salts) salt groups; each row lands in group g =
    deterministic-hash(id) % s. Block (i, j), i <= j, joins group-i
    rows against group-j rows exactly once: the left side replicates
    row (g) to (_i=g, _j in g..s-1), the right side to (_j=g, _i in
    0..g) — per-row fan-out ≤ s on each side, reducer load capped at
    (d/s)² per block instead of d². Cold keys (s=1) reduce to the
    plain self-join with zero replication, so the guard costs one
    per-key count aggregate + one co-partitioned count join.

    Pairs are canonicalized to id_a < id_b with each payload column
    following its id (``{c}_a`` / ``{c}_b``) — cross-group blocks fix
    orientation by GROUP, not id, so the naive ``a.id < b.id`` join
    predicate would silently drop the pairs whose lower id landed in
    the higher group. Output is row-identical to the unsalted join
    (the oracle twin IS the plain join), which is what makes the
    threshold safe to deploy."""
    d = F.col("_d")
    s_expr = (
        F.when(
            d > hot_threshold,
            F.least(F.ceil(d / F.lit(float(target_block))), F.lit(max_salts)),
        )
        .otherwise(F.lit(1))
        .cast("long")
    )
    counts = rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("_d"))
    with_s = rows.join(counts, keys).select(
        *keys, id_col, *payload, s_expr.alias("_s")
    )
    # salt_column takes a static bucket count; here buckets vary per
    # key, so inline the same md5-derived residue against _s
    g = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.col("_s"),
    )
    salted = with_s.withColumn("_g", g)
    left = salted.select(
        *keys,
        F.col(id_col).alias("_ida"),
        *[F.col(c).alias(f"_pa_{c}") for c in payload],
        F.col("_g").alias("_i"),
        F.explode(F.sequence(F.col("_g"), F.col("_s") - 1)).alias("_j"),
    )
    right = salted.select(
        *keys,
        F.col(id_col).alias("_idb"),
        *[F.col(c).alias(f"_pb_{c}") for c in payload],
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_g"))).alias("_i"),
        F.col("_g").alias("_j"),
    )
    joined = left.join(right, [*keys, "_i", "_j"]).filter(
        (F.col("_i") != F.col("_j")) | (F.col("_ida") < F.col("_idb"))
    )
    lo_first = F.col("_ida") < F.col("_idb")
    return joined.select(
        *keys,
        F.least("_ida", "_idb").alias("id_a"),
        F.greatest("_ida", "_idb").alias("id_b"),
        *[
            c
            for p in payload
            for c in (
                F.when(lo_first, F.col(f"_pa_{p}"))
                .otherwise(F.col(f"_pb_{p}"))
                .alias(f"{p}_a"),
                F.when(lo_first, F.col(f"_pb_{p}"))
                .otherwise(F.col(f"_pa_{p}"))
                .alias(f"{p}_b"),
            )
        ],
    )


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


def join_hotspots(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    top: int = 20,
) -> DataFrame:
    """Pre-join skew forecast: per-key output-size contributions of an
    equi-join WITHOUT materializing the join — |A ⋈ B| on key k is
    exactly deg_A(k)·deg_B(k), so two degree aggregations and a join
    on the (far smaller) distinct-key tables price every key's blast
    radius before the real shuffle runs. This is the two-sided
    companion of ``key_skew_profile``: that one says "is THIS column
    skewed", this one says "which keys will dominate THAT join" — the
    decision input for salting/AQE-skew thresholds at 100 TB.

    Scale shape: two map-side-combined groupBys, one equi-join on
    key-count tables, a TakeOrdered top-n. The total estimated output
    is an exact bigint sum pulled to the driver (ONE scalar — the
    idle_customers literal pattern) so the share division is a single
    double op in both engines.

    Returns (key, rows_a, rows_b, out_rows, share) for the ``top``
    hottest keys, out_rows desc then key asc."""
    da = a.groupBy(F.col(key_a).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_a")
    )
    db = b.groupBy(F.col(key_b).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_b")
    )
    contrib = da.join(db, "key").select(
        "key",
        "rows_a",
        "rows_b",
        (F.col("rows_a") * F.col("rows_b")).cast("bigint").alias("out_rows"),
    )
    total_row = contrib.agg(F.sum("out_rows").alias("_t")).first()
    total = float(total_row["_t"]) if total_row["_t"] is not None else 1.0
    return (
        contrib.select(
            "key",
            "rows_a",
            "rows_b",
            "out_rows",
            F.round(F.col("out_rows").cast("double") / F.lit(total), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("out_rows"), F.asc("key"))
        .limit(top)
    )
