"""Change-data-capture snapshot diff (the MERGE / SCD-Type-2 change
classification): given yesterday's and today's snapshot of a keyed
table, classify every key as insert / update / delete / unchanged and
carry the old+new values of the tracked columns.

Spark-first shape: one full-outer shuffle join on the key — the
minimal data movement the semantics allow (both sides co-partition on
the key, so with bucketed/pre-partitioned snapshots the exchange
disappears entirely; see operators/bucketing.py). No window, no
driver-side state. A downstream SCD2 writer appends the 'update' and
'delete' rows with validity timestamps; the classification here is the
scale-critical part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    cur: DataFrame,
    nxt: DataFrame,
    key: str,
    tracked: list[str],
) -> DataFrame:
    """Full-outer diff of two snapshots on ``key``. Emits one row per
    key present in either snapshot: ``(key, op, <col>_old, <col>_new
    for each tracked col)``. ``op`` is 'insert' (new only), 'delete'
    (old only), 'update' (both, any tracked col differs — null-safe),
    else 'unchanged'.

    Presence is decided by constant marker columns, not the tracked
    columns, so legitimately-null tracked values never masquerade as a
    missing side.
    """
    left = cur.select(
        F.col(key).alias("_k"),
        F.lit(True).alias("_has_old"),
        *[F.col(c).alias(f"{c}_old") for c in tracked],
    )
    right = nxt.select(
        F.col(key).alias("_k"),
        F.lit(True).alias("_has_new"),
        *[F.col(c).alias(f"{c}_new") for c in tracked],
    )
    joined = left.join(right, "_k", "full_outer")

    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    op = (
        F.when(F.col("_has_old").isNull(), F.lit("insert"))
        .when(F.col("_has_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out_cols = [F.col("_k").alias(key), op.alias("op")]
    for c in tracked:
        out_cols += [F.col(f"{c}_old"), F.col(f"{c}_new")]
    return joined.select(*out_cols)
