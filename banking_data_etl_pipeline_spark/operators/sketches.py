"""Approximate aggregation sketches — the sublinear-memory path for
100 TB interactive analytics.

Exact COUNT(DISTINCT) and exact percentiles (see
``operators.relational``) need a full shuffle/sort of the keys; the
sketch versions are one map-side pass with fixed-size mergeable state:

- ``approx_count_distinct`` — HyperLogLog++, default rsd 5%;
- ``approx_percentile`` — Greenwald-Khanna-style quantile summary with
  a tunable accuracy/state trade-off.

Sketch outputs are implementation-defined (engine-specific hash seeds
and merge orders), so there is deliberately NO DuckDB value-parity
oracle for them — ``tests/test_sketches.py`` instead asserts the
published error bounds against the exact operators on the same data.
That asymmetry (exact ops: value-hash parity; sketches: bound checks)
is itself the point of keeping both families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_users(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HLL++ distinct users per event type; rsd is the target relative
    standard deviation."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


def approx_price_percentiles(lineitem: DataFrame, accuracy: int = 10000) -> DataFrame:
    """Approximate p25/p50/p75 of extended price per return flag; the
    summary holds O(accuracy) items per group regardless of input
    size (vs the exact sort-based percentile)."""
    pcts = F.percentile_approx(
        F.col("l_extendedprice"),
        F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
        F.lit(accuracy),
    )
    return lineitem.groupBy("l_returnflag").agg(
        pcts[0].alias("p25"),
        pcts[1].alias("p50"),
        pcts[2].alias("p75"),
        F.count(F.lit(1)).alias("n_items"),
    )
