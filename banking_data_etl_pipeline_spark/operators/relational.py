"""Relational breadth: joins, aggregations, rollups over the TPC-H-ish
driver tables.

The reference has NO joins/aggregations (SURVEY.md §2 "categories with
no implementation") — these exist because a real analytics engine at
100 TB is mostly joins and aggregates, and they demonstrate the
Spark-first planning stance:

- dimension tables (nation: 25 rows) are broadcast — no shuffle of the
  fact side for that join;
- fact-fact joins (lineitem ⋈ orders) shuffle on the join key once and
  AQE handles skew;
- all double SUMs go through DECIMAL(18,6): exact, order-independent
  (so results are stable across partitionings AND hash-match the
  DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec_sum(col, alias: str, scale: int = 4):
    return F.round(
        F.sum(col.cast("decimal(18,6)")).cast("double"), scale
    ).alias(alias)


def revenue_by_nation(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Revenue per customer nation: lineitem ⋈ orders ⋈ customer ⋈
    broadcast(nation). The two big joins shuffle on their keys; the
    25-row nation join is broadcast (verify: no Exchange above it in
    .explain)."""
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dec_sum(rev, "revenue"),
        )
    )


def pricing_summary(lineitem: DataFrame, cutoff: str = "1997-06-30") -> DataFrame:
    """TPC-H Q1-shaped pricing summary with a ship-date predicate that
    must push down into the parquet scan (check PushedFilters in
    .explain)."""
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(rev, "sum_disc_price"),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_avg"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("_avg"), 4))
        .drop("_avg")
    )


def moving_avg_user_value(events: DataFrame, window_rows: int = 2) -> DataFrame:
    """Per-user moving average of event value over the trailing
    ``window_rows``+1 events (event-time ordered) — the window-function
    family beyond rank: one shuffle on user_id, sort within partition.

    The average is sum(DECIMAL)/count so the double division happens
    once per row in both engines (identical bits)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-window_rows, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w)
            ),
            4,
        ).alias("moving_avg"),
    )


def repeat_customers(orders: DataFrame, split: str = "1997-01-01") -> DataFrame:
    """Set operation: customers ordering BOTH before and after the
    split date (INTERSECT — distinct-based, shuffles only custkeys)."""
    cutoff = F.lit(split).cast("timestamp")
    before = orders.filter(F.col("o_orderdate") < cutoff).select("o_custkey")
    after = orders.filter(F.col("o_orderdate") >= cutoff).select("o_custkey")
    return before.intersect(after)


def distinct_users_by_type(events: DataFrame) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — expands to a two-phase
    aggregate (partial distinct per partition, then merge), the plan
    shape that survives hot keys at scale."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rollup_orders(orders: DataFrame) -> DataFrame:
    """ROLLUP(status, priority): per-group, per-status subtotal and
    grand total in one pass (Spark expands to a single Expand +
    hash-agg — one shuffle, not three queries)."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "total_price"),
        )
    )
