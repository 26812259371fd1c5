"""Round-12 batch-7 tests: clustering purity/NMI, event-time lateness
audit, Poisson overdispersion."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark import queries as Q
from banking_data_etl_pipeline_spark.operators import clustering

from conftest import SF_DIR


def test_cluster_purity_perfect_separation(spark):
    """Two tight, far-apart groups whose labels match the grouping →
    purity = 1 and NMI = 1 exactly."""
    rows = []
    for i in range(6):
        base = 0.0 if i < 3 else 100.0
        rows.append((i, [base + 0.1 * i] * 4, 0 if i < 3 else 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    row = clustering.cluster_purity(emb, k=2, iterations=2).collect()[0]
    assert row["n"] == 6 and row["n_clusters"] == 2
    assert row["purity_num"] == 6
    assert row["purity"] == pytest.approx(1.0)
    assert row["nmi"] == pytest.approx(1.0)


def test_cluster_purity_fixture_bounds(spark):
    """On the fixture embeddings: purity in (1/k-ish, 1], NMI in
    [0, 1], and purity_num consistent with purity·n."""
    row = Q.kmeans_purity(spark, SF_DIR).collect()[0]
    assert 0.0 < row["purity"] <= 1.0
    assert 0.0 <= row["nmi"] <= 1.0
    assert row["purity"] == pytest.approx(row["purity_num"] / row["n"], abs=1e-6)


def test_lateness_audit_hand_built(spark):
    """Arrival order (event_id) 1..4 with event times 10, 30, 20, 40 →
    one late event (20 behind the running max 30), worst lag 10."""
    rows = [
        (1, 1, "2024-01-01 00:00:10"),
        (2, 1, "2024-01-01 00:00:30"),
        (3, 1, "2024-01-01 00:00:20"),
        (4, 1, "2024-01-01 00:00:40"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    # route through the same window logic by registering a temp table
    # is unnecessary — the query builder only takes sf_dir; recompute
    # its exact expressions on the hand frame
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.unix_micros(F.col("ts"))
    flagged = ev.select("user_id", t.alias("t"), F.max(t).over(w).alias("mb"))
    late = F.col("mb").isNotNull() & (F.col("t") < F.col("mb"))
    got = flagged.groupBy("user_id").agg(
        F.sum(late.cast("bigint")).alias("n_late"),
        F.max(F.when(late, F.col("mb") - F.col("t"))).alias("worst"),
    ).collect()[0]
    assert got["n_late"] == 1
    assert got["worst"] == 10_000_000  # 10 s in microseconds


def test_lateness_audit_fixture_totals(spark):
    out = Q.lateness_audit(spark, SF_DIR).collect()
    from banking_data_etl_pipeline_spark.sources import tables

    ev = tables.load(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in out) == ev.count()
    for r in out:
        assert 0 <= r["n_late"] < r["n_events"]
        if r["n_late"] == 0:
            assert r["worst_lag_us"] is None


def test_overdispersion_constant_series_is_zero(spark):
    """Identical daily counts → sample variance 0 → dispersion 0."""
    rows = []
    for d in range(4):
        rows += [(d * 10 + j, f"2024-01-{d + 1:02d} 01:00:00") for j in range(3)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string"
    ).select(
        "event_id",
        F.lit("view").alias("event_type"),
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    # recompute with the same expressions on the hand frame
    day_us = 86_400 * 1_000_000
    daily = (
        ev.select("event_type", F.expr(f"unix_micros(ts) DIV {day_us}").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    ).collect()[0]
    n, s1, s2 = s["n_days"], s["s1"], s["s2"]
    assert n * s2 - s1 * s1 == 0  # constant series


def test_overdispersion_fixture_positive(spark):
    out = Q.overdispersion(spark, SF_DIR).collect()
    assert len(out) == 5
    for r in out:
        assert r["dispersion"] >= 0.0
        assert r["n_days"] > 1
