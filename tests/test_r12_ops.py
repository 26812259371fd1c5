"""Round-12 operator tests: checkpoint recovery for the built-in
aggregation state store, TF-IDF blocking recall, BMP decode."""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark import queries as Q
from banking_data_etl_pipeline_spark.sources import tables
from banking_data_etl_pipeline_spark.streaming import events as EV

from conftest import SF_DIR


def test_msprt_recovery_carries_agg_state_across_restart(spark):
    """The kill-and-restart msprt run must reproduce the uninterrupted
    batch readout exactly: a (day, arm) key with events in BOTH parity
    halves would carry phase-2-only partials if the restarted query
    lost the built-in aggregation state."""
    ev = tables.load(spark, SF_DIR, "events")
    got = sorted(map(tuple, EV.msprt_recovery(spark, ev).collect()))
    want = sorted(map(tuple, Q.msprt_monitor(spark, SF_DIR).collect()))
    assert got == want
    # teeth check: some (day, arm) key must have events in BOTH halves
    # (0 < phase-2 count < total), so lost state cannot reproduce the
    # full-table partials
    key = [F.to_date("ts").alias("day")]
    total = {
        (r.day,): r.n
        for r in ev.groupBy(*key).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    p2 = {
        (r.day,): r.n
        for r in ev.filter(F.col("event_id") % 2 == 1)
        .groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert any(
        0 < p2.get(k, 0) < n for k, n in total.items()
    ), "parity split left no day spanning the restart boundary"
