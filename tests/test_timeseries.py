"""Time-series/behavioral operators: gap-filled resample, funnel,
cohort retention — semantics pinned on tiny hand-checked frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.operators import timeseries


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2026, 1, 1, h, m)


def test_resample_ffill_fills_gaps_and_carries_last_value(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 10.0),
            (1, _ts(0, 30), 20.0),  # hour 0: avg 15
            # hours 1-2 silent -> gap rows, value carried
            (1, _ts(3), 40.0),  # hour 3: avg 40
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = {
        r.hour_epoch: (r.n_events, r.filled_value)
        for r in timeseries.resample_ffill(ev).collect()
    }
    h0 = min(rows)
    assert len(rows) == 4  # complete spine, gaps included
    assert rows[h0] == (2, 15.0)
    assert rows[h0 + 1] == (0, 15.0)  # forward-filled
    assert rows[h0 + 2] == (0, 15.0)
    assert rows[h0 + 3] == (1, 40.0)


def test_funnel_requires_strict_stage_ordering(spark):
    ev = spark.createDataFrame(
        [
            # user 1 completes in order: depth 3
            (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
            # user 2 purchases BEFORE clicking: purchase must not count
            (2, _ts(1), "view"), (2, _ts(3), "click"), (2, _ts(2), "purchase"),
            # user 3 never enters the funnel (no view): absent
            (3, _ts(1), "click"), (3, _ts(2), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    out = {r.user_id: r.funnel_depth for r in timeseries.funnel(ev).collect()}
    assert out == {1: 3, 2: 2}


def test_cohort_retention_buckets_by_first_week(spark):
    day = 86_400
    base = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [
            # user 1 first seen day 0, active again day 8 (week offset 1)
            (1, base), (1, base + dt.timedelta(days=8)),
            # user 2 first seen day 0 only
            (2, base),
        ],
        "user_id long, ts timestamp",
    )
    rows = {(r.cohort_week, r.week_offset): r.n_active
            for r in timeseries.cohort_retention(ev).collect()}
    cohort = min(k[0] for k in rows)
    assert rows[(cohort, 0)] == 2
    assert rows[(cohort, 1)] == 1


def test_half_life_decay_halves_per_period(spark):
    from banking_data_etl_pipeline_spark.operators import timeseries

    ev = spark.createDataFrame(
        [
            (1, "2024-02-29 00:00:00", 8.0),   # 1 day before origin: k=0
            (1, "2024-02-22 00:00:00", 8.0),   # 8 days: k=1 -> 4.0
            (1, "2024-02-08 00:00:00", 8.0),   # 22 days: k=3 -> 1.0
            (2, "2024-03-05 00:00:00", 8.0),   # after origin: clamped k=0
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.user_id: r.decayed_value
        for r in timeseries.half_life_decayed_totals(ev).collect()
    }
    assert got == {1: 8.0 + 4.0 + 1.0, 2: 8.0}
