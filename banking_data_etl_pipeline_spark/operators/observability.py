"""Single-pass pipeline metrics via Spark's Observation API — the
production accounting pattern: row counts, error rates, and value
totals are collected AS THE JOB RUNS (accumulator-backed, exactly-once
per action), instead of re-running count() queries that double the
scan cost at 100 TB.

The reference pipeline logs its counts with separate counters
(batch_pipeline1.py's log statements around the write); here the same
numbers ride the one write action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(df: DataFrame, value_col: str, name: str = "metrics"):
    """Attach an Observation measuring rows, nulls in ``value_col``,
    and the DECIMAL-exact value total. Returns (df, observation);
    read ``observation.get`` AFTER the first action on the returned
    frame. Metrics cost nothing extra: they fold into the same pass."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_null"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("total"),
    )
    return out, obs
