"""Exactly-once streaming materialization via ``foreachBatch``: merge
each micro-batch's per-key delta into a keyed parquet state table with
an atomic directory swap.

This is the production pattern for "stream into a queryable table"
when the sink has no transactional MERGE of its own: the streaming
CHECKPOINT records which batch ids committed, ``foreachBatch`` gets
each batch exactly once per checkpoint, and the swap makes the state
update all-or-nothing — a crash between write and swap replays the
batch, a rerun over a completed checkpoint replays nothing
(idempotence; asserted by the test).

Scale notes: the merge is one key-equi full-outer join per batch —
co-partitioned if the state table is bucketed on the key
(operators/bucketing.py); totals accumulate in integer MICRO-UNITS
(exact under any batch split, same contract as
events.stateful_user_totals). The swap is a rename, not a rewrite.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import EVENTS_RAW_SCHEMA


def _merge_batch(spark: SparkSession, batch_df: DataFrame, state_dir: str) -> None:
    delta = (
        batch_df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt_d"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("micros_d"),
        )
    )
    if os.path.exists(state_dir):
        cur = spark.read.parquet(state_dir)
    else:
        cur = spark.createDataFrame([], "user_id long, cnt long, micros long")
    merged = (
        cur.join(delta, "user_id", "full_outer")
        .select(
            "user_id",
            (F.coalesce("cnt", F.lit(0)) + F.coalesce("cnt_d", F.lit(0))).alias("cnt"),
            (
                F.coalesce("micros", F.lit(0)) + F.coalesce("micros_d", F.lit(0))
            ).alias("micros"),
        )
    )
    tmp = state_dir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    old = state_dir + ".old"
    if os.path.exists(state_dir):
        os.rename(state_dir, old)
    os.rename(tmp, state_dir)
    shutil.rmtree(old, ignore_errors=True)


def run_upsert_stream(
    spark: SparkSession, events_dir: str, state_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Drive the events feed (bounded here via availableNow) through
    the upsert sink; returns the materialized state table. Re-running
    with the same checkpoint is a no-op — the checkpoint already marks
    every batch committed."""
    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .load(events_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _bid: _merge_batch(spark, bdf, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state_dir)
