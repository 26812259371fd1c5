"""Round-12 batch-4 tests: partition-pruned scan lifecycle and the
streaming language-mix monitor."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark import queries as Q
from banking_data_etl_pipeline_spark.functions import texttools
from banking_data_etl_pipeline_spark.sources import tables

from conftest import SF_DIR


def test_partition_prune_scan_eliminates_by_directory(spark):
    """The day filter must land in the scan's PartitionFilters (file
    elimination), not in a post-scan Filter over all rows."""
    df = Q.partition_prune(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the day bounds appear inside the PartitionFilters clause
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "19730" in pf and "19736" in pf, pf


def test_partition_prune_matches_unpartitioned_computation(spark):
    """The pruned scan over the staged day-partitioned copy returns
    exactly what the same filter computes on the raw table."""
    day_us = 86_400 * 1_000_000
    ev = tables.load(spark, SF_DIR, "events")
    want = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in ev.filter(
            F.expr(f"unix_micros(ts) DIV {day_us}").between(19730, 19736)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("value_sum"),
        )
        .collect()
    }
    got = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in Q.partition_prune(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def test_stream_langid_mix_equals_batch_mix(spark):
    """Drained terminal-MAX counts equal the batch language-ID mix
    exactly, and the shares sum to 1."""
    docs = tables.load(spark, SF_DIR, "documents")
    want = {
        r["pred"]: r["n"]
        for r in docs.groupBy(
            texttools.lang_id(F.col("text")).alias("pred")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    out = Q.stream_langid_mix(spark, SF_DIR).collect()
    got = {r["pred"]: r["n"] for r in out}
    assert got == want
    assert sum(r["share"] for r in out) == pytest.approx(1.0)
