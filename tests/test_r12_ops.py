"""Round-12 operator tests: checkpoint recovery for the built-in
aggregation state store, TF-IDF blocking recall, BMP decode."""

from __future__ import annotations

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark import queries as Q
from banking_data_etl_pipeline_spark.sources import tables
from banking_data_etl_pipeline_spark.streaming import events as EV

from conftest import SF_DIR


def test_tfidf_recall_floor_on_fixture(spark):
    """The df<=20 prefix-filter blocking must keep >= 90% of the exact
    top-50 pairs on the fixture corpus (measured 0.98 at both sf0.001
    and sf0.01) — the stated floor for the documented hot-term-only
    recall trade."""
    from banking_data_etl_pipeline_spark.operators import dedup

    docs = tables.load(spark, SF_DIR, "documents")
    row = dedup.tfidf_recall(docs).collect()[0]
    assert row.n_docs == 300
    assert 0 < row.n_exact <= 50
    assert row.n_hit <= row.n_exact
    assert row.recall >= 0.9, row


def test_tfidf_recall_exact_arm_catches_hot_term_only_pairs(spark):
    """Construct a corpus where two docs share ONLY a hot term (df >
    cap): the blocked arm must exclude the pair, the exact arm must
    find it — recall < 1 proves the twin measures the real trade."""
    from banking_data_etl_pipeline_spark.operators import dedup

    # 30 docs all containing the hot bigram "the cat"; docs 0/1 share
    # ONLY that hot bigram (plus unique fillers), so their pair exists
    # exclusively through the hot term
    rows = [(i, "the cat filler%d unique%d" % (i, i)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    row = dedup.tfidf_recall(docs, n_slice=30, df_cap=5, top=500).collect()[0]
    assert row.n_exact > row.n_blocked, row
    assert row.recall < 1.0, row
    # and the blocked arm found nothing (every shared term is hot)
    assert row.n_hit == row.n_blocked


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
