"""Events operators: batch/stream parity, sessionization invariants."""

from __future__ import annotations

import os
import tempfile

from banking_data_etl_pipeline_spark.sources import tables
from banking_data_etl_pipeline_spark.streaming import events as EV

from conftest import SF_DIR


def test_stream_equals_batch_window_agg(spark):
    ev = tables.load(spark, SF_DIR, "events")
    batch = {
        (r.window_start_epoch, r.event_type): (r.n_events, r.sum_value)
        for r in EV.windowed_agg_batch(ev).collect()
    }
    d = tempfile.mkdtemp(prefix="test_stream_events_")
    os.symlink(os.path.join(SF_DIR, "events.parquet"), os.path.join(d, "events.parquet"))
    stream = {
        (r.window_start_epoch, r.event_type): (r.n_events, r.sum_value)
        for r in EV.run_stream_to_memory(spark, d, "test_stream_sink").collect()
    }
    assert batch == stream
    assert len(batch) > 0


def test_sessionize_invariants(spark):
    ev = tables.load(spark, SF_DIR, "events")
    total = ev.count()
    sess = EV.sessionize_batch(ev).collect()
    # every event lands in exactly one session
    assert sum(r.n_events for r in sess) == total
    # sessions are ordered, non-overlapping per user, gaps > 30 min
    by_user: dict = {}
    for r in sess:
        by_user.setdefault(r.user_id, []).append(r)
    for _user, rows in by_user.items():
        rows.sort(key=lambda r: r.session_seq)
        for a, b in zip(rows, rows[1:]):
            assert a.session_end_epoch <= b.session_start_epoch
            assert b.session_start_epoch - a.session_end_epoch >= 1800 - 1
        for r in rows:
            assert r.session_start_epoch <= r.session_end_epoch
