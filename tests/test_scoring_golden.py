"""Golden-record tests for every branch of SURVEY §2 ops 9-16,
including the three RFM ∞→1 quirk rows the reference mandates
(balance=60000 → monetary=1, pdays=200 → recency=1, previous=11 →
frequency=1; reference batch_pipeline1.py:24-45,255-259)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.plans import pipeline as P

CFG = P.PipelineConfig(fixed_timestamp="2026-01-01T00:00:00Z", id_col="_raw")


def _line(age=30, job="admin.", balance=100.0, housing="no", loan="no",
          day=5, duration=100, campaign=2, pdays=10, previous=1, y="no"):
    cols = [str(age), job, "single", "primary", "no", str(balance), housing,
            loan, "cellular", str(day), "jan", str(duration), str(campaign),
            str(pdays), str(previous), "success", y]
    return ";".join(cols)


def _run(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    good, bad = P.run_on_lines(df, CFG)
    return good.collect(), bad.collect()


def test_age_group_branches(spark):
    good, _ = _run(spark, [_line(age=29), _line(age=30), _line(age=49), _line(age=50)])
    by_age = {r.age: r.age_group for r in good}
    assert by_age == {29: "young", 30: "middle_aged", 49: "middle_aged", 50: "senior"}


def test_wealth_and_monetary_quirk(spark):
    good, _ = _run(spark, [
        _line(balance=60000),   # > 50000: wealth top tier, monetary QUIRK 1
        _line(balance=50000),   # boundary: mass_affluent, monetary 5
        _line(balance=10000),   # boundary: mass_market, monetary 3
        _line(balance=10000.5),
        _line(balance=-100),
    ])
    rows = {r.balance: r for r in good}
    assert rows[60000.0].wealth_segment == "high_net_worth"
    assert json.loads(rows[60000.0].rfm_scores)["monetary"] == 1  # inf->1 quirk
    assert rows[50000.0].wealth_segment == "mass_affluent"
    assert json.loads(rows[50000.0].rfm_scores)["monetary"] == 5
    assert rows[10000.0].wealth_segment == "mass_market"
    assert json.loads(rows[10000.0].rfm_scores)["monetary"] == 3
    assert rows[10000.5].wealth_segment == "mass_affluent"
    assert json.loads(rows[-100.0].rfm_scores)["monetary"] == 2


def test_recency_frequency_quirks(spark):
    good, _ = _run(spark, [
        _line(pdays=-1, previous=0),
        _line(pdays=7, previous=3),
        _line(pdays=8, previous=4),
        _line(pdays=180, previous=10),
        _line(pdays=200, previous=11),  # both inf->1 quirk tails
    ])
    rows = {r.pdays: json.loads(r.rfm_scores) for r in good}
    assert rows[-1] == {"recency": 1, "frequency": 2, "monetary": 2}
    assert rows[7] == {"recency": 5, "frequency": 2, "monetary": 2}
    assert rows[8] == {"recency": 4, "frequency": 3, "monetary": 2}
    assert rows[180] == {"recency": 2, "frequency": 5, "monetary": 2}
    assert rows[200] == {"recency": 1, "frequency": 1, "monetary": 2}  # quirks


def test_contact_day_type_modulo_quirk(spark):
    # day-of-MONTH % 7 in (0, 6) -> weekend (a reference quirk, not a
    # real weekday computation)
    good, _ = _run(spark, [_line(day=6), _line(day=7), _line(day=8), _line(day=13)])
    by_day = {r.day: r.contact_day_type for r in good}
    assert by_day == {6: "weekend", 7: "weekend", 8: "weekday", 13: "weekend"}


def test_has_loans(spark):
    good, _ = _run(spark, [
        _line(housing="yes", loan="no", day=1),
        _line(housing="no", loan="yes", day=2),
        _line(housing="no", loan="no", day=3),
        _line(housing="YES ", loan="no", day=4),  # normalization feeds it
    ])
    by_day = {r.day: r.has_loans for r in good}
    assert by_day == {1: True, 2: True, 3: False, 4: True}


def test_engagement_score_clamps(spark):
    good, _ = _run(spark, [
        _line(previous=20, campaign=20, duration=2000, y="yes", day=1),  # all clamped
        _line(previous=0, campaign=0, duration=0, y="no", day=2),
        _line(previous=5, campaign=10, duration=500, y="no", day=3),
    ])
    by_day = {r.day: r.engagement_score for r in good}
    assert by_day[1] == 1.0
    assert by_day[2] == 0.0
    assert abs(by_day[3] - (0.5 + 1.0 + 0.5 + 0.0) / 4) < 1e-12
    assert all(0.0 <= v <= 1.0 for v in by_day.values())


def test_customer_segment_tiers(spark):
    good, _ = _run(spark, [
        # r=5 (pdays 5), f=5 (previous 9), m=5 (balance 30000) -> premium
        _line(pdays=5, previous=9, balance=30000, day=1),
        # r=1, f=2, m=2 -> avg 1.67 -> low_value
        _line(pdays=-1, previous=0, balance=0, day=2),
        # r=4 (pdays 20), f=2, m=3 (balance 8000) -> avg 3 -> high_value
        _line(pdays=20, previous=1, balance=8000, day=3),
        # r=3 (pdays 60), f=2, m=2 -> avg 2.33 -> medium_value
        _line(pdays=60, previous=1, balance=100, day=4),
    ])
    by_day = {r.day: r.customer_segment for r in good}
    assert by_day == {1: "premium", 2: "low_value", 3: "high_value", 4: "medium_value"}


def test_normalization(spark):
    good, _ = _run(spark, [_line(job=" ADMIN. ", y="YES")])
    assert good[0].job == "admin."
    assert good[0].y == "yes"
    assert good[0].engagement_score >= 0.25  # y normalized to 'yes' counts


def test_error_channel_types_and_short_circuit(spark):
    bad_lines = [
        "1;2;3",                      # wrong column count
        _line(age="abc"),             # cast failure
        _line(age=101),               # range violation
        "101;x;y;z;a;1;b;c;d;1;e;1;1;1;1;f",  # 16 cols AND bad age: parse wins
    ]
    good, bad = _run(spark, bad_lines)
    assert good == []
    msgs = sorted((r.error_type, r.error_message) for r in bad)
    assert msgs == [
        ("data_validation", "ValidationError: age out of range [18, 100]: 101"),
        ("parsing_error", "ParseError: expected 17 columns"),
        ("parsing_error", "ParseError: expected 17 columns"),
        ("parsing_error", "ParseError: invalid value for 'age': abc"),
    ]
    assert all(r.timestamp == "2026-01-01T00:00:00Z" for r in bad)


def test_lineage_stamps(spark):
    good, _ = _run(spark, [_line()])
    r = good[0]
    assert r._pipeline_version == "1.2"
    assert len(r._batch_id) == 32  # md5 in deterministic mode
    assert r._ingestion_timestamp == "2026-01-01T00:00:00Z"
    assert r._processing_timestamp == "2026-01-01T00:00:00Z"


def test_derived_columns_null_for_error_rows(spark):
    # a failed row must leave the main stream: no enrichment happens
    df = spark.createDataFrame([(_line(age=101),)], "line string")
    staged = P.run_stages(P.parse_stage(df, CFG), CFG)
    row = staged.collect()[0]
    assert row.age_group is None and row.rfm_scores is None
    assert len(row._errors) == 1
