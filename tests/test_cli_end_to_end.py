"""End-to-end CLI test: drive ``plans.pipeline.main()`` on a fixture
CSV and validate both JSON-lines sinks against their field contracts
(29-field good rows mirroring the reference's PROCESSED_DATA_SCHEMA,
4-field error rows) plus the --stats_table output."""

from __future__ import annotations

import json
import glob
import os
import tempfile

from banking_data_etl_pipeline_spark.plans import pipeline as P

HEADER = (
    "age;job;marital;education;default;balance;housing;loan;contact;day;"
    "month;duration;campaign;pdays;previous;poutcome;y"
)
ROWS = [
    # clean row
    "30;services;married;secondary;no;1500;yes;no;cellular;5;may;120;2;10;3;success;yes",
    # RFM infinity-quirk row (balance>=50k, pdays>=180, previous>=10)
    "45;admin.;single;tertiary;no;60000;no;yes;telephone;12;jun;300;1;200;11;failure;no",
    # age out of range low / high -> data_validation
    "17;student;single;primary;no;100;no;no;cellular;3;jul;60;1;-1;0;unknown;no",
    "101;retired;married;secondary;no;900;no;no;cellular;8;aug;90;1;-1;0;unknown;no",
    # non-numeric age -> parsing_error
    "abc;services;married;secondary;no;100;no;no;cellular;2;may;50;1;-1;0;unknown;no",
    # wrong column count -> parsing_error
    "bad;short;row",
]

GOOD_FIELDS = 29
ERROR_FIELDS = {"raw_data", "error_type", "error_message", "timestamp"}


def _read_jsonl(path: str) -> list[dict]:
    return [
        json.loads(line)
        for f in sorted(glob.glob(os.path.join(path, "part-*")))
        for line in open(f)
        if line.strip()
    ]


def test_cli_json_sinks(spark):
    d = tempfile.mkdtemp(prefix="cli_e2e_")
    csv = os.path.join(d, "bank.csv")
    with open(csv, "w") as f:
        f.write(HEADER + "\n" + "\n".join(ROWS) + "\n")

    good_dir, bad_dir, stats_dir = (
        os.path.join(d, n) for n in ("good", "bad", "stats")
    )
    P.main(
        [
            "--input_path", csv,
            "--output_table", good_dir,
            "--error_table", bad_dir,
            "--stats_table", stats_dir,
        ]
    )

    good = _read_jsonl(good_dir)
    bad = _read_jsonl(bad_dir)

    # 2 valid rows survive; each carries the full 29-field contract
    assert len(good) == 2
    for row in good:
        assert len(row) == GOOD_FIELDS, sorted(row)
        assert "_raw" not in row
    by_age = {r["age"]: r for r in good}
    assert by_age[30]["age_group"] == "middle_aged"
    # the reference's RFM infinity quirk: all three scores collapse to 1
    quirk = json.loads(by_age[45]["rfm_scores"])
    assert (quirk["recency"], quirk["frequency"], quirk["monetary"]) == (1, 1, 1)

    # 4 rejected rows, 4-field error contract, right error channels
    assert len(bad) == 4
    assert all(set(r) == ERROR_FIELDS for r in bad)
    types = sorted(r["error_type"] for r in bad)
    assert types == ["data_validation", "data_validation", "parsing_error", "parsing_error"]
    # raw line is preserved verbatim for replay
    assert any(r["raw_data"] == "bad;short;row" for r in bad)

    # stats sink: per-error-type counts as parquet
    stats = {
        r.error_type: r["count"]
        for r in spark.read.parquet(stats_dir).collect()
    }
    assert stats == {"data_validation": 2, "parsing_error": 2}


def test_cli_age_range_override_shifts_validation_and_stats(spark):
    """--min_age/--max_age are live CLI knobs (SURVEY §2 row 8): with
    --min_age 17 --max_age 101 both boundary rows become good, the
    validation channel empties, and the stats table reflects only the
    parse failures — hand-computed from the same fixture."""
    d = tempfile.mkdtemp(prefix="cli_e2e_age_")
    csv = os.path.join(d, "bank.csv")
    with open(csv, "w") as f:
        f.write(HEADER + "\n" + "\n".join(ROWS) + "\n")

    good_dir, bad_dir, stats_dir = (
        os.path.join(d, n) for n in ("good", "bad", "stats")
    )
    P.main(
        [
            "--input_path", csv,
            "--output_table", good_dir,
            "--error_table", bad_dir,
            "--stats_table", stats_dir,
            "--min_age", "17",
            "--max_age", "101",
        ]
    )
    good = _read_jsonl(good_dir)
    bad = _read_jsonl(bad_dir)
    assert sorted(r["age"] for r in good) == [17, 30, 45, 101]
    assert {r["age_group"] for r in good if r["age"] in (17,)} == {"young"}
    assert sorted(r["error_type"] for r in bad) == ["parsing_error", "parsing_error"]
    stats = {
        r.error_type: r["count"]
        for r in spark.read.parquet(stats_dir).collect()
    }
    assert stats == {"parsing_error": 2}


def test_cli_parquet_output_format(spark):
    """--output_format parquet writes both sinks as parquet with the
    same 29-field contract and row routing as the JSON path."""
    d = tempfile.mkdtemp(prefix="cli_e2e_pq_")
    csv = os.path.join(d, "bank.csv")
    with open(csv, "w") as f:
        f.write(HEADER + "\n" + "\n".join(ROWS) + "\n")

    good_dir, bad_dir = (os.path.join(d, n) for n in ("good", "bad"))
    P.main(
        [
            "--input_path", csv,
            "--output_table", good_dir,
            "--error_table", bad_dir,
            "--output_format", "parquet",
        ]
    )
    good = spark.read.parquet(good_dir)
    bad = spark.read.parquet(bad_dir)
    assert good.count() == 2
    assert len(good.columns) == GOOD_FIELDS
    assert "_raw" not in good.columns
    assert set(bad.columns) == ERROR_FIELDS
    assert sorted(r.error_type for r in bad.collect()) == [
        "data_validation", "data_validation", "parsing_error", "parsing_error",
    ]
