"""Schema'd CSV datasource read path for the bank-marketing input.

The scan-based alternative to ``plans.pipeline.parse_stage`` (SURVEY.md
§2 row 1): ``spark.read.csv`` with an explicit all-string schema +
PERMISSIVE mode pushes the split/quote handling into the datasource
(split-parallel, whole-stage-codegen'd) and captures malformed lines in
a corrupt-record column instead of failing. Reference:
``batch_processing/batch_pipeline1.py:345`` (ReadFromText +
skip_header_lines=1) and ``:109-156`` (ParseCSVFn).

Use ``read_bank_csv`` when the input is a well-formed CSV file and you
want maximum scan throughput; use ``plans.pipeline.run_on_lines`` when
you need the reference's exact per-field error messages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schema import BANK_RAW_SCHEMA

CORRUPT_COL = "_corrupt_record"

# Raw schema + corrupt-record capture column.
RAW_WITH_CORRUPT = T.StructType(
    list(BANK_RAW_SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
)


def read_bank_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a semicolon-delimited 17-column bank CSV with header.

    All columns land as strings (typed casts happen in the pipeline so
    per-field failures can be routed to the error channel); lines Spark
    cannot split land intact in ``_corrupt_record``.

    Note (Spark limitation): a query that references ONLY the corrupt
    column (e.g. ``df.filter(col(CORRUPT_COL).isNotNull()).count()``)
    raises UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    select at least one data column alongside it, or cache first.
    """
    return (
        spark.read.schema(RAW_WITH_CORRUPT)
        .option("header", True)
        .option("sep", ";")
        .option("quote", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
