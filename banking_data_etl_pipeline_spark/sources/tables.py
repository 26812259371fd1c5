"""Loaders for the driver-provided TPC-H-ish parquet tables.

Columnar parquet scans give Catalyst column pruning + predicate
pushdown for free; check ``.explain`` shows ``PushedFilters`` /
``ReadSchema`` when consuming these.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    assert name in TABLES, f"unknown table {name}"
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # The driver parquet stores ts as INT64 TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as long nanos.
        # DuckDB (the oracle) truncates nanos -> micros on read, so the
        # parity-exact conversion is integer-div by 1000 (NOT float
        # division: 1.7e18 ns exceeds double's 2^53 exact-int range).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
