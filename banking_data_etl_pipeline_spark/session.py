"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` (single JVM); the configs below are the
ones that also matter on a real cluster: AQE for runtime re-planning
(skew joins, partition coalescing), shuffle partitions sized to the
parallelism actually available, UTC session time zone so timestamp
semantics match the DuckDB oracle, and Arrow for any Pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "banking_data_etl_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # driver parquet stores INT64 TIMESTAMP(NANOS), which Spark 4
        # rejects by default (PARQUET_TYPE_ILLEGAL); read as long nanos
        # and convert explicitly in sources.tables.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # \r-progress bars interleave with structured stdout (they
        # truncated the r3 bench metric line); logs are enough locally
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Pin session settings that affect value-level parity with the
    DuckDB oracle, on a session we did not create (the driver's).

    Idempotent and cheap; every ``queries()`` callable routes through
    this so results are timezone-stable regardless of who built the
    session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
