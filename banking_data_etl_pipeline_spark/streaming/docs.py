"""Streaming corpus curation — the ingestion-time shape of the text
quality gate: documents arrive as files (a crawler drop directory),
each micro-batch is scored map-only (quality, language, token count)
and gated, and the verdicts append downstream. Because the transform
is stateless (pure per-row expressions — no watermark, no state
store), the streaming result over a bounded drop equals the batch
scan exactly, which is what lets the driver check it against the same
batch-SQL oracle (the stronger equivalence used by
``stream_window_agg``).

At scale this is the front of the curation pipeline: file-source
backpressure (``maxFilesPerTrigger``) bounds batch size; stateful
stages (dedup-within-watermark, streaming MinHash screens against the
persisted corpus signatures — see ``operators.dedup``) compose after
this gate; everything heavier (clustering, ANN) runs on the curated
batch tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import texttools

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def docs_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over a documents drop directory."""
    return (
        spark.readStream.schema(DOCS_SCHEMA).format("parquet").load(docs_dir)
    )


def quality_gate(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """Map-only per-doc scoring + gate — identical expressions batch or
    stream (quality on the 6-dp-rounded score so the cut is
    engine-stable): (doc_id, lang_id, n_tokens, quality_score,
    kept)."""
    text = F.col("text")
    q = F.round(texttools.quality_score(text), 6)
    return docs.select(
        F.col("doc_id"),
        texttools.lang_id(text).alias("lang_id"),
        texttools.token_count(text).cast("int").alias("n_tokens"),
        q.alias("quality_score"),
        (q >= F.lit(min_quality)).alias("kept"),
    )


def run_quality_gate_stream(
    spark: SparkSession, docs_dir: str, name: str, min_quality: float = 0.5
) -> DataFrame:
    """Drive the streaming gate to completion over the (bounded) drop
    dir via availableNow + append to a memory sink — the test harness
    for the unbounded plan. Stateless, so the collected result is
    row-identical to the batch ``quality_gate`` over the same files."""
    q = (
        quality_gate(docs_stream(spark, docs_dir), min_quality)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
