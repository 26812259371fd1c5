"""Composite training-data corpus pipeline: quality-score -> language
filter -> exact dedup, in one declarative plan.

This is the canonical LLM-pretraining shape (filter cheap, dedup on
hashes, keep one representative per duplicate class). Everything stays
in native expressions; the only shuffle is the final dedup groupBy on
a fixed-width md5 key."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texttools


def quality_filtered_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """Documents passing quality >= min_quality (on the 6-dp-rounded
    score, so engine float edges can't flip the cut) and language-ID ==
    ``lang``, exact-deduped keeping the lowest id per distinct text."""
    text = F.col(text_col)
    scored = docs.select(
        F.col(id_col),
        text.alias("_text"),
        F.round(texttools.quality_score(text), 6).alias("_q"),
        texttools.lang_id(text).alias("_lang"),
    )
    kept = scored.filter((F.col("_q") >= min_quality) & (F.col("_lang") == lang))
    return (
        kept.groupBy(F.md5(F.col("_text")).alias("text_hash"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("_q").alias("quality_score"),
        )
        .select(id_col, "n_copies", "quality_score", "text_hash")
    )
