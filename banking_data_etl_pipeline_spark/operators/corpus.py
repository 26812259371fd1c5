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


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 32,
) -> DataFrame:
    """Split each document into fixed-size token windows — the standard
    pre-training chunking step (stride == size -> disjoint chunks;
    stride < size -> overlapping).

    Native plan: tokenize once, ``posexplode`` over a computed chunk
    index ``sequence`` — map-only row generation, no shuffle, no UDF;
    at 100 TB this parallelizes at the input-split level and the
    Generate output streams straight into the next operator. Tail
    chunks shorter than ``size`` are kept (standard: the packer, not
    the chunker, decides padding)."""
    toks = texttools.tokens(F.col(text_col))
    staged = docs.select(F.col(id_col), toks.alias("_toks")).filter(
        F.size("_toks") > 0
    )
    n_chunks = F.ceil((F.size("_toks") - F.lit(size)) / F.lit(stride)) + 1
    n_chunks = F.greatest(n_chunks, F.lit(1)).cast("int")
    return (
        staged.select(
            id_col,
            "_toks",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, size), " "
            ).alias("chunk_text"),
            F.least(
                F.size("_toks") - F.col("chunk_idx") * stride, F.lit(size)
            ).alias("n_tokens"),
        )
    )
