"""Sequence packing: concatenate documents in a deterministic order
and chunk the stream into fixed token-budget packs — the standard
pretraining step that turns a ragged corpus into dense training
sequences (GPT-style "concat and chunk").

Spark-first shape: one window cumsum per shard, one groupBy — no
driver-side loop, no UDF. The window partitions by a shard key (here
``lang``) so packing parallelizes across shards; pack boundaries only
need to be consistent WITHIN a shard, which is exactly the guarantee a
per-shard ordered window gives. At 100 TB you'd sub-shard further
(e.g. ``(lang, xxhash64(doc_id) % 4096)``) so no single shard's window
serializes more than one task's worth of rows; the semantics are
unchanged because each shard remains an independent pack stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texttools


def pack_documents(
    docs: DataFrame,
    budget: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "lang",
) -> DataFrame:
    """Assign each document to the pack where its first token lands:
    ``pack_id = (cumsum_before_doc) div budget`` over the shard's
    doc-id-ordered token stream. Documents straddle pack boundaries (by
    design — chunking slices the concatenated stream, it does not
    re-fit documents), so a pack's token total can exceed ``budget`` by
    at most one document's tail.

    Returns one row per (shard, pack_id) with document and token
    counts — the pack manifest a writer job would consume.
    """
    tok = texttools.token_count(F.col(text_col)).cast("bigint")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select(
        F.col(shard_col), F.col(id_col), tok.alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    # integer div in BOTH engines (no float rounding at the boundary)
    packed = staged.withColumn("pack_id", F.expr(f"(cum - n_tok) div {budget}"))
    return (
        packed.groupBy(shard_col, "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .select(shard_col, "pack_id", "n_docs", "pack_tokens", "first_doc", "last_doc")
    )
