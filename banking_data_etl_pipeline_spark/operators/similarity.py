"""Similarity search over an ``array<float>`` embedding column.

- ``brute_force_topk``: exact cosine top-k. The query set is broadcast
  (it's small by construction); the corpus side streams — at 100 TB
  this is a map-side-only plan plus one top-k aggregation, no corpus
  shuffle. Deterministic tie-break on (score desc, vec_id asc).
- ``lsh_topk``: the scale path — sign-bit LSH restricts each query to
  its bucket before scoring (IVF-style candidate limiting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors


def _ranked(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase top-k per query.

    A single ``Window.partitionBy(query_id)`` would shuffle EVERY
    scored row into #queries partitions — with a handful of queries
    that is a handful of reducers sorting the whole corpus. Phase 1
    ranks within (query_id, input-partition) — the exchange spreads
    over num_shuffle_partitions and each group keeps only k rows — so
    phase 2's global rank touches at most k × n_input_partitions rows
    per query. Results identical: phase 1 only discards rows that can
    never reach the global top k.
    """
    order = [F.col("cosine").desc(), F.col("vec_id").asc()]
    local = Window.partitionBy("query_id", "_part").orderBy(*order)
    pruned = (
        scored.withColumn("_part", F.spark_partition_id())
        .withColumn("_lrank", F.row_number().over(local))
        .filter(F.col("_lrank") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbours per query vector.

    ``queries``: (query_id, qvec). Broadcast nested-loop join keeps the
    corpus un-shuffled; the only shuffle is the final per-query top-k,
    which Spark runs as partial top-k per partition first (WindowExec
    with row_number + filter benefits from AQE-coalesced tiny exchange).
    """
    scored = emb.crossJoin(F.broadcast(queries)).select(
        F.col("query_id"),
        F.col(id_col).alias("vec_id"),
        F.round(vectors.cosine(F.col(vec_col), F.col("qvec")), 6).alias("cosine"),
    )
    # exclude self-matches so results are interesting when queries come
    # from the corpus itself
    scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    return _ranked(scored, k)


def corpus_queries(emb: DataFrame, n: int = 5, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Deterministic query set: the n lowest-id corpus vectors."""
    return (
        emb.orderBy(F.col(id_col).asc())
        .limit(n)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bit
    bucket (recall < 1 by design; n_bits tunes bucket count 2^n).
    At scale, write the corpus bucketed/partitioned by this key so a
    query touches one partition — the IVF analogue."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        vectors.sign_bits(F.col(vec_col), n_bits).alias("bucket"),
    )
    q = queries.select(
        "query_id", "qvec", vectors.sign_bits(F.col("qvec"), n_bits).alias("bucket")
    )
    scored = corpus.join(F.broadcast(q), "bucket").select(
        "query_id",
        "vec_id",
        F.round(vectors.cosine(F.col("v"), F.col("qvec")), 6).alias("cosine"),
    ).filter(F.col("vec_id") != F.col("query_id"))
    return _ranked(scored, k)
