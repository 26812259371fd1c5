"""PageRank by power iteration over a co-purchase graph — the
iterative-graph-algorithm representative (same driver-side-loop,
distributed-data pattern as Lloyd's k-means in clustering.py, but the
model state — the rank vector — stays DISTRIBUTED: one row per node,
never collected).

Spark-first shape per iteration: one shuffle join (edges ⋈ ranks on
src) + one aggregation (sum contributions by dst). Both key on node
ids, so pre-partitioning edges and ranks on the same key makes every
iteration reuse one partitioning (bucketed checkpoints at production
scale). The damping base term enters as an expression over a
driver-held scalar (node count — model-parameter scale, one count()).

Cross-engine float parity (the DuckDB twin unrolls the same
iterations): per-edge contributions are TRUNCATED to 12 dp
(floor(x*1e12)/1e12 — unlike round(), truncation has no half-way ties,
so it is bit-deterministic across engines), summed EXACTLY via
DECIMAL(32,12) (order-independent), and the new rank is truncated the
same way — so both engines walk bit-identical rank vectors through
every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def _trunc12(col: F.Column) -> F.Column:
    """Truncate a (positive) double to 12 dp, tie-free: the scaled
    value is an exact integer < 2^53, so both engines agree bitwise."""
    return F.floor(col * F.lit(1e12)).cast("double") / F.lit(1e12)


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Symmetric distinct edges between parts appearing in the same
    order. The self-join keys on l_orderkey (bounded fan-out: orders
    have ~7 lines, so the blowup is ≤ 7² per order — a constant, not a
    skew risk)."""
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("dst"))
    # dedupe only the src < dst half (halves the distinct's shuffle
    # volume), then mirror map-only — the union adds no exchange
    half = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(
    lineitem: DataFrame, iters: int = 3, broadcast_nodes: int = 2_000_000
) -> DataFrame:
    """Ranks after ``iters`` damped power iterations, over nodes that
    have at least one co-purchase edge. Returns (node, r).

    When the node count is under ``broadcast_nodes`` the per-iteration
    edges⋈ranks join BROADCASTS the rank vector (a few MB — iterations
    become map-only over the cached edge list plus one small
    aggregation); above it the join falls back to a shuffle that
    co-partitions with the contribution aggregation. Node counts are
    usually orders of magnitude below edge counts, so the broadcast
    path is the common case."""
    edges = copurchase_edges(lineitem)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # fold outdegree into the edge list once and PERSIST it: every
    # iteration reuses this exact table, and without the cache each
    # iteration would re-run the order self-join + distinct (the
    # dominant cost). Callers running query batteries clear the cache
    # between queries (bench.py / the parity gate); a production run
    # would checkpoint the edge list to bucketed parquet instead.
    ed = edges.join(deg, "src").persist()

    # node count: a scalar model parameter (the one driver-side pull);
    # counting through `ed` also materializes the cache
    n_nodes = ed.select("src").distinct().count()
    base = F.lit(0.15) / F.lit(float(n_nodes))

    # derive the initial ranks from the cached edge table (going back
    # through `deg` would re-run the uncached self-join)
    ranks = ed.select("src").distinct().select(
        F.col("src").alias("node"),
        _trunc12(F.lit(1.0) / F.lit(float(n_nodes))).alias("r"),
    )
    for _ in range(iters):
        if n_nodes <= broadcast_nodes:
            ranks = F.broadcast(ranks)
        contrib = ed.join(ranks, ed["src"] == ranks["node"]).select(
            F.col("dst"),
            _trunc12(F.col("r") / F.col("deg")).alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                F.sum(F.col("c").cast("decimal(32,12)")).cast("double").alias("s")
            )
            .select(
                F.col("dst").alias("node"),
                _trunc12(base + F.lit(DAMPING) * F.col("s")).alias("r"),
            )
        )
    return ranks
