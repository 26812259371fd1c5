"""Fuzzy (approximate string) matching with candidate blocking: find
near-identical names without an all-pairs comparison.

Spark-first shape: a cheap deterministic COMPOSITE BLOCKING KEY —
(first token, length band) — turns the O(n²) similarity join into an
equi-join: only rows sharing a token AND sitting in adjacent length
bands are compared, and ``levenshtein`` runs JVM-side inside
whole-stage codegen. This is the standard record-linkage architecture
at scale; the composite key matters because the first token alone is
drawn from a small vocabulary, so token-only blocks grow LINEARLY with
the data and within-block pairing quadratically. Adding the length
band splits every token block by ~(name-length spread / band width)
WITHOUT changing the result: any pair within levenshtein distance d
differs in length by at most d, so banding at width ``max_dist`` with
a ±1-band probe provably keeps every qualifying pair (an interval of
length ≤ W crosses at most one multiple of W). At 100 TB you'd extend
the same composite (e.g. + soundex) and keep the count-based hot-block
cutoff; AQE splits any residual skewed block. Nothing here ever
materializes the cross product of the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 3,
    min_dist: int = 1,
    max_block: int = 100_000,
    parallelism: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) of rows whose names share a first token and
    have levenshtein distance in [``min_dist``, ``max_dist``] (default
    excludes distance 0 — byte-identical names belong to exact dedup).

    Blocking key = (first token, floor(len(name)/max_dist)). One join
    side probes bands {-1, 0, +1}, which covers every pair with
    |len_a - len_b| <= max_dist — exactly the pairs the levenshtein
    threshold could accept — so the output is identical to token-only
    blocking while the candidate pair count drops by the number of
    occupied bands per token. Each unordered pair is emitted once: the
    a-side keeps its own band, so (a, b) matches only b's probe copy
    equal to a's band, and ``id_a < id_b`` fixes the orientation.

    Composite blocks larger than ``max_block`` are dropped whole (a hot
    block means the key is boilerplate and matches everything — same
    rationale as the hot-shingle cutoff in n-gram dedup). The DuckDB
    twin (oracle.FUZZY_JOIN_Q) mirrors the same key, probe, and cutoff.
    """
    # compare only the post-block SUFFIX: levenshtein(cP+a, cP+b) ==
    # levenshtein(a, b) for a shared prefix (standard DP identity), and
    # the quadratic per-pair cost drops with the square of the string
    # length. The block token never needs re-comparing. The band uses
    # the FULL name length (same quantity both engines can compute
    # without the suffix split).
    keyed = df.select(
        F.col(id_col),
        F.element_at(F.split(F.col(name_col), " "), 1).alias("_tok"),
        F.floor(F.length(name_col) / F.lit(max_dist)).alias("_band"),
        F.expr(
            f"substring({name_col}, length(split({name_col}, ' ')[0]) + 1)"
        ).alias("_suffix"),
    )
    cold = keyed.join(
        keyed.groupBy("_tok", "_band")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") <= max_block)
        .drop("_bn"),
        ["_tok", "_band"],
    )
    # The pairing stage is CPU-bound, not byte-bound: a few MB of names
    # explode into millions of levenshtein calls, so AQE's byte-based
    # partition coalescing (and a byte-based broadcast choice) would
    # serialize the quadratic work onto one task. Explicit
    # repartition(n, keys) on BOTH sides pins a shuffled equi-join at
    # full parallelism (user-specified partition counts are exempt from
    # AQE coalescing) — and never broadcasts the corpus, which is the
    # 100 TB-correct shape.
    n_parts = parallelism or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    a = cold.select(
        "_tok",
        F.col("_band"),
        F.col(id_col).alias("id_a"),
        F.col("_suffix").alias("sfx_a"),
    ).repartition(n_parts, "_tok", "_band")
    # probe-side fan-out is a map-only ×3 explode — cheap next to the
    # quadratic pairing it prevents
    b = cold.select(
        "_tok",
        F.explode(
            F.array(F.col("_band") - 1, F.col("_band"), F.col("_band") + 1)
        ).alias("_band"),
        F.col(id_col).alias("id_b"),
        F.col("_suffix").alias("sfx_b"),
    ).repartition(n_parts, "_tok", "_band")
    # the length-difference lower bound is O(1) per pair and short-
    # circuits ahead of the quadratic levenshtein in codegen order
    len_ok = F.abs(F.length("sfx_a") - F.length("sfx_b")) <= max_dist
    return (
        # hash-hint the UNEXPLODED side `a`: the hinted relation
        # becomes the hash-join build side, and b carries 3 band-probe
        # copies per row — building from b would triple each task's
        # hash table for no benefit
        a.hint("shuffle_hash").join(b, ["_tok", "_band"])
        .filter((F.col("id_a") < F.col("id_b")) & len_ok)
        # threshold form runs the banded O(max_dist * n) DP and returns
        # -1 over the threshold (excluded by the between filter)
        .withColumn(
            "edit_dist", F.levenshtein(F.col("sfx_a"), F.col("sfx_b"), max_dist)
        )
        .filter(F.col("edit_dist").between(min_dist, max_dist))
        .select("id_a", "id_b", "edit_dist")
    )
