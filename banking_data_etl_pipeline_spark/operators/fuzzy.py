"""Fuzzy (approximate string) matching with candidate blocking: find
near-identical names without an all-pairs comparison.

Spark-first shape: a cheap deterministic BLOCKING KEY (here the first
token of the name) turns the O(n²) similarity join into an equi-join —
only rows sharing a block are compared, and ``levenshtein`` runs
JVM-side inside whole-stage codegen. This is the standard record-
linkage architecture at scale: at 100 TB you'd (a) pick a blocking key
with bounded block sizes (first-token + soundex + length-band
composites), (b) guard hot blocks with a count-based cutoff exactly
like the shingle ``df_cutoff`` in operators/dedup.py, and (c) let AQE
split any residual skewed block. Nothing here ever materializes the
cross product of the full table.
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
) -> DataFrame:
    """Pairs (id_a < id_b) of rows whose names share a first token and
    have levenshtein distance in [``min_dist``, ``max_dist``] (default
    excludes distance 0 — byte-identical names belong to exact dedup).
    Blocks larger than ``max_block`` are dropped whole (a hot first
    token means the token is boilerplate and matches everything — same
    rationale as the hot-shingle cutoff in n-gram dedup)."""
    # compare only the post-block SUFFIX: levenshtein(cP+a, cP+b) ==
    # levenshtein(a, b) for a shared prefix (standard DP identity), and
    # the quadratic per-pair cost drops with the square of the string
    # length. The block token never needs re-comparing.
    keyed = df.select(
        F.col(id_col),
        F.element_at(F.split(F.col(name_col), " "), 1).alias("_block"),
        F.expr(
            f"substring({name_col}, length(split({name_col}, ' ')[0]) + 1)"
        ).alias("_suffix"),
    )
    cold = keyed.join(
        keyed.groupBy("_block").agg(F.count(F.lit(1)).alias("_bn")).filter(
            F.col("_bn") <= max_block
        ),
        "_block",
    )
    a = cold.select(
        F.col("_block"), F.col(id_col).alias("id_a"), F.col("_suffix").alias("sfx_a")
    )
    b = cold.select(
        F.col("_block"), F.col(id_col).alias("id_b"), F.col("_suffix").alias("sfx_b")
    )
    # the length-difference lower bound is O(1) per pair and short-
    # circuits ahead of the quadratic levenshtein in codegen order
    len_ok = (
        F.abs(F.length("sfx_a") - F.length("sfx_b")) <= max_dist
    )
    return (
        a.join(b, "_block")
        .filter((F.col("id_a") < F.col("id_b")) & len_ok)
        # threshold form runs the banded O(max_dist * n) DP and returns
        # -1 over the threshold (excluded by the between filter)
        .withColumn(
            "edit_dist", F.levenshtein(F.col("sfx_a"), F.col("sfx_b"), max_dist)
        )
        .filter(F.col("edit_dist").between(min_dist, max_dist))
        .select("id_a", "id_b", "edit_dist")
    )
