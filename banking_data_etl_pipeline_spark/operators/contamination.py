"""Benchmark-contamination scan: flag corpus documents sharing word
n-grams with a (small) benchmark/eval set — the decontamination pass
every serious pretraining pipeline runs before training.

Spark-first shape: the benchmark side is tiny relative to the corpus
(eval suites are KB-MB, the corpus is TB), so its distinct-shingle set
is BROADCAST and the overlap check is a map-side hash semi-join — the
100 TB corpus is scanned once, shuffled never. The corpus side
explodes to (doc, shingle) pairs map-only; the only shuffle is the
final per-doc count groupBy, keyed on doc_id (uniform, skew-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texttools


def benchmark_overlap(
    docs: DataFrame,
    n: int = 3,
    bench_mod: int = 97,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document count of distinct word ``n``-grams shared with the
    benchmark set (docs whose id % ``bench_mod`` == 0 stand in for a
    real eval suite; a production run would read the eval corpus
    instead). Only contaminated docs (>=1 shared shingle) are emitted,
    with the shingle count and the doc's own distinct-shingle total so
    a downstream filter can threshold on the overlap FRACTION.
    """
    ident = F.col(id_col)
    sh = docs.select(
        ident,
        F.array_distinct(
            texttools.word_shingles(texttools.tokens(F.col(text_col)), n)
        ).alias("shingles"),
    )
    inv = sh.filter(F.size("shingles") > 0).select(
        ident, F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
    )
    bench = (
        inv.filter(ident % bench_mod == 0).select("shingle").distinct()
    )
    corpus = inv.filter(ident % bench_mod != 0)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        # per-doc shingles are already distinct (array_distinct above),
        # so count(*) IS the distinct overlap count
        .groupBy(id_col, "n_sh")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(id_col, "n_sh", "n_shared")
    )
