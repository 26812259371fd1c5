"""Distributed BPE merge learning — tokenizer training over a corpus.

Classic byte-pair encoding (Sennrich et al. 2016): start from
characters, repeatedly merge the most frequent adjacent symbol pair.
The Spark-first shape mirrors how production BPE trainers scale:

- **One corpus-wide pass, total.** The corpus collapses to a
  (word, frequency) vocabulary table first; every merge iteration then
  runs over the VOCAB table (Zipf-small — ≪ corpus, usually millions
  of rows at 100 TB) with pair counts weighted by word frequency. The
  100 TB of text is touched exactly once.
- **Model-parameter driver pulls only.** Each iteration pulls ONE row
  (the argmax pair — ``orderBy(cnt desc, pair).limit(1)``, a TakeOrdered,
  never a global sort); the learned merge table (``n_merges`` rows) is
  the model. The vocab table itself stays distributed.
- **Deterministic & engine-portable.** Pair counts are integers;
  ties break lexicographically; the merge rewrite is a literal
  ``replace`` (non-overlapping, left-to-right in both Spark and
  DuckDB), so the unrolled-CTE oracle (``oracle.bpe_merges_sql``)
  walks bit-identical states — same pattern as the kmeans oracle.

Symbol encoding: each symbol is wrapped as ``\\x02sym\\x03``, so a pair
pattern ``\\x02x\\x03\\x02y\\x03`` can only match a whole-symbol
boundary (a symbol that merely ends in ``x`` cannot false-match), and
merging is plain string replace — no per-row Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texttools

_SO = chr(2)  # symbol open marker
_SC = chr(3)  # symbol close marker


def _encode_word(word) -> F.Column:
    """word -> \\x02c\\x03 per character."""
    return F.regexp_replace(word, "(.)", _SO + "$1" + _SC)


def _symbols(ws) -> F.Column:
    return F.regexp_extract_all(
        ws, F.lit(_SO + "([^" + _SC + "]*)" + _SC), F.lit(1)
    )


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    plan_hook=None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    (step, lhs, rhs, merged, cnt) — the tokenizer model.

    Stops early if the corpus runs out of adjacent pairs (every word
    fully merged); the oracle twin assumes the full ``n_merges`` run,
    which holds on any corpus with a word of length > n_merges+1.

    ``plan_hook(stage, df)``, when given, receives the first pass's
    pair-count DataFrame before the argmax pull — the representative
    per-merge plan for ``scripts/plan_audit.py``.
    """
    spark: SparkSession = docs.sparkSession
    wf = (
        docs.select(
            F.explode(texttools.tokens(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wn"))
        .select(_encode_word(F.col("word")).alias("ws"), "wn")
        .persist()
    )
    try:
        words = wf
        merges: list[tuple[int, str, str, str, int]] = []
        for step in range(1, n_merges + 1):
            pairs = (
                words.select(
                    F.explode(
                        texttools.word_shingles(_symbols(F.col("ws")), 2)
                    ).alias("pair"),
                    "wn",
                )
                .groupBy("pair")
                .agg(F.sum("wn").alias("cnt"))
            )
            if plan_hook is not None and step == 1:
                plan_hook("pair-count", pairs)
            best = pairs.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect()
            if not best:
                break
            pair, cnt = best[0].pair, best[0].cnt
            lhs, rhs = pair.split(" ", 1)
            merges.append((step, lhs, rhs, lhs + rhs, cnt))
            words = words.select(
                F.replace(
                    F.col("ws"),
                    F.lit(_SO + lhs + _SC + _SO + rhs + _SC),
                    F.lit(_SO + lhs + rhs + _SC),
                ).alias("ws"),
                "wn",
            )
        return spark.createDataFrame(
            merges, "step int, lhs string, rhs string, merged string, cnt bigint"
        )
    finally:
        wf.unpersist()


def learn_bpe_merges_batched(
    docs: DataFrame,
    text_col: str = "text",
    n_passes: int = 3,
    m_per_pass: int = 3,
    window: int = 32,
) -> DataFrame:
    """Batched BPE training: up to ``m_per_pass`` merges learned per
    distributed pass instead of one — the production shape for large
    vocabularies, where sequential training's one-Spark-job-per-merge
    (32k merges -> 32k jobs over the pair table) is the bottleneck;
    batching divides the job count by ~m.

    Batch rule (deterministic, engine-portable): rank the pass's pairs
    by (cnt DESC, pair ASC); within the top-``window`` rows keep the
    pairs that share NO symbol with ANY higher-ranked pair in the
    window, and select the first ``m_per_pass`` survivors. Symbol
    disjointness makes the batched rewrite exactly equal to applying
    those merges sequentially (a merge only creates/destroys
    adjacencies involving its own symbols), so each selected pair's
    count is its true sequential count. The difference vs pure
    sequential BPE is only which merges are chosen: new pairs created
    by merge i can't be picked until the next pass — the standard,
    documented batching approximation. One driver pull per pass: the
    top-``window`` ranked rows (model-parameter scale).

    Returns (pass, sel_rk, lhs, rhs, merged, cnt) — the merge table in
    (pass, sel_rk) order. Oracle twin: ``oracle.bpe_merges_batched_sql``
    replays the identical windowed rank/filter/select/rewrite per pass.
    """
    spark: SparkSession = docs.sparkSession
    wf = (
        docs.select(
            F.explode(texttools.tokens(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wn"))
        .select(_encode_word(F.col("word")).alias("ws"), "wn")
        .persist()
    )
    try:
        words = wf
        out: list[tuple[int, int, str, str, str, int]] = []
        for p in range(1, n_passes + 1):
            pairs = (
                words.select(
                    F.explode(
                        texttools.word_shingles(_symbols(F.col("ws")), 2)
                    ).alias("pair"),
                    "wn",
                )
                .groupBy("pair")
                .agg(F.sum("wn").alias("cnt"))
            )
            ranked = (
                pairs.orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(window)
                .collect()
            )
            used: set[str] = set()
            selected: list[tuple[str, str, int]] = []
            for row in ranked:
                lhs, rhs = row.pair.split(" ", 1)
                if (
                    lhs not in used
                    and rhs not in used
                    and len(selected) < m_per_pass
                ):
                    selected.append((lhs, rhs, row.cnt))
                used.update((lhs, rhs))
            if not selected:
                break
            for i, (lhs, rhs, cnt) in enumerate(selected, start=1):
                out.append((p, i, lhs, rhs, lhs + rhs, cnt))
            ws = F.col("ws")
            for lhs, rhs, _cnt in selected:
                ws = F.replace(
                    ws,
                    F.lit(_SO + lhs + _SC + _SO + rhs + _SC),
                    F.lit(_SO + lhs + rhs + _SC),
                )
            words = words.select(ws.alias("ws"), "wn")
        return spark.createDataFrame(
            out,
            "pass int, sel_rk int, lhs string, rhs string,"
            " merged string, cnt bigint",
        )
    finally:
        wf.unpersist()


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge list: per doc, the BPE token
    array and its length. Map-only (a literal replace chain over each
    word — the merge table is part of the PLAN, not a join), so it
    composes with pushdown and scales embarrassingly."""
    enc = F.transform(
        texttools.tokens(F.col(text_col)), lambda w: _encode_word(w)
    )
    def merge_fn(pat: str, rep: str):
        return lambda w: F.replace(w, F.lit(pat), F.lit(rep))

    for lhs, rhs in merges:
        enc = F.transform(
            enc,
            merge_fn(_SO + lhs + _SC + _SO + rhs + _SC, _SO + lhs + rhs + _SC),
        )
    toks = F.flatten(F.transform(enc, lambda w: _symbols(w)))
    return docs.select(
        F.col(id_col),
        toks.alias("bpe_tokens"),
        F.size(toks).cast("int").alias("n_bpe_tokens"),
    )
