"""Unigram-LM tokenizer training — the SentencePiece-style companion
to BPE (Kudo 2018: seed a large candidate-piece set, iterate
expectation/prune rounds, keep the pieces the segmentations actually
use). r12 verdict item 5.

The Spark-first shape mirrors ``operators.bpe``:

- **One corpus pass, total.** The corpus collapses to a (word, freq)
  vocabulary table first; seeding and every EM round then run over the
  VOCAB table (Zipf-small — ≪ corpus). The 100 TB of text is touched
  exactly once.
- **Expected counts are corpus groupBys.** Each round's piece-usage
  counts aggregate distributed (map-side combined, exact bigints);
  only the vocab-sized count table is pulled to the driver for the
  prune (model-parameter scale — the BPE argmax / kmeans centroid
  pull).
- **Deterministic & engine-portable, by construction.** The
  segmentation is a HARD-EM (Viterbi-style) dynamic program over
  exact integers — no log-prob floats anywhere, so the DuckDB twin
  (``oracle.unigram_sql``: the same DP unrolled to ``max_word`` steps,
  the ``bfs_depths_sql`` pattern) walks bit-identical states.

Segmentation objective (the SPEC both engines implement): among
segmentations of a word into vocab pieces, minimize the piece count,
tie-break by maximizing the sum of current piece counts, tie-break by
the lexicographically smallest piece sequence. The DP keeps, per
(#pieces-so-far, position), the single best partial state (max sum,
then min sequence) — states compare through the same padded-string
key in both engines: ``%02d`` piece count, ``%013d`` (10^12 − sum),
then the sequence joined by chr(31) (below every word character, so
joined-string order equals piece-tuple order).

Prune rule per round: rank used pieces by (count DESC, piece ASC),
keep the top ⌊3·|used|/4⌋, and always keep every single character
(with its usage count, 0 if unused) so any word stays segmentable.

Words longer than ``max_word`` characters are excluded from training
and application in BOTH engines — the fixed DP unroll bound. At
100 TB raise the cap; DP cost is linear in it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texttools

SEP = "\x1f"  # sequence separator: below [0-9a-z], so string order
#               over joined sequences == lexicographic piece order
_PAD = 10**12  # sum encoding base: counts stay far below this


def segment_key(word: str, vocab: dict[str, int], max_piece: int = 4):
    """The shared-spec DP (module docstring): returns the best
    segmentation's key string ``%02d(t) %013d(10^12-sum) seq`` or
    None when the word cannot be segmented from ``vocab``."""
    n = len(word)
    if n == 0:
        return None
    # best[t][pos] = (sum, seq) — single dominant partial per state
    best = [[None] * (n + 1) for _ in range(n + 1)]
    best[0][0] = (0, "")
    complete = []
    for t in range(1, n + 1):
        for pos in range(n):
            st = best[t - 1][pos]
            if st is None:
                continue
            s, seq = st
            for ln in range(1, min(max_piece, n - pos) + 1):
                piece = word[pos : pos + ln]
                c = vocab.get(piece)
                if c is None:
                    continue
                ns = s + c
                nseq = seq + SEP + piece if seq else piece
                cur = best[t][pos + ln]
                if (
                    cur is None
                    or ns > cur[0]
                    or (ns == cur[0] and nseq < cur[1])
                ):
                    best[t][pos + ln] = (ns, nseq)
        if best[t][n] is not None:
            s, seq = best[t][n]
            complete.append(f"{t:02d}{_PAD - s:013d}{seq}")
    return min(complete) if complete else None


def _word_freqs(
    docs: DataFrame, text_col: str, max_word: int
) -> DataFrame:
    """(word, wn): the one corpus-collapsing pass."""
    return (
        docs.select(
            F.explode(texttools.tokens(F.col(text_col))).alias("word")
        )
        .filter(F.length("word") <= max_word)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wn"))
    )


def _seed_counts(wf: DataFrame, max_piece: int) -> DataFrame:
    """All substrings of length 1..max_piece with occurrence counts
    weighted by word frequency — the unigram candidate seed, one
    explode + groupBy over the vocab table (pure Column exprs)."""
    return (
        wf.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, length(word) - 1),"
                    " i -> transform("
                    f"sequence(1, least({max_piece}, length(word) - i)),"
                    " l -> substring(word, i + 1, l))))"
                )
            ).alias("piece"),
            "wn",
        )
        .groupBy("piece")
        .agg(F.sum("wn").cast("bigint").alias("cnt"))
    )


def _segment_words(
    wf: DataFrame, vocab: dict[str, int], max_piece: int
) -> DataFrame:
    """(word, key) for every segmentable word — Arrow-batched
    ``mapInPandas`` (the per-word DP has no vectorized builtin; the
    vocab rides the closure at model-parameter size, the literal-
    centroid pattern)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = [
                segment_key(w, vocab, max_piece) for w in pdf["word"]
            ]
            out = pd.DataFrame({"word": pdf["word"], "key": keys})
            yield out[out["key"].notna()]

    return wf.select("word").mapInPandas(op, "word string, key string")


def _usage_counts(
    seg: DataFrame, wf: DataFrame
) -> DataFrame:
    """Piece-usage expected counts: explode each best segmentation's
    pieces (parsed from the key string — the engine-shared encoding),
    weight by word frequency, ONE distributed groupBy."""
    return (
        seg.select(
            "word",
            F.explode(
                F.split(F.substring("key", 16, 1 << 20), SEP)
            ).alias("piece"),
        )
        .join(wf, "word")
        .groupBy("piece")
        .agg(F.sum("wn").cast("bigint").alias("cnt"))
    )


def _prune(counts: list[tuple[str, int]], chars: list[str]):
    """Driver-side prune (vocab-sized input): top ⌊3n/4⌋ by
    (cnt DESC, piece ASC) ∪ every single char (cnt 0 if unused)."""
    ranked = sorted(counts, key=lambda pc: (-pc[1], pc[0]))
    keep = ranked[: (3 * len(ranked)) // 4]
    kept = dict(keep)
    for ch in chars:
        if ch not in kept:
            used = dict(counts).get(ch, 0)
            kept[ch] = used
    return kept


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 2,
    max_piece: int = 4,
    max_word: int = 12,
    plan_hook=None,
) -> dict[str, int]:
    """Train the unigram-LM vocab: seed with all ≤``max_piece``
    substrings, then ``rounds`` hard-EM iterations (segment under
    current counts → expected-count groupBy → prune). Returns the
    final {piece: count} model (driver-side, model-parameter scale —
    callers stage it like centroids)."""
    wf = _word_freqs(docs, text_col, max_word).persist()
    try:
        seed = _seed_counts(wf, max_piece)
        if plan_hook is not None:
            plan_hook("seed", seed)
        vocab = {r["piece"]: int(r["cnt"]) for r in seed.collect()}
        chars = [p for p in vocab if len(p) == 1]
        for r in range(rounds):
            seg = _segment_words(wf, vocab, max_piece)
            use = _usage_counts(seg, wf)
            if plan_hook is not None and r == 0:
                plan_hook("usage", use)
            counts = [
                (row["piece"], int(row["cnt"])) for row in use.collect()
            ]
            vocab = _prune(counts, chars)
        return vocab
    finally:
        wf.unpersist()


def unigram_merges(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 2,
    max_piece: int = 4,
    max_word: int = 12,
    vocab: dict[str, int] | None = None,
) -> DataFrame:
    """The trainer as a query: the final vocab as (rank, piece, cnt),
    rank by (cnt DESC, piece ASC). ``vocab`` injects a prebuilt model
    (the staged-centroids pattern); absent, trains fresh."""
    if vocab is None:
        vocab = train_unigram(docs, text_col, rounds, max_piece, max_word)
    rows = sorted(vocab.items(), key=lambda pc: (-pc[1], pc[0]))
    return docs.sparkSession.createDataFrame(
        [(i + 1, p, c) for i, (p, c) in enumerate(rows)],
        "rank int, piece string, cnt bigint",
    )


def unigram_tokenize(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 2,
    max_piece: int = 4,
    max_word: int = 12,
    vocab: dict[str, int] | None = None,
) -> DataFrame:
    """APPLY the trained unigram model: per document, segment every
    (≤``max_word``-char) token under the final vocab and aggregate —
    token count, total piece count, total characters, and the
    compression ratio chars/pieces (one terminal division, 6 dp).

    Scale shape: segmentation runs once per DISTINCT word (the vocab
    table), then one equi-join explodes it back over the corpus tokens
    and ONE groupBy per doc aggregates — the corpus is never segmented
    row-by-row."""
    if vocab is None:
        vocab = train_unigram(docs, text_col, rounds, max_piece, max_word)
    wf = _word_freqs(docs, text_col, max_word)
    seg = _segment_words(wf, vocab, max_piece).select(
        "word",
        F.substring("key", 1, 2).cast("int").alias("t"),
        F.length("word").cast("bigint").alias("wc"),
    )
    docw = docs.select(
        F.col(id_col),
        F.explode(texttools.tokens(F.col(text_col))).alias("word"),
    ).filter(F.length("word") <= max_word)
    return (
        docw.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("t").cast("bigint").alias("n_pieces"),
            F.sum("wc").cast("bigint").alias("n_chars"),
        )
        .select(
            id_col,
            "n_words",
            "n_pieces",
            "n_chars",
            F.round(
                F.col("n_chars").cast("double")
                / F.col("n_pieces").cast("double"),
                6,
            ).alias("chars_per_piece"),
        )
    )
