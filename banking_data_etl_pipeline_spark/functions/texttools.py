"""Text-analysis Column builders for the ``documents`` table: token
counting, quality scoring, language ID, fingerprinting, shingling.

All native higher-order functions (transform/filter/aggregate) — no
Python UDFs — so they run JVM-side at 100 TB. Every builder has an
ANSI-SQL twin in ``__spark_entry__.oracle_sql`` (DuckDB list lambdas);
regex is avoided where Java-regex vs RE2 semantics could diverge
(punctuation counting uses ``translate``, which is exact in both).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII punctuation, for translate()-based counting (identical semantics
# in Spark and DuckDB, unlike regex character classes).
PUNCT_CHARS = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

# Tiny stopword lists for the n-gram-free language-ID heuristic.
# Deliberately small and hard-coded so the SQL twin is identical.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "con", "para"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break order


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed (so '' -> [])."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
# marks — the usual first pass before byte-pair merging. Restricted to
# constructs with identical semantics in Java regex (Spark) and RE2
# (DuckDB) so the oracle twin matches byte-for-byte.
BPE_TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokens of the lowercased text."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_PATTERN), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.translate(text, PUNCT_CHARS, ""))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(punct_count(text) / n.cast("double"))


def stopword_hits(toks: Column, lang: str) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_hits(toks, lang) / n.cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length saturation (40%), low
    punctuation (30%), English stopword density saturating at 0.4 (30%).
    """
    n_tok = token_count(text).cast("double")
    length_factor = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_factor = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    stop_factor = F.least(stopword_ratio(text, "en") / F.lit(0.4), F.lit(1.0))
    return (
        F.lit(0.4) * length_factor
        + F.lit(0.3) * punct_factor
        + F.lit(0.3) * stop_factor
    )


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    n = F.size(toks)
    return {
        lang: F.when(n == 0, F.lit(0.0)).otherwise(
            stopword_hits(toks, lang) / n.cast("double")
        )
        for lang in LANG_ORDER
    }


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword density; 'und' (undetermined)
    when no language scores > 0. Ties break by LANG_ORDER."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in LANG_ORDER:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def _index_seq(cnt: Column) -> Column:
    """[1..cnt], or [] when cnt < 1. (Bare ``sequence(1, 0)`` would
    generate a *descending* [1, 0] in Spark — guard against it.)"""
    return F.when(cnt < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), cnt)
    )


def char_shingles(text: Column, n: int) -> Column:
    """All character n-grams of the lowercased text (empty array when
    shorter than n)."""
    low = F.lower(text)
    cnt = F.length(low) - F.lit(n - 1)
    return F.transform(
        _index_seq(cnt),
        lambda i: F.substring(low, i, F.lit(n)),
    )


def word_shingles(toks: Column, n: int) -> Column:
    """All word n-grams (space-joined) of a token array.

    Built as n-1 zip_with passes over shifted slices (shingle i =
    toks[i] || ' ' || toks[i+1] || ...) instead of one slice+join PER
    SHINGLE — n+1 array traversals total rather than O(len) slice
    allocations, which matters because higher-order functions are
    interpreted, not codegen'd."""
    m = F.size(toks) - F.lit(n - 1)
    acc = F.slice(toks, 1, m)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(toks, k, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(m < 1, F.array().cast("array<string>")).otherwise(acc)


def fingerprint(text: Column, n: int = 8) -> Column:
    """Document fingerprint: lexicographic min of md5 over character
    n-gram shingles (a deterministic min-hash; stands in for the
    rolling-hash winnowing step — md5-hex min is order-portable across
    engines, which a custom rolling hash modulus is not). Null for
    texts shorter than n."""
    return F.array_min(F.transform(char_shingles(text, n), F.md5))


# PII masking patterns, restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): no backrefs, no
# lookaround, ASCII classes only. \d is ASCII [0-9] in both (RE2
# without the (?s) unicode-class flag, Java without UNICODE_CHARACTER_CLASS).
EMAIL_PATTERN = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_PATTERN = r"\d{3}[-.]\d{3}[-.]\d{4}"


def redact_pii(text: Column) -> Column:
    """Mask emails then phone numbers — the standard scrub step before
    a corpus enters a training mix. Pure regexp_replace: JVM-side,
    map-only, no UDF; at 100 TB this rides inside whole-stage codegen
    next to the scan."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )



def _run_stats(arr: Column) -> Column:
    """struct(best, nd) over a string array: longest equal-run length
    in sorted order (= max element multiplicity) and distinct count.
    One sort + one linear ``aggregate`` fold, all map-side."""
    first = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("nd"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (
                acc["nd"] + F.when(x == acc["prev"], F.lit(0)).otherwise(F.lit(1))
            ).alias("nd"),
        )

    return F.aggregate(F.array_sort(arr), first, step)


def repetition_signals(text: Column) -> list[Column]:
    """Gopher-style within-document repetition signals, entirely
    map-side (zero shuffles: every quantity is a higher-order-function
    fold over the doc's own token array — the scale shape you want for
    a 100 TB quality-filter pass, one codegen stage riding the scan):

    - ``top_bigram_frac``: share of bigram occurrences taken by the
      most frequent bigram (boilerplate/chant detector),
    - ``dup_trigram_frac``: share of trigram occurrences that are
      repeats of an earlier trigram (loop detector).

    Both are NULL for docs too short to form the n-gram. Per-doc cost
    is one n-gram sort + one linear fold (see ``_run_stats``) —
    O(n log n) in the doc, constant per corpus row, embarrassingly
    parallel. Ratios round to 6 dp so the DuckDB twin (list_* lambdas
    over the same integer counts) hash-matches bit-for-bit.
    """
    toks = tokens(text)
    bg = word_shingles(toks, 2)
    tg = word_shingles(toks, 3)
    # max multiplicity == longest equal-run in the SORTED array, and
    # distinct count falls out of the same pass — one O(n log n) sort
    # + one linear fold per doc, vs the naive
    # transform(distinct, b -> count(filter(== b))) which is O(d*n)
    # comparisons in interpreted HOFs (measured ~6x slower end-to-end
    # on the bench corpus)
    bg_stats = _run_stats(bg)
    top_bigram_frac = F.when(
        F.size(bg) > 0, F.round(bg_stats["best"] / F.size(bg), 6)
    )
    tg_nd = _run_stats(tg)["nd"]
    dup_trigram_frac = F.when(
        F.size(tg) > 0,
        F.round((F.size(tg) - tg_nd) / F.size(tg), 6),
    )
    return [
        F.size(toks).cast("long").alias("n_words"),
        top_bigram_frac.alias("top_bigram_frac"),
        dup_trigram_frac.alias("dup_trigram_frac"),
        (
            (F.coalesce(top_bigram_frac, F.lit(0.0)) <= F.lit(0.18))
            & (F.coalesce(dup_trigram_frac, F.lit(0.0)) <= F.lit(0.30))
        ).alias("keep"),
    ]


def normalize_text(text: Column) -> Column:
    """Canonical text normalization — the first mutation a crawl
    pipeline applies: control characters (C0 + DEL) become spaces,
    whitespace runs collapse to one space, ends trimmed, lowercased.
    Pure regexp_replace chain (JVM-side, codegen'd); the character
    classes are written explicitly ('[ \\t\\n\\x0b\\f\\r]' instead of
    '\\s') because Java and RE2 disagree on the \\s class — the
    explicit form makes the DuckDB twin byte-identical."""
    no_ctrl = F.regexp_replace(text, r"[\x00-\x1f\x7f]", " ")
    collapsed = F.regexp_replace(no_ctrl, r"[ \t\n\x0b\f\r]+", " ")
    return F.lower(F.trim(collapsed))
