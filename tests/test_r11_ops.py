"""Round-11 operators: Count-Min heavy-hitter n-grams (structural
over-count guarantee, merge exactness, the ε·N error bound on a fixed
corpus) and the staged HITS lifecycle."""

from __future__ import annotations

import math
import random
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark import queries as Q
from banking_data_etl_pipeline_spark.operators import sketches

from conftest import SF_DIR

_WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
_DOC = st.lists(_WORD, min_size=0, max_size=20).map(" ".join)


def _brute_ngrams(texts, n=3) -> Counter:
    c: Counter = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for i in range(len(toks) - n + 1):
            c[" ".join(toks[i : i + n])] += 1
    return c


@settings(max_examples=6, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_cms_exact_counts_and_overcount_nonneg(spark, texts):
    """The exact leg must equal brute force, and the sketch can only
    OVER-count (collisions add) — w=8/d=2 forces collisions so the
    invariant is exercised, not vacuous."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = sketches.cms_ngram_hitters_exact(
        docs, n=3, d=2, w=8, k=50
    ).collect()
    want = _brute_ngrams(texts)
    got = {r.ngram: r.exact_count for r in rows}
    top = dict(
        sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    )
    assert got == top
    for r in rows:
        assert r.overcount >= 0
        assert r.estimate == r.exact_count + r.overcount


@settings(max_examples=4, deadline=None)
@given(st.lists(_DOC, min_size=2, max_size=8))
def test_cms_counters_merge_exactly(spark, texts):
    """Counter tables SUM-merge: build over the full corpus == cell-wise
    sum of the two halves' tables — the mergeability that makes the
    sketch shardable for free."""
    full = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    _g, c_full, _b = sketches._cms_ngram_parts(full, 3, 2, 8, "text")
    halves = []
    for i in (0, 1):
        h = full.filter(F.col("doc_id") % 2 == i)
        _g, c, _b = sketches._cms_ngram_parts(h, 3, 2, 8, "text")
        halves.append(c)
    merged = (
        halves[0]
        .unionByName(halves[1])
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    as_map = lambda df: {
        (r.j, r.bucket): r.cnt for r in df.collect()
    }
    assert as_map(c_full) == as_map(merged)


def test_cms_error_bound_on_fixed_corpus(spark):
    """CM bound: P[est > exact + (e/w)·N] <= e^-d per key. On a fixed
    corpus (fixed salts => fully deterministic) the violating-key
    fraction must sit within ~2.7x of the e^-d expectation."""
    rng = random.Random(0)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(40)) for _ in range(120)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    d, w = 4, 64
    rows = sketches.cms_ngram_hitters_exact(
        docs, n=3, d=d, w=w, k=10_000
    ).collect()
    n_total = sum(r.exact_count for r in rows)
    bound = math.e / w * n_total
    bad = sum(1 for r in rows if r.overcount > bound)
    assert len(rows) > 500  # the bound test has teeth
    assert bad / len(rows) <= 0.05  # e^-4 ~ 1.8% expected


def test_cms_sketch_ranking_dominates_exact_top1(spark):
    """Estimates dominate true counts, so the sketch ranking's top
    estimate must be >= the true top count — a heavy hitter can never
    be pushed OUT of the sketch's view, only impostors pushed in."""
    texts = ["a b c a b c a b c", "x y z", "a b c d e"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    sk = sketches.cms_ngram_hitters(docs, n=3, d=2, w=8, k=5).collect()
    ex = sketches.cms_ngram_hitters_exact(
        docs, n=3, d=2, w=8, k=5
    ).collect()
    assert sk[0].rank == 1 and ex[0].rank == 1
    assert sk[0].estimate >= ex[0].exact_count


def test_hits_prebuilt_equals_staged_hits(spark):
    """The dual-orientation probe must reproduce the single-orientation
    staged result exactly (same oracle; this pins Spark-vs-Spark too)."""
    a = sorted(map(tuple, Q.hits(spark, SF_DIR).collect()))
    b = sorted(map(tuple, Q.hits_prebuilt(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0
