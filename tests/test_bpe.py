"""BPE merge learning against a hand-worked classic example
(low/lower/newest — the Sennrich et al. running example shape)."""

from __future__ import annotations

import pytest

from banking_data_etl_pipeline_spark.operators import bpe


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        "doc_id long, text string",
    )


@pytest.mark.slowtier
def test_learn_bpe_merges_hand_worked(spark):
    # pair counts step 1: 'l o'=5, 'o w'=5 (tie -> lexicographic),
    # then 'lo w'=5, then 'e r'=2 (ties 'low e' lose lexicographically)
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.cnt)
        for r in bpe.learn_bpe_merges(_corpus(spark), n_merges=3)
        .orderBy("step")
        .collect()
    ]
    assert got == [
        (1, "l", "o", "lo", 5),
        (2, "lo", "w", "low", 5),
        (3, "e", "r", "er", 2),
    ]


def test_batched_bpe_excludes_conflicting_pairs(spark):
    """Conflict chain: 'a b' (rank 1) shares b with 'b c' and 'b d',
    so each pass selects ONE merge despite m_per_pass=3 — the
    conservative windowed rule never batches overlapping rewrites."""
    docs = spark.createDataFrame(
        [(1, "abc abc abd"), (2, "abc")], "doc_id long, text string"
    )
    got = [
        (r["pass"], r.sel_rk, r.lhs, r.rhs, r.merged, r.cnt)
        for r in bpe.learn_bpe_merges_batched(
            docs, n_passes=3, m_per_pass=3
        )
        .orderBy("pass", "sel_rk")
        .collect()
    ]
    assert got == [
        (1, 1, "a", "b", "ab", 4),
        (2, 1, "ab", "c", "abc", 3),
        (3, 1, "ab", "d", "abd", 1),
    ]


def test_batched_bpe_batches_disjoint_pairs_in_one_pass(spark):
    """Symbol-disjoint top pairs merge together in a single pass, and
    the trainer stops once no pairs remain."""
    docs = spark.createDataFrame(
        [(1, "ab cd ab cd")], "doc_id long, text string"
    )
    got = [
        (r["pass"], r.sel_rk, r.lhs, r.rhs, r.merged, r.cnt)
        for r in bpe.learn_bpe_merges_batched(
            docs, n_passes=4, m_per_pass=3
        )
        .orderBy("pass", "sel_rk")
        .collect()
    ]
    assert got == [
        (1, 1, "a", "b", "ab", 2),
        (1, 2, "c", "d", "cd", 2),
    ]


def test_batched_bpe_matches_sequential_when_one_per_pass(spark):
    """m_per_pass=1 degenerates to classic sequential BPE: same merges
    in the same order as learn_bpe_merges on the hand-worked corpus."""
    seq = [
        (r.lhs, r.rhs, r.cnt)
        for r in bpe.learn_bpe_merges(_corpus(spark), n_merges=3)
        .orderBy("step")
        .collect()
    ]
    bat = [
        (r.lhs, r.rhs, r.cnt)
        for r in bpe.learn_bpe_merges_batched(
            _corpus(spark), n_passes=3, m_per_pass=1
        )
        .orderBy("pass", "sel_rk")
        .collect()
    ]
    assert bat == seq


def test_learn_bpe_stops_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    out = bpe.learn_bpe_merges(docs, n_merges=5).collect()
    # one merge exhausts the corpus (every word becomes one symbol)
    assert [(r.step, r.merged, r.cnt) for r in out] == [(1, "ab", 2)]


def test_apply_bpe_uses_merges_in_order(spark):
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    docs = spark.createDataFrame(
        [(1, "lower newest")], "doc_id long, text string"
    )
    row = bpe.apply_bpe(docs, merges).first()
    assert row.bpe_tokens == ["low", "er", "n", "e", "w", "e", "s", "t"]
    assert row.n_bpe_tokens == 8


def test_apply_bpe_never_merges_across_words(spark):
    # "a b" would merge if boundaries leaked between words
    docs = spark.createDataFrame([(1, "xa bx")], "doc_id long, text string")
    row = bpe.apply_bpe(docs, [("a", "b")]).first()
    assert row.bpe_tokens == ["x", "a", "b", "x"]
