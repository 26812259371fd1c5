"""Round-8d operators (closed out in r9 — the batch that shipped
without its recipe): Kneser–Ney bigram cross-entropy, decile lift
table, column entropy profile. Value parity is the oracle gate's job;
these pin hand-computed formulas on tiny frames plus the structural
invariants a hash match can't express (total banding order, NULL
conventions, token-count conservation)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.operators import corpus, profiling


# ---------------------------------------------------------------- KN


def _kn_p(c2, c1, n1p, nend, ntot, d=0.75):
    """The interpolated Kneser–Ney conditional, straight from the
    Kneser & Ney 1995 formula (independent of the SQL text)."""
    return max(c2 - d, 0.0) / c1 + d * n1p / c1 * (nend / ntot)


def test_kneser_ney_hand_computed_tiny_corpus(spark):
    # d1 bigrams: "a b" x2, "b a" x1; d2: "b c"; d3: none (1 token)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c"), (3, "a")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in corpus.kneser_ney_xent(docs).collect()}
    # model: bigram types {"a b":2, "b a":1, "b c":1}, ntot=3
    # prefix a: c1=2, n1p=1; prefix b: c1=2, n1p=2
    # continuation fan-in: a<-{b}, b<-{a}, c<-{b} -> nend=1 each
    p_b_a = _kn_p(2, 2, 1, 1, 3)  # P(b|a) = 1.25/2 + .75*.5/3 = 0.75
    p_a_b = _kn_p(1, 2, 2, 1, 3)  # P(a|b) = .125 + .75/3 = 0.375
    p_c_b = _kn_p(1, 2, 2, 1, 3)
    assert abs(p_b_a - 0.75) < 1e-12 and abs(p_a_b - 0.375) < 1e-12
    d1 = round(
        (2 * round(-math.log(p_b_a), 12) + round(-math.log(p_a_b), 12))
        / 3,
        6,
    )
    d2 = round(round(-math.log(p_c_b), 12) / 1, 6)
    assert out[1].n_bigrams == 3 and float(out[1].kn_xent) == d1
    assert out[2].n_bigrams == 1 and float(out[2].kn_xent) == d2
    assert out[3].n_bigrams == 0 and out[3].kn_xent is None


def test_kneser_ney_discount_mass_goes_to_continuation_count():
    # the "San Francisco" correction: a word can be FREQUENT but
    # predictable (few left-contexts). Raising raw frequency without
    # new contexts must not raise its back-off probability — only
    # nend/ntot enters the continuation term.
    low_freq = _kn_p(c2=1, c1=10, n1p=5, nend=2, ntot=20)
    high_freq_same_contexts = _kn_p(c2=1, c1=10, n1p=5, nend=2, ntot=20)
    more_contexts = _kn_p(c2=1, c1=10, n1p=5, nend=6, ntot=20)
    assert low_freq == high_freq_same_contexts
    assert more_contexts > low_freq


def test_kneser_ney_counts_conserve_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "q"), (3, "m n"), (4, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in corpus.kneser_ney_xent(docs).collect()}
    # every doc appears; n_bigrams = max(tokens-1, 0)
    assert set(out) == {1, 2, 3, 4}
    assert [out[i].n_bigrams for i in (1, 2, 3, 4)] == [2, 0, 1, 0]
    assert out[2].kn_xent is None and out[4].kn_xent is None


# -------------------------------------------------------- lift table


def test_lift_table_hand_computed_two_bands(spark):
    # ids 1..10, scores 10..1 (total order), top band 4/5 positive,
    # bottom band 1/5; base rate 0.5
    rows = [(i, 11.0 - i, i in (1, 2, 3, 4, 10)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["id", "score", "label"])
    out = {
        r.band: r
        for r in profiling.lift_table(
            df, "score", "label", "id", n_bands=2
        ).collect()
    }
    b1, b2 = out[1], out[2]
    assert (b1.n, b1.n_pos) == (5, 4)
    assert b1.resp_rate == 0.8 and b1.lift == round(0.8 / 0.5, 6)
    assert (b1.cum_n, b1.cum_pos) == (5, 4)
    assert (b2.n, b2.n_pos) == (5, 1)
    assert b2.resp_rate == 0.2 and b2.lift == round(0.2 / 0.5, 6)
    # the full-population cumulative row is always rate=base, lift=1
    assert (b2.cum_n, b2.cum_pos) == (10, 5)
    assert b2.cum_resp_rate == 0.5 and b2.cum_lift == 1.0


def test_lift_table_ties_break_by_id_for_determinism(spark):
    # all scores equal -> banding must fall back to id asc: ids 1..4
    # land in band 1, ids 5..8 in band 2, regardless of partitioning
    rows = [(i, 1.0, i <= 4) for i in range(1, 9)]
    df = spark.createDataFrame(rows, ["id", "score", "label"]).repartition(8)
    out = {
        r.band: r
        for r in profiling.lift_table(
            df, "score", "label", "id", n_bands=2
        ).collect()
    }
    assert (out[1].n_pos, out[2].n_pos) == (4, 0)


def test_lift_table_conserves_population(spark):
    rows = [(i, float(i % 7), i % 3 == 0) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["id", "score", "label"])
    out = profiling.lift_table(df, "score", "label", "id").collect()
    assert len(out) == 10
    assert sum(r.n for r in out) == 100
    assert sum(r.n_pos for r in out) == 33
    last = max(out, key=lambda r: r.band)
    assert (last.cum_n, last.cum_pos) == (100, 33)


# ---------------------------------------------------- column entropy


def test_column_entropy_hand_computed(spark):
    df = spark.createDataFrame(
        [("x", "k", "a"), ("x", "k", "a"), ("y", "k", "a"), ("y", "k", "b")],
        ["even", "const", "skew"],
    )
    out = {
        r.column: r
        for r in profiling.column_entropy(
            df, ["even", "const", "skew"]
        ).collect()
    }
    # even: p = (.5, .5) -> H = 1 bit, fully normalized
    assert out["even"].entropy == 1.0
    assert out["even"].norm_entropy == 1.0
    assert out["even"].top_share == 0.5
    # const: single value -> H = 0, norm undefined (log2(1) = 0)
    assert out["const"].entropy == 0.0
    assert out["const"].norm_entropy is None
    assert out["const"].top_share == 1.0
    # skew: p = (.75, .25)
    h = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert out["skew"].entropy == round(h, 6)
    assert out["skew"].norm_entropy == round(h / 1.0, 6)
    assert out["skew"].top_share == 0.75
    assert all(
        (r.n, r.distinct_n) == (4, {"even": 2, "const": 1, "skew": 2}[c])
        for c, r in out.items()
    )


def test_column_entropy_uniform_is_log2_distinct(spark):
    # 8 equally-frequent values -> H = 3 bits exactly, norm = 1
    df = spark.createDataFrame(
        [(v,) for v in range(8) for _ in range(5)], ["v"]
    )
    row = profiling.column_entropy(df, ["v"]).collect()[0]
    assert (row.n, row.distinct_n) == (40, 8)
    assert row.entropy == 3.0 and row.norm_entropy == 1.0
    assert row.top_share == round(5 / 40, 6)
