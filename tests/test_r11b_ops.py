"""Round-11b operators: Mann–Kendall trend, CUSUM changepoint,
Kaplan–Meier survival, Gini concentration, item-item CF, Good–Turing,
lexical diversity, Heaps'-law fit — each against a brute-force Python
reference (the r10 lesson: property tests found 2 real bugs pre-close)."""

from __future__ import annotations

import pytest

import datetime as dt
import math
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.operators import (
    corpus,
    graph,
    profiling,
    timeseries,
)

EPOCH = dt.datetime(2024, 1, 1)


def _events_from_daily(spark, counts_by_type):
    """counts_by_type: {etype: [c_day0, c_day1, ...]} -> events frame
    with exactly that many rows per (type, day)."""
    rows = []
    for etype, series in counts_by_type.items():
        for day, c in enumerate(series):
            for j in range(c):
                rows.append(
                    (etype, EPOCH + dt.timedelta(days=day, seconds=j))
                )
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def _brute_mk(series):
    n = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(series)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_num = n * (n - 1) * (2 * n + 5) - tie_term
    var = var_num / 18.0
    if var_num <= 0:
        return s, var, None
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, var, z


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=6), min_size=3, max_size=10)
)
def test_mann_kendall_matches_brute_force(spark, series):
    ev = _events_from_daily(spark, {"x": series})
    row = timeseries.mann_kendall(ev).collect()[0]
    s, var, z = _brute_mk(series)
    assert row.n_days == len(series)
    assert row.s_stat == s
    assert abs(row.var_s - round(var, 6)) < 1e-9
    if z is None:
        assert row.z_stat is None
    else:
        assert abs(row.z_stat - round(z, 6)) < 1e-9


def test_mann_kendall_monotone_series_is_significant(spark):
    """A strictly increasing series maxes S = n(n-1)/2 and gives a
    positive z."""
    n = 8
    ev = _events_from_daily(spark, {"up": list(range(1, n + 1))})
    row = timeseries.mann_kendall(ev).collect()[0]
    assert row.s_stat == n * (n - 1) // 2
    assert row.z_stat > 2.0


def _brute_cusum(series):
    n = len(series)
    total = sum(series)
    best = None
    cum = 0
    for t, c in enumerate(series, start=1):
        cum += c
        scaled = n * cum - t * total
        key = (abs(scaled), -t)  # max |C|, earliest day wins ties
        if best is None or key > best[0]:
            best = (key, t - 1, abs(scaled))
    return best[1], best[2]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=9), min_size=3, max_size=12)
)
def test_cusum_matches_brute_force(spark, series):
    ev = _events_from_daily(spark, {"x": series})
    row = timeseries.cusum_changepoint(ev).collect()[0]
    day0 = int(
        (EPOCH - dt.datetime(1970, 1, 1)).total_seconds() // 86400
    )
    want_day, want_abs = _brute_cusum(series)
    assert row.change_day - day0 == want_day
    assert row.cusum_abs == want_abs
    assert row.total == sum(series)


def test_cusum_localizes_a_step_shift(spark):
    """Level shift mid-series: the argmax of |cumulative deviation|
    is the last pre-shift day."""
    series = [5] * 6 + [20] * 6
    ev = _events_from_daily(spark, {"x": series})
    row = timeseries.cusum_changepoint(ev).collect()[0]
    day0 = int(
        (EPOCH - dt.datetime(1970, 1, 1)).total_seconds() // 86400
    )
    assert row.change_day - day0 == 5


def _km_events(spark, subjects):
    """subjects: list of (signup_day, purchase_day_or_None, last_day).
    Builds one signup + optional purchase + a trailing view event per
    user, plus a global 'horizon' view on day 40 so every user's
    end-of-data cap is >= 7 days."""
    rows = []
    for uid, (s, p, last) in enumerate(subjects):
        rows.append((uid, "signup", EPOCH + dt.timedelta(days=s)))
        if p is not None:
            rows.append(
                (uid, "purchase", EPOCH + dt.timedelta(days=p, hours=1))
            )
        rows.append((uid, "view", EPOCH + dt.timedelta(days=last)))
    rows.append((10_000, "view", EPOCH + dt.timedelta(days=40)))
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def _brute_km(subjects, horizon=7):
    durs = []
    for s, p, _last in subjects:
        cap = horizon  # the day-40 sentinel keeps end-of-data >= 7d out
        if p is not None:
            raw = p - s  # +1h keeps DIV at the day difference
            if raw < cap:
                durs.append((raw, 1))
                continue
        durs.append((cap, 0))
    out = []
    surv = 1.0
    n_all = len(durs)
    for t in sorted({d for d, _ in durs}):
        d_t = sum(1 for d, o in durs if d == t and o == 1)
        n_t = n_all - sum(1 for d, _ in durs if d < t)
        if d_t == 0:
            continue
        surv = surv * (1.0 - d_t / n_t)
        out.append((t, n_t, d_t, round(surv, 6)))
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),  # signup day
            st.one_of(
                st.none(), st.integers(min_value=0, max_value=20)
            ),  # purchase day
        ),
        min_size=1,
        max_size=12,
    )
)
@pytest.mark.slowtier
def test_survival_km_matches_brute_force(spark, raw):
    subjects = []
    for s, p in raw:
        p_eff = p if (p is not None and p >= s) else None
        subjects.append((s, p_eff, max(s, p_eff or 0)))
    ev = _km_events(spark, subjects)
    got = sorted(
        (r.t_day, r.n_risk, r.d_events, r.survival)
        for r in timeseries.survival_km(ev).collect()
    )
    assert got == _brute_km(subjects)


def test_survival_km_curve_is_nonincreasing(spark):
    subjects = [(0, 1, 5), (0, 2, 5), (0, None, 9), (1, 9, 9), (2, 3, 8)]
    ev = _km_events(spark, subjects)
    rows = sorted(
        timeseries.survival_km(ev).collect(), key=lambda r: r.t_day
    )
    vals = [r.survival for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(0.0 < v <= 1.0 for v in vals)


def _brute_gini(spends):
    xs = sorted(spends)
    n = len(xs)
    sx = sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    return 2.0 * six / (n * sx) - (n + 1.0) / n


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=500), min_size=2, max_size=20
    )
)
def test_gini_matches_brute_force(spark, spends):
    orders = spark.createDataFrame(
        [(i, i, float(x)) for i, x in enumerate(spends)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(i, "SEG") for i in range(len(spends))],
        "c_custkey long, c_mktsegment string",
    )
    row = profiling.gini_concentration(orders, cust).collect()[0]
    assert abs(row.gini - round(_brute_gini(spends), 6)) < 1e-9
    assert 0.0 <= row.gini < 1.0
    assert row.n_customers == len(spends)


def test_gini_equal_spend_is_zero_and_top_share_is_decile(spark):
    orders = spark.createDataFrame(
        [(i, i, 100.0) for i in range(10)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(i, "SEG") for i in range(10)],
        "c_custkey long, c_mktsegment string",
    )
    row = profiling.gini_concentration(orders, cust).collect()[0]
    assert row.gini == 0.0
    assert row.top10_share == 0.1


def _brute_itemitem(baskets, cap=64, top=20):
    kept = {c: ps for c, ps in baskets.items() if len(ps) <= cap}
    npart = Counter()
    for ps in kept.values():
        for p in ps:
            npart[p] += 1
    common = Counter()
    for ps in kept.values():
        sp = sorted(ps)
        for i in range(len(sp)):
            for j in range(i + 1, len(sp)):
                common[(sp[i], sp[j])] += 1
    scored = [
        (
            round(c / math.sqrt(npart[a] * npart[b]), 6),
            c,
            a,
            b,
            npart[a],
            npart[b],
        )
        for (a, b), c in common.items()
    ]
    scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    return [
        (a, b, c, na, nb, cos) for cos, c, a, b, na, nb in scored[:top]
    ]


@settings(max_examples=4, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=8),
        st.sets(
            st.integers(min_value=0, max_value=10), min_size=1, max_size=6
        ),
        min_size=2,
        max_size=8,
    )
)
def test_itemitem_cf_matches_brute_force(spark, baskets):
    rows, ok = [], 0
    for cust, parts in baskets.items():
        for p in parts:
            rows.append((ok, cust, p))
            ok += 1
    orders = spark.createDataFrame(
        [(i, c, p) for i, (c, p) in enumerate(
            {(c, p) for _, c, p in rows}
        )],
        "o_orderkey long, o_custkey long, l_partkey long",
    )
    # one order per (cust, part); lineitem keyed back by o_orderkey
    li = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "l_partkey"
    )
    got = [
        (r.part_a, r.part_b, r.common, r.n_a, r.n_b, r.cosine)
        for r in graph.itemitem_cf(
            orders.select("o_orderkey", "o_custkey"), li
        ).collect()
    ]
    want = _brute_itemitem(baskets)
    assert got == want


def test_itemitem_cf_basket_cap_drops_hot_customers(spark):
    """A customer over the cap must contribute NOTHING — neither pairs
    nor incidence counts."""
    hot = [(0, 0, p) for p in range(70)]  # basket 70 > cap 64
    cold = [(1, 1, 1), (2, 1, 2), (3, 2, 1), (4, 2, 2)]
    rows = hot + cold
    orders = spark.createDataFrame(
        [(i, c) for i, (_, c, _) in enumerate(rows)],
        "o_orderkey long, o_custkey long",
    )
    li = spark.createDataFrame(
        [(i, p) for i, (_, _, p) in enumerate(rows)],
        "l_orderkey long, l_partkey long",
    )
    got = graph.itemitem_cf(orders, li).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.part_a, r.part_b, r.common, r.n_a, r.n_b) == (1, 2, 2, 2, 2)
    assert r.cosine == 1.0


def _brute_bigram_gt(texts, max_r=10):
    c = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for i in range(len(toks) - 1):
            c[toks[i] + " " + toks[i + 1]] += 1
    ff = Counter(c.values())
    n = sum(c.values())
    out = []
    for r in sorted(r_ for r_ in ff if r_ <= max_r):
        nxt = ff.get(r + 1, 0)
        out.append(
            (
                r,
                ff[r],
                nxt,
                round((r + 1) * nxt / ff[r], 6),
                round(r * ff[r] / n, 6),
            )
        )
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_good_turing_matches_brute_force(spark, texts):
    if not any(len(t.split()) >= 2 for t in texts):
        return  # no bigrams anywhere -> empty table on both sides
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r.r, r.n_r, r.n_r_next, r.r_star, r.mass_share)
        for r in corpus.good_turing(docs).collect()
    ]
    assert got == _brute_bigram_gt(texts)


def test_good_turing_p0_is_singleton_share(spark):
    """mass_share at r=1 must equal N_1 / N — the unseen-mass
    estimate."""
    texts = ["a b c d", "a b a b", "x y"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r.r: r for r in corpus.good_turing(docs).collect()}
    # bigrams: "a b"x3, "b c", "c d", "b a", "x y" -> N=7, N_1=4
    assert rows[1].n_r == 4
    assert rows[1].mass_share == round(4 / 7, 6)


def _brute_lexdiv(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                c[w] += 1
    n = sum(c.values())
    v = len(c)
    s2 = sum(x * x for x in c.values())
    return (
        n,
        v,
        round(v / n, 6),
        round(v / math.sqrt(n), 6),
        round((s2 - n) / (n * (n - 1.0)), 6),
        round(10000.0 * (s2 - n) / (n * n), 6),
    )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=1,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_lexical_diversity_matches_brute_force(spark, texts):
    if sum(len(t.split()) for t in texts) < 2:
        return  # simpson needs N >= 2
    docs = spark.createDataFrame(
        [(i, t, "s1") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    r = corpus.lexical_diversity(docs).collect()[0]
    got = (
        r.n_tokens,
        r.n_types,
        r.ttr,
        r.root_ttr,
        r.simpson_rr,
        r.yule_k,
    )
    assert got == _brute_lexdiv(texts)


def test_heaps_law_fit_matches_numpy_on_the_checkpoints(spark):
    """The fitted slope/intercept must equal an independent least-
    squares on the same ln-ln checkpoint set (4 dp), and beta must be
    interior for a growing vocabulary."""
    import numpy as np

    # 32 docs, each introducing some new vocabulary plus repeats
    texts = []
    for i in range(32):
        new = [f"w{i}_{j}" for j in range(3)]
        texts.append(" ".join(new + ["the", "of", "and"] * 2))
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    row = corpus.heaps_law(docs).collect()[0]
    # rebuild the checkpoint set brute-force
    seen, cum_tok, pts = set(), 0, []
    for i, t in enumerate(texts):
        ws = t.split()
        cum_tok += len(ws)
        seen.update(ws)
        rn = i + 1
        stride = (len(texts) + 15) // 16
        if rn % stride == 0 or rn == len(texts):
            pts.append((cum_tok, len(seen)))
    assert row.n_points == len(pts)
    x = np.log([p[0] for p in pts])
    y = np.log([p[1] for p in pts])
    beta, lnk = np.polyfit(x, y, 1)
    assert abs(row.beta - round(float(beta), 4)) <= 1e-4
    assert abs(row.ln_k - round(float(lnk), 4)) <= 1e-4
    assert 0.0 < row.beta <= 1.0
