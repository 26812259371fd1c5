"""Round-11c operators: gap-honest autocorrelation, seasonality
strength, Hill tail index, Church–Gale burstiness, blocked all-pairs
TF-IDF cosine — each vs a brute-force Python reference."""

from __future__ import annotations

import pytest

import datetime as dt
import math
from collections import Counter, defaultdict

from hypothesis import given, settings, strategies as st

from banking_data_etl_pipeline_spark.operators import (
    corpus,
    dedup,
    profiling,
    timeseries,
)

EPOCH = dt.datetime(2024, 1, 1)


def _hourly_events(spark, series, etype="x"):
    """series: list of (hour_index_or_gap, value). None -> missing
    hour (gap). One event per present hour, carrying the hour total."""
    rows = [
        (etype, EPOCH + dt.timedelta(hours=h), float(v))
        for h, v in enumerate(series)
        if v is not None
    ]
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def _brute_pearson(pairs):
    n = len(pairs)
    if n == 0:
        return None, 0
    sa = sum(a for a, _ in pairs)
    sb = sum(b for _, b in pairs)
    sab = sum(a * b for a, b in pairs)
    saa = sum(a * a for a, _ in pairs)
    sbb = sum(b * b for _, b in pairs)
    num = n * sab - sa * sb
    da = n * saa - sa * sa
    db = n * sbb - sb * sb
    if da <= 0 or db <= 0:
        return None, n
    return num / math.sqrt(da * db), n


def _brute_acf(series, lag):
    # integer micro-units, like the operator
    vals = {
        h: round(v * 1_000_000)
        for h, v in enumerate(series)
        if v is not None
    }
    pairs = [
        (vals[h], vals[h - lag]) for h in vals if h - lag in vals
    ]
    return _brute_pearson(pairs)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
        min_size=4,
        max_size=40,
    )
)
def test_acf_lag1_matches_brute_force_with_gaps(spark, series):
    if sum(v is not None for v in series) < 3:
        return
    ev = _hourly_events(spark, series)
    rows = {
        r.lag: r
        for r in timeseries.acf_lags(ev, lags=(1,)).collect()
    }
    want, n = _brute_acf(series, 1)
    if n == 0:
        assert 1 not in rows  # inner join -> no pairs, no row
        return
    r = rows[1]
    assert r.n_pairs == n
    if want is None:
        assert r.acf is None
    else:
        assert abs(r.acf - round(want, 6)) < 1e-9


def test_acf_lag24_sees_a_perfect_daily_cycle(spark):
    series = ([1.0, 5.0, 2.0, 8.0] * 6) * 3  # period 24, 3 days
    ev = _hourly_events(spark, series)
    rows = {r.lag: r for r in timeseries.acf_lags(ev).collect()}
    assert rows[24].acf == 1.0
    assert rows[24].n_pairs == len(series) - 24


def _brute_seasonality(series):
    vals = {
        h: round(v * 1_000_000)
        for h, v in enumerate(series)
        if v is not None
    }
    if not vals:
        return None, 0
    by_hod = defaultdict(list)
    for h, v in vals.items():
        by_hod[h % 24].append(v)
    n = len(vals)
    s = sum(vals.values())
    syy = sum(v * v for v in vals.values())
    seas = sum(
        float(sum(g)) * float(sum(g)) / len(g) for g in by_hod.values()
    )
    ss_total = n * float(syy) - float(s) * float(s)
    if ss_total <= 0:
        return None, n
    # the operator routes each per-hod term through DECIMAL(38,6) —
    # negligible vs this brute force at these magnitudes
    return (n * seas - float(s) * float(s)) / ss_total, n


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
        min_size=6,
        max_size=60,
    )
)
def test_seasonality_matches_brute_force(spark, series):
    if sum(v is not None for v in series) < 2:
        return
    ev = _hourly_events(spark, series)
    row = timeseries.seasonality_strength(ev).collect()[0]
    want, n = _brute_seasonality(series)
    assert row.n_hours == n
    if want is None:
        assert row.strength is None
    else:
        assert abs(row.strength - round(want, 6)) < 1e-6


def test_seasonality_pure_cycle_is_one_constant_is_null(spark):
    cycle = [float(1 + (h % 24)) for h in range(72)]
    row = timeseries.seasonality_strength(
        _hourly_events(spark, cycle)
    ).collect()[0]
    assert row.strength == 1.0
    row2 = timeseries.seasonality_strength(
        _hourly_events(spark, [5.0] * 30)
    ).collect()[0]
    assert row2.strength is None


def test_hill_tail_matches_brute_force(spark):
    # 60 deterministic Pareto-ish spends, one segment
    spends = [round(1000.0 / ((i + 1) ** 0.5), 2) for i in range(60)]
    orders = spark.createDataFrame(
        [(i, i, s) for i, s in enumerate(spends)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(i, "SEG") for i in range(60)],
        "c_custkey long, c_mktsegment string",
    )
    row = profiling.hill_tail(orders, cust, k=50).collect()[0]
    xs = sorted(spends, reverse=True)
    xk1 = xs[50]
    want = 50.0 / sum(math.log(x / xk1) for x in xs[:50])
    assert row.n_customers == 60
    assert row.x_kplus1 == round(xk1, 2)
    assert abs(row.hill_alpha - round(want, 6)) < 1e-6
    # x ~ i^(-1/2) is Pareto with alpha 2
    assert 1.5 < row.hill_alpha < 2.6


def test_hill_tail_small_segment_is_dropped(spark):
    orders = spark.createDataFrame(
        [(i, i, 10.0 + i) for i in range(20)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(i, "SMALL") for i in range(20)],
        "c_custkey long, c_mktsegment string",
    )
    assert profiling.hill_tail(orders, cust, k=50).count() == 0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=8
        ).map(" ".join),
        min_size=5,
        max_size=10,
    )
)
def test_df_burstiness_matches_brute_force(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r.token, r.cf, r.df, r.burstiness)
        for r in corpus.df_burstiness(docs, min_df=2, top=10).collect()
    ]
    cf, dfq = Counter(), Counter()
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        for w in ws:
            cf[w] += 1
        for w in set(ws):
            dfq[w] += 1
    want = [
        (w, cf[w], dfq[w], round(cf[w] / dfq[w], 6))
        for w in cf
        if dfq[w] >= 2
    ]
    want.sort(key=lambda t: (-t[3], t[0]))
    assert got == want[:10]


def _brute_tfidf_allpairs(texts, df_cap=20, top=50):
    tf = defaultdict(Counter)
    for d, t in enumerate(texts):
        ws = [w for w in t.lower().split() if w]
        for i in range(len(ws) - 1):
            tf[d][ws[i] + " " + ws[i + 1]] += 1
    dfq = Counter()
    for d in tf:
        for term in tf[d]:
            dfq[term] += 1
    n = len(texts)
    w = {
        (d, term): c * math.log(n / dfq[term])
        for d in tf
        for term, c in tf[d].items()
    }
    norm = {
        d: math.sqrt(sum(w[(d, t)] ** 2 for t in tf[d])) for d in tf
    }
    cand = set()
    by_term = defaultdict(list)
    for d in tf:
        for term in tf[d]:
            if dfq[term] <= df_cap:
                by_term[term].append(d)
    for term, ds in by_term.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    out = []
    for a, b in cand:
        shared = set(tf[a]) & set(tf[b])
        if not shared:
            continue
        dot = sum(w[(a, t)] * w[(b, t)] for t in shared)
        cos = (
            round(dot / (norm[a] * norm[b]), 6)
            if norm[a] * norm[b] > 0
            else None  # zero-norm pair: cosine undefined -> NULL
        )
        out.append((cos, len(shared), a, b))
    out.sort(
        key=lambda t: (
            t[0] is None,  # NULLS LAST
            -(t[0] or 0.0),
            -t[1],
            t[2],
            t[3],
        )
    )
    return [(a, b, c, cos) for cos, c, a, b in out[:top]]


def test_tfidf_allpairs_finds_the_duplicated_doc_first(spark):
    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta epsilon",  # exact dup of 0
        "alpha beta zeta eta theta",
        "iota kappa lambda mu nu",
        "xi omicron pi rho sigma",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = dedup.tfidf_allpairs(docs).collect()
    top = rows[0]
    assert (top.doc_a, top.doc_b) == (0, 1)
    assert top.cosine == 1.0
    got = [
        (r.doc_a, r.doc_b, r.common_terms, r.cosine) for r in rows
    ]
    assert got == _brute_tfidf_allpairs(texts)


def test_tfidf_allpairs_fan_flag_is_result_invariant(spark):
    """fan=False (the recall twin's audit-slice mode, r17: skips the
    fan_out exchange on a ~300-row limit slice) must be a pure plan
    change — identical rows in identical order."""
    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta zeta",
        "alpha beta zeta eta theta",
        "iota kappa lambda mu nu",
        "xi omicron pi rho sigma",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    fanned = [tuple(r) for r in dedup.tfidf_allpairs(docs, fan=True).collect()]
    flat = [tuple(r) for r in dedup.tfidf_allpairs(docs, fan=False).collect()]
    assert fanned == flat and fanned


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=2,
            max_size=8,
        ).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
@pytest.mark.slowtier
def test_tfidf_allpairs_matches_brute_force(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r.doc_a, r.doc_b, r.common_terms, r.cosine)
        for r in dedup.tfidf_allpairs(docs).collect()
    ]
    assert got == _brute_tfidf_allpairs(texts)
