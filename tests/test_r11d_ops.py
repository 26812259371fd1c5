"""Round-11d operators: Theil–Sen slope, Brier decomposition,
Krippendorff's alpha — brute-force references + textbook identities."""

from __future__ import annotations

import datetime as dt
from collections import Counter

from hypothesis import given, settings, strategies as st

from banking_data_etl_pipeline_spark.operators import (
    corpus,
    profiling,
    timeseries,
)

EPOCH = dt.datetime(2024, 1, 1)


def _events_from_daily(spark, series):
    rows = []
    for day, c in enumerate(series):
        for j in range(c):
            rows.append(("x", EPOCH + dt.timedelta(days=day, seconds=j)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def _brute_sen(series):
    n = len(series)
    slopes = sorted(
        (
            (series[j] - series[i]) / (j - i),
            i,
            j,
        )
        for i in range(n)
        for j in range(i + 1, n)
    )
    m = len(slopes)
    lo = slopes[(m + 1) // 2 - 1][0]
    hi = slopes[m // 2][0]
    return m, round((lo + hi) / 2.0, 6)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=9), min_size=3, max_size=10)
)
def test_theil_sen_matches_brute_force(spark, series):
    row = timeseries.theil_sen(_events_from_daily(spark, series)).collect()[0]
    n_pairs, sen = _brute_sen(series)
    assert row.n_days == len(series)
    assert row.n_pairs == n_pairs
    assert abs(row.sen_slope - sen) < 1e-9


def test_theil_sen_recovers_a_linear_trend_despite_an_outlier(spark):
    series = [10, 12, 14, 16, 99, 20, 22, 24]  # slope 2, one spike
    row = timeseries.theil_sen(_events_from_daily(spark, series)).collect()[0]
    assert row.sen_slope == 2.0


def _brute_brier(pairs, n_bins=10):
    n = len(pairs)
    o = sum(l for _, l in pairs)
    bins = {}
    for f, l in pairs:
        b = min(max(int(f * n_bins), 0), n_bins - 1)
        bins.setdefault(b, []).append((f, l))
    obar = o / n
    rel = (
        sum(
            len(g)
            * (sum(f for f, _ in g) / len(g) - sum(l for _, l in g) / len(g))
            ** 2
            for g in bins.values()
        )
        / n
    )
    res = (
        sum(
            len(g) * (sum(l for _, l in g) / len(g) - obar) ** 2
            for g in bins.values()
        )
        / n
    )
    unc = obar * (1 - obar)
    raw = sum((f - l) ** 2 for f, l in pairs) / n
    return raw, rel, res, unc


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),  # score in cents
            st.booleans(),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_brier_decomposition_matches_brute_force(spark, raw_pairs):
    pairs = [(s / 100.0, int(l)) for s, l in raw_pairs]
    df = spark.createDataFrame(pairs, "score double, label int")
    row = profiling.brier_decomposition(df, "score", "label").collect()[0]
    raw, rel, res, unc = _brute_brier(pairs)
    # 1.5e-6 tolerance: Spark rounds doubles HALF_UP on the shortest
    # decimal repr, Python half-even on the binary value — cent-grid
    # scores land squared errors on exact 6-dp halves, so the two can
    # legitimately disagree by one ulp-of-6dp (the DuckDB twin, not
    # this brute force, is the exactness gate)
    assert row.n == len(pairs)
    assert abs(row.brier_raw - round(raw, 6)) < 1.5e-6
    assert abs(row.reliability - round(rel, 6)) < 1.5e-6
    assert abs(row.resolution - round(res, 6)) < 1.5e-6
    assert abs(row.uncertainty - round(unc, 6)) < 1.5e-6
    # Murphy identity on the binned forecasts (raw-vs-binned has
    # EITHER sign: within-bin variance minus covariance — hypothesis
    # disproved the naive raw >= binned claim with a 2-point bin)
    assert abs(row.brier_binned - round(rel - res + unc, 6)) < 3e-6


def test_brier_perfect_and_antiperfect_scores(spark):
    perfect = [(1.0, 1), (0.0, 0)] * 5
    row = profiling.brier_decomposition(
        spark.createDataFrame(perfect, "score double, label int"),
        "score",
        "label",
    ).collect()[0]
    assert row.brier_raw == 0.0
    assert row.resolution == row.uncertainty == 0.25
    assert row.reliability == 0.0


def _brute_alpha(ratings):
    """ratings: list of (unit, value). Nominal Krippendorff."""
    by_u = {}
    for u, v in ratings:
        by_u.setdefault(u, []).append(v)
    kept = {u: vs for u, vs in by_u.items() if len(vs) >= 2}
    if not kept:
        return None
    n = sum(len(vs) for vs in kept.values())
    obs = 0.0
    for vs in kept.values():
        m = len(vs)
        sq = sum(c * c for c in Counter(vs).values())
        obs += (m * m - sq) / (m - 1)
    marg = Counter(v for vs in kept.values() for v in vs)
    sq_c = sum(c * c for c in marg.values())
    if sq_c >= n * n:
        return None  # all one value: expected disagreement zero
    d_o = obs / n
    d_e = (n * n - sq_c) / (n * (n - 1))
    return round(1 - d_o / d_e, 6)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # unit
            st.integers(min_value=0, max_value=2),  # value
        ),
        min_size=2,
        max_size=25,
    )
)
def test_krippendorff_matches_brute_force(spark, pairs):
    # raters synthesized by arrival order within each unit — alpha
    # only depends on (unit, value) multiset, so this exercises
    # uneven m_u / MISSING raters directly
    seen = Counter()
    rows = []
    for u, v in pairs:
        rows.append((u, f"r{seen[u]}", v))
        seen[u] += 1
    ratings = spark.createDataFrame(rows, "unit long, rater string, value int")
    got = corpus.krippendorff_alpha(ratings).collect()
    want = _brute_alpha([(u, v) for u, v in pairs])
    kept_units = sum(1 for u, c in seen.items() if c >= 2)
    if kept_units == 0:
        assert got[0].n_units == 0 or got == []
        return
    if want is None:
        assert got[0].alpha is None
    else:
        assert abs(got[0].alpha - want) < 1e-9
        assert got[0].n_units == kept_units


def test_krippendorff_textbook_values(spark):
    """Perfect agreement -> alpha 1; the two-rater binary example with
    one disagreement in four units, hand-computed."""
    perfect = [(u, r, u % 2) for u in range(4) for r in ("a", "b")]
    df = spark.createDataFrame(perfect, "unit long, rater string, value int")
    assert corpus.krippendorff_alpha(df).collect()[0].alpha == 1.0
    # units: (0,0) (0,0) (1,1) (1,0) -> one split unit
    rows = [
        (0, "a", 0), (0, "b", 0),
        (1, "a", 0), (1, "b", 0),
        (2, "a", 1), (2, "b", 1),
        (3, "a", 1), (3, "b", 0),
    ]
    df2 = spark.createDataFrame(rows, "unit long, rater string, value int")
    got = corpus.krippendorff_alpha(df2).collect()[0]
    assert got.alpha == _brute_alpha([(u, v) for u, _r, v in rows])
