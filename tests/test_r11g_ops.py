"""Round-11g operators: U-shaped multi-touch attribution and the
Pareto 80/20 cut."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from banking_data_etl_pipeline_spark.operators import profiling, relational

EPOCH = dt.datetime(2024, 1, 1)


def _attr_events(spark, journeys):
    """journeys: {user: (touch_types_before_conv, extra_after)} —
    touches at hours 0..k-1, purchase at hour 100, extras after."""
    rows, eid = [], 0
    for user, (touch_types, extras_after) in journeys.items():
        for h, tt in enumerate(touch_types):
            rows.append((eid, user, tt, EPOCH + dt.timedelta(hours=h)))
            eid += 1
        rows.append(
            (eid, user, "purchase", EPOCH + dt.timedelta(hours=100))
        )
        eid += 1
        for h, tt in enumerate(extras_after):
            rows.append(
                (eid, user, tt, EPOCH + dt.timedelta(hours=101 + h))
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def _brute_position(journeys):
    credit = {"view": 0.0, "click": 0.0}
    n = {"view": 0, "click": 0}
    for touch_types, _ in journeys.values():
        k = len(touch_types)
        for i, tt in enumerate(touch_types):
            n[tt] += 1
            if k == 1:
                c = 1.0
            elif k == 2:
                c = 0.5
            elif i == 0 or i == k - 1:
                c = 0.4
            else:
                c = 0.2 / (k - 2)
            credit[tt] += c
    return {
        t: (n[t], round(credit[t], 6)) for t in credit if n[t] > 0
    }


@settings(max_examples=5, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=6),
        st.tuples(
            st.lists(
                st.sampled_from(["view", "click"]),
                min_size=1,
                max_size=8,
            ),
            st.lists(
                st.sampled_from(["view", "click"]),
                min_size=0,
                max_size=2,
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_position_attribution_matches_brute_force(spark, journeys):
    ev = _attr_events(spark, journeys)
    got = {
        r.event_type: (r.n_touches, r.total_credit)
        for r in relational.position_attribution(ev).collect()
    }
    want = _brute_position(journeys)
    assert got.keys() == want.keys()
    for t in want:
        assert got[t][0] == want[t][0]
        assert abs(got[t][1] - want[t][1]) < 1.5e-6


def test_position_attribution_credit_conserves_per_user(spark):
    """Total credit across types must equal the number of converting
    users WITH at least one prior touch (each journey hands out
    exactly 1.0), and post-conversion touches get nothing."""
    journeys = {
        0: (["view"], []),
        1: (["view", "click"], ["view"]),
        2: (["click", "view", "view", "click"], []),
        3: (["view"] * 7, ["click", "click"]),
    }
    ev = _attr_events(spark, journeys)
    rows = relational.position_attribution(ev).collect()
    total = sum(r.total_credit for r in rows)
    assert abs(total - len(journeys)) < 1e-5


def test_pareto_cut_concentrated_vs_uniform(spark):
    # segment A: one whale carries >80%; segment B: 10 equal spenders
    rows = [(0, 0, 10_000.0)] + [(i, i, 10.0) for i in range(1, 10)]
    rows += [(100 + i, 100 + i, 50.0) for i in range(10)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    cust = spark.createDataFrame(
        [(i, "A") for i in range(10)]
        + [(100 + i, "B") for i in range(10)],
        "c_custkey long, c_mktsegment string",
    )
    got = {
        r.c_mktsegment: r for r in profiling.pareto_cut(orders, cust).collect()
    }
    assert got["A"].n_top80 == 1 and got["A"].cust_share == 0.1
    assert got["B"].n_top80 == 8 and got["B"].cust_share == 0.8
    for r in got.values():
        assert r.spend_share >= 0.8


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=1000), min_size=2, max_size=15
    )
)
def test_pareto_cut_matches_brute_force(spark, spends):
    orders = spark.createDataFrame(
        [(i, i, float(x)) for i, x in enumerate(spends)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(i, "S") for i in range(len(spends))],
        "c_custkey long, c_mktsegment string",
    )
    r = profiling.pareto_cut(orders, cust).collect()[0]
    xs = sorted(
        ((x, i) for i, x in enumerate(spends)),
        key=lambda t: (-t[0], t[1]),
    )
    total = sum(spends)
    cum, n80 = 0, None
    for j, (x, _i) in enumerate(xs, start=1):
        cum += x
        if cum * 5 >= total * 4:
            n80 = j
            break
    assert r.n_top80 == n80
    assert r.cust_share == round(n80 / len(spends), 6)
