"""Round-12 property tests: the PPM parser against generated
containers, and the two-sample statistics against brute-force
recomputes on random small samples."""

from __future__ import annotations

import math

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from banking_data_etl_pipeline_spark.multimodal import binaryops
from banking_data_etl_pipeline_spark.operators import profiling, timeseries

# 10 examples, not 25: each example costs 2-3 s of Spark actions and
# the ks/mwu/cvm/tau brute-force recomputes drew ~140 s of the suite's
# budget; hypothesis draws FRESH random examples every run, so
# round-over-round coverage still accumulates (r17: the driver's test
# gate timed out at 73% of a ~25-minute suite — runtime is a contract)
SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    ws1=st.sampled_from([b" ", b"\n", b"\t", b"\r", b"  \n"]),
    ws2=st.sampled_from([b" ", b"\n", b"\t \n"]),
    comment=st.booleans(),
    seed=st.integers(0, 2**16),
)
@SET
def test_parse_ppm_roundtrips_arbitrary_legal_headers(
    w, h, ws1, ws2, comment, seed
):
    """Any legal P6 header layout (variable whitespace, optional
    comments) parses back to the exact dims and raster bytes."""
    raster = bytes((seed * 31 + i * 7) % 256 for i in range(w * h * 3))
    head = b"P6" + ws1 + str(w).encode()
    if comment:
        head += b" # cmt\n" + str(h).encode()
    else:
        head += ws2 + str(h).encode()
    head += b"\n255\n"
    parsed = binaryops.parse_ppm(head + raster)
    assert parsed == (w, h, 255, raster)


@given(
    w=st.integers(1, 6),
    h=st.integers(1, 6),
    cut=st.integers(1, 20),
)
@SET
def test_parse_ppm_truncation_always_degrades_to_none(w, h, cut):
    raster = bytes(range(w * h * 3 % 256)) * 0 + bytes(
        i % 256 for i in range(w * h * 3)
    )
    payload = b"P6\n%d %d\n255\n" % (w, h) + raster
    assert binaryops.parse_ppm(payload[: max(0, len(payload) - cut)]) is None


def _brute_ks(a, b):
    pooled = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    best = 0
    for v in pooled:
        fa = sum(1 for x in a if x <= v)
        fb = sum(1 for x in b if x <= v)
        best = max(best, abs(fa * nb - fb * na))
    return best


def _brute_u2(a, b):
    # 2*U_a with ties counting half (doubled -> exact integer)
    return sum(
        2 if x > y else (1 if x == y else 0) for x in a for y in b
    )


@given(
    a=st.lists(st.integers(0, 8), min_size=1, max_size=12),
    b=st.lists(st.integers(0, 8), min_size=1, max_size=12),
)
@pytest.mark.slowtier
@SET
def test_ks_and_mwu_match_bruteforce_on_random_samples(spark, a, b):
    rows = [("purchase", float(x)) for x in a] + [
        ("click", float(y)) for y in b
    ]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    ks = profiling.ks_two_sample(ev).collect()[0]
    assert (ks["n_a"], ks["n_b"]) == (len(a), len(b))
    assert ks["d_num"] == _brute_ks(a, b)
    mwu = profiling.mann_whitney(ev).collect()[0]
    assert mwu["u2x"] == _brute_u2(a, b)


def _brute_tau(xs, ys):
    n = len(xs)
    nc = nd = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[j] - xs[i], ys[j] - ys[i]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    den = math.sqrt((n0 - tx) * (n0 - ty))
    return nc, nd, tx, ty, (nc - nd) / den if den else None


@given(
    counts=st.lists(
        st.tuples(st.integers(1, 4), st.integers(1, 4)),
        min_size=2,
        max_size=6,
    )
)
@pytest.mark.slowtier
@SET
def test_kendall_tau_matches_bruteforce(spark, counts):
    rows = []
    for d, (x, y) in enumerate(counts):
        rows += [(f"2024-01-{d + 1:02d} 12:00:00", "purchase")] * x
        rows += [(f"2024-01-{d + 1:02d} 12:00:00", "click")] * y
    ev = spark.createDataFrame(
        rows, "ts_s string, event_type string"
    ).selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
    got = timeseries.kendall_tau(ev).collect()[0]
    nc, nd, tx, ty, tau = _brute_tau(
        [x for x, _ in counts], [y for _, y in counts]
    )
    assert (got["concordant"], got["discordant"]) == (nc, nd)
    assert (got["ties_x"], got["ties_y"]) == (tx, ty)
    if tau is not None:
        assert got["tau_b"] == __import__("pytest").approx(tau)


def _brute_cvm(a, b):
    pooled = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    t_num = 0
    for v in pooled:
        w = sum(1 for x in a if x == v) + sum(1 for y in b if y == v)
        fa = sum(1 for x in a if x <= v)
        fb = sum(1 for y in b if y <= v)
        t_num += w * (fa * nb - fb * na) ** 2
    return t_num


@given(
    a=st.lists(st.integers(0, 6), min_size=1, max_size=10),
    b=st.lists(st.integers(0, 6), min_size=1, max_size=10),
)
@pytest.mark.slowtier
@SET
def test_cvm_matches_bruteforce(spark, a, b):
    rows = [("purchase", float(x)) for x in a] + [
        ("click", float(y)) for y in b
    ]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    got = profiling.cvm_two_sample(ev).collect()[0]
    assert got["t_num"] == float(_brute_cvm(a, b))
