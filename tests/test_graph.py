"""PageRank power iteration on the co-purchase graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.operators import graph


def _lineitem(spark, orders):
    # orders: list of (orderkey, [partkeys])
    rows = [(ok, pk) for ok, pks in orders for pk in pks]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_copurchase_edges_symmetric_and_distinct(spark):
    li = _lineitem(spark, [(1, [10, 20, 30]), (2, [10, 20])])  # dup pair 10-20
    edges = {(r.src, r.dst) for r in graph.copurchase_edges(li).collect()}
    assert edges == {
        (10, 20), (20, 10), (10, 30), (30, 10), (20, 30), (30, 20),
    }


def test_pagerank_one_iteration_hand_checked(spark):
    # triangle A(1)-B(2)-C(3) plus pendant D(4) on A
    li = _lineitem(spark, [(1, [1, 2, 3]), (2, [1, 4])])
    r = {row.node: row.r for row in graph.pagerank(li, iters=1).collect()}
    # n=4, r0=0.25; deg: A=3, B=C=2, D=1
    assert r[1] == pytest.approx(0.15 / 4 + 0.85 * (0.125 + 0.125 + 0.25), abs=1e-9)
    assert r[2] == pytest.approx(0.15 / 4 + 0.85 * (0.25 / 3 + 0.125), abs=1e-9)
    assert r[2] == r[3]
    assert r[4] == pytest.approx(0.15 / 4 + 0.85 * (0.25 / 3), abs=1e-9)


def test_pagerank_mass_is_conserved(spark):
    li = _lineitem(spark, [(1, [1, 2, 3]), (2, [1, 4]), (3, [2, 5]), (4, [5, 6])])
    out = graph.pagerank(li, iters=3)
    total = out.agg(F.sum("r").alias("t")).collect()[0].t
    # symmetric graph, no dangling nodes: total rank stays ~1
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(row.r > 0 for row in out.collect())


def test_triangle_counts_hand_checked(spark):
    # K3 {1,2,3} plus K3 {2,3,4} sharing edge 2-3: each triangle gives
    # every member one count; 2 and 3 sit in both
    li = _lineitem(spark, [(1, [1, 2, 3]), (2, [2, 3, 4])])
    out = {r.node: r.n_tri for r in graph.triangle_counts(li).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_counts_no_triangles(spark):
    # a path 1-2-3-4 has no triangles: nodes with zero triangles are
    # simply absent from the per-node output
    li = _lineitem(spark, [(1, [1, 2]), (2, [2, 3]), (3, [3, 4])])
    assert graph.triangle_counts(li).count() == 0


def test_triangle_counts_k4_complete(spark):
    # K4: C(4,3)=4 triangles, every node in exactly 3 of them
    li = _lineitem(spark, [(1, [1, 2, 3, 4])])
    out = {r.node: r.n_tri for r in graph.triangle_counts(li).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # total count = 3 * number of triangles
    assert sum(out.values()) == 3 * 4


def test_triangle_counts_shuffle_fallback_matches_broadcast(spark):
    # forcing the non-broadcast paths (gates at 0) must not change
    # the result
    li = _lineitem(spark, [(1, [1, 2, 3]), (2, [2, 3, 4]), (3, [1, 4, 5])])
    bcast = {(r.node, r.n_tri) for r in graph.triangle_counts(li).collect()}
    shuf = {
        (r.node, r.n_tri)
        for r in graph.triangle_counts(
            li, broadcast_nodes=0, broadcast_edges=0
        ).collect()
    }
    assert bcast == shuf


def test_link_prediction_on_a_known_wedge(spark):
    # orders: (1,2,3) together and (3,4) together -> wedge 1-3-4 and
    # 2-3-4: pairs (1,4),(2,4) are predicted; (1,2) already connected
    from banking_data_etl_pipeline_spark.operators import graph
    from pyspark.sql import functions as F

    rows = [(100, p) for p in (1, 2, 3)] + [(200, p) for p in (3, 4)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    # targets_mod=1: every node is a prediction target on this fixture
    out = {(r.a, r.b): r
           for r in graph.link_prediction(li, targets_mod=1).collect()}
    # anchored form reports both directions
    assert set(out) == {(1, 4), (2, 4), (4, 1), (4, 2)}
    # deg: 1->2, 2->2, 3->3, 4->1; common(1,4)=1 (via 3)
    r = out[(1, 4)]
    assert r.common == 1 and abs(r.jaccard - 1 / (2 + 1 - 1)) < 1e-9
