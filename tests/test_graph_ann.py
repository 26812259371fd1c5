"""Graph-based ANN (NSW / HNSW-lite, similarity.nsw_topk +
build_graph_index/probe_graph_index). Value parity vs the unrolled
DuckDB twin is the oracle gate's job; these pin the SEMANTIC
invariants: beam-search reachability on a hand-built angular graph
(including what a bounded hop count must NOT reach), adjacency
degree/determinism, and telescoped == prebuilt."""

from __future__ import annotations

import pytest

import math
import os
import tempfile

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.operators import similarity
from banking_data_etl_pipeline_spark.sources import tables
from conftest import SF_DIR


def _angle_vec(deg: float) -> list[float]:
    return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]


def _line_corpus(spark):
    # six unit vectors on a 0..50 degree arc: cosine(v_i, v_j) =
    # cos(10*(i-j) degrees), so the R=2 neighbor graph is exactly the
    # angular chain i -> {i-1, i+1} (ends: the two nearest inward)
    rows = [(i, _angle_vec(10.0 * i)) for i in range(6)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _q48(spark):
    # one query at 48 degrees: true neighbor order is 5,4,3,2,1,0
    return spark.createDataFrame(
        [(100, _angle_vec(48.0))], "query_id long, qvec array<double>"
    )


@pytest.mark.slowtier
def test_beam_search_walks_the_angular_chain(spark):
    emb = _line_corpus(spark)
    # n_centroids=1 -> one cell -> the global top-2 graph; entry point
    # is vec 0 (lowest id). hops=3 from node 0 can reach at most node
    # 4 along the chain (0 -> {1,2} -> 3 -> 4), NOT node 5.
    out = similarity.nsw_topk(
        emb,
        _q48(spark),
        k=6,
        n_centroids=1,
        nprobe=1,
        r_neighbors=2,
        beam=4,
        ef=32,
        hops=3,
        train_iterations=0,
    ).collect()
    got = [(r.rank, r.vec_id) for r in sorted(out, key=lambda r: r.rank)]
    # candidates after 3 hops = {0,1,2,3,4}, ranked by cosine to 48deg
    assert got == [(1, 4), (2, 3), (3, 2), (4, 1), (5, 0)]
    # cosines match the exact angular values at 6dp
    by_id = {r.vec_id: r.cosine for r in out}
    for i in (0, 1, 2, 3, 4):
        assert abs(by_id[i] - math.cos(math.radians(48.0 - 10.0 * i))) < 2e-6


@pytest.mark.slowtier
def test_one_more_hop_reaches_the_chain_end(spark):
    emb = _line_corpus(spark)
    out = similarity.nsw_topk(
        emb,
        _q48(spark),
        k=1,
        n_centroids=1,
        nprobe=1,
        r_neighbors=2,
        beam=4,
        ef=32,
        hops=4,
        train_iterations=0,
    ).collect()
    # hop 4 expands node 4 -> node 5 (cos 2deg, the true nearest)
    assert [(r.rank, r.vec_id) for r in out] == [(1, 5)]


def test_adjacency_degree_capped_and_deterministic(spark):
    emb = _line_corpus(spark)
    corpus = similarity.assign_cells(
        emb, 1, scorer=lambda v, nv: F.array(
            F.struct(F.lit(1.0).alias("s"), F.lit(0).alias("nc"))
        )
    )
    adj = similarity.graph_adjacency(corpus, r_neighbors=2)
    rows = {(r.src, r.dst) for r in adj.collect()}
    # every node has exactly 2 out-edges; chain interior links both
    # angular neighbors, the ends link the two nearest inward
    assert sorted(rows) == sorted(
        {(0, 1), (0, 2), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 4),
         (4, 3), (4, 5), (5, 4), (5, 3)}
    )
    # repartitioning must not change the graph (total tie-break order)
    adj2 = similarity.graph_adjacency(corpus.repartition(7), r_neighbors=2)
    assert {(r.src, r.dst) for r in adj2.collect()} == rows


@pytest.mark.slowtier
def test_ivfpq_prebuilt_probe_equals_telescoped(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=3)
    tele = similarity.ivf_pq_topk(emb, q, k=5, residual=True).collect()
    d = os.path.join(tempfile.mkdtemp(prefix="ivfpq_eq_"), "idx")
    similarity.build_ivfpq_index(emb, d, residual=True)
    pre = similarity.probe_ivfpq_index(spark, emb, d, q, k=5).collect()
    assert sorted(map(tuple, tele)) == sorted(map(tuple, pre))
    # the residual flag persists with the index: a probe of a raw
    # index must NOT apply residual LUTs (meta drives it)
    d2 = os.path.join(tempfile.mkdtemp(prefix="ivfpq_eq_"), "idx")
    similarity.build_ivfpq_index(emb, d2, residual=False)
    pre_raw = similarity.probe_ivfpq_index(spark, emb, d2, q, k=5).collect()
    tele_raw = similarity.ivf_pq_topk(emb, q, k=5, residual=False).collect()
    assert sorted(map(tuple, tele_raw)) == sorted(map(tuple, pre_raw))


@pytest.mark.slowtier
def test_prebuilt_probe_equals_telescoped(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=3)
    tele = similarity.nsw_topk(emb, q, k=5).collect()
    d = os.path.join(tempfile.mkdtemp(prefix="nsw_eq_"), "idx")
    similarity.build_graph_index(emb, d)
    pre = similarity.probe_graph_index(spark, d, q, k=5).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(map(tuple, tele), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, pre), key=lambda t: (t[0], t[3])
    )
    assert len(pre) == 15
