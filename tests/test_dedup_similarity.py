"""Dedup + similarity operators: semantic sanity on constructed
fixtures and an exact numpy cross-check for brute-force ANN."""

from __future__ import annotations

import pytest

import numpy as np

from banking_data_etl_pipeline_spark.operators import dedup, similarity
from banking_data_etl_pipeline_spark.sources import tables

from conftest import SF_DIR


def test_exact_dedup_groups(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "something else"),
         (5, "hello world")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.n_copies for r in dedup.exact_dedup(docs).collect()}
    assert rows == {1: 3, 3: 1}  # min id kept, copies counted


def test_ngram_jaccard_detects_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " today"
    other = "completely different words entirely unrelated to anything here"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = dedup.ngram_jaccard_pairs(docs).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert 0.5 <= pairs[0].jaccard <= 1.0


def test_connected_components_transitive_merge(spark):
    # chain 1-2, 2-3 and a separate pair 10-11: components must merge
    # transitively (the whole point vs per-pair dedup) and singletons
    # keep themselves
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 7, 10, 11)], "doc_id long"
    )
    out = {r.doc_id: (r.canonical_id, r.is_kept)
           for r in dedup.resolve_duplicates(docs, pairs).collect()}
    assert out == {1: (1, True), 2: (1, False), 3: (1, False),
                   7: (7, True), 10: (10, True), 11: (10, False)}


def test_minhash_lsh_finds_identical_docs(spark):
    text = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_pairs(docs).collect()
    assert [(p.id_a, p.id_b, p.est_jaccard) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_shape_and_identity(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb cc dd"), (3, "xx yy zz qq"), (4, " ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    assert set(rows) == {1, 2, 3}  # empty doc dropped
    assert all(len(v) == 32 and set(v) <= {"0", "1"} for v in rows.values())
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_ann_brute_matches_numpy(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    got = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    )

    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    expect = []
    for qi in ids[:5]:
        sims = Mn @ Mn[list(ids).index(qi)]
        order = sorted(
            ((round(s, 6), vid) for s, vid in zip(sims, ids) if vid != qi),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_s, vid) in enumerate(order[:10], start=1):
            expect.append((qi, rank, vid))
    assert got == sorted(expect)


def test_lsh_topk_subset_of_bucket(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    rows = similarity.lsh_topk(emb, q, k=10, n_bits=4).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.rank <= 10
        assert -1.0 <= r.cosine <= 1.0


def test_ivf_topk_candidates_come_from_probed_cells(spark):
    from pyspark.sql import functions as F

    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=3)
    got = similarity.ivf_topk(emb, q, k=5, n_centroids=8, nprobe=8).collect()
    # nprobe == n_centroids probes every cell -> identical to brute force
    brute = {
        (r.query_id, r.rank): r.vec_id
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
        if r.query_id in {0, 1, 2}
    }
    assert {(r.query_id, r.rank): r.vec_id for r in got} == brute
    # with few probes, results are a (possibly partial) subset ranked
    # consistently: scores non-increasing per query
    part = similarity.ivf_topk(emb, q, k=5, n_centroids=8, nprobe=2).collect()
    by_q: dict = {}
    for r in part:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert all(a.cosine >= b.cosine for a, b in zip(rows, rows[1:]))


def test_ann_recall_vs_brute_force(spark):
    # the approximate families are hash-exact vs their oracles by
    # construction, but nothing else would catch a silent recall
    # collapse when parameters change — pin recall@10 against the
    # brute-force ground truth on the test corpus
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)

    def topk_sets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    truth = topk_sets(similarity.brute_force_topk(emb, q, k=10))

    def recall(df) -> float:
        got = topk_sets(df)
        hits = sum(len(got.get(qid, set()) & t) for qid, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    # IVF probes nprobe=2 of 16 cells: high recall expected — both with
    # the default trained centroids and the lowest-id fallback
    assert recall(similarity.ivf_topk(emb, q, k=10, n_centroids=16, nprobe=2)) >= 0.5
    assert (
        recall(
            similarity.ivf_topk(
                emb, q, k=10, n_centroids=16, nprobe=2, train_iterations=0
            )
        )
        >= 0.5
    )
    # sign-bit LSH with 4 bits on near-random vectors: weaker, but a
    # parameter regression (e.g. too many bits) craters this fast
    assert recall(similarity.lsh_topk(emb, q, k=10, n_bits=4)) >= 0.3


@pytest.mark.slowtier
def test_ivf_trained_centroids_fix_hot_cell_skew(spark):
    """The reason ivf_topk k-means-trains its centroids: when the
    lowest-id vectors happen to sit in one region (nothing guarantees
    id order tracks the data distribution), every far-away vector
    falls into whichever of the near-identical centroids wins the tie
    — one hot cell holds most of the corpus and probing it IS brute
    force. Two Lloyd iterations migrate the centroids onto the real
    clusters and the hot cell disappears."""
    import math

    from pyspark.sql import functions as F

    from banking_data_etl_pipeline_spark.operators import clustering

    dim = 8
    rows = []
    # ids 0..15: the would-be centroids, all bunched near e_0
    for i in range(16):
        v = [1.0] + [0.001 * i] * (dim - 1)
        rows.append((i, [float(x) for x in v]))
    # ids 16..415: 8 well-separated clusters far from e_0
    for j in range(400):
        c = j % 8
        base = [0.0] * dim
        base[c] = -5.0 - c
        base[(c + 1) % dim] = 3.0 + 0.01 * j
        rows.append((16 + j, [float(x) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def max_cell(train_iterations: int) -> int:
        cents = (
            clustering.train_centroids(emb, 16, train_iterations)
            if train_iterations
            else None
        )
        scorer = similarity._centroid_scorer(
            emb, 16, "embedding", "vec_id", cents
        )
        cells = similarity.assign_cells(emb, 16, scorer=scorer)
        return max(
            r.n
            for r in cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    hot = max_cell(0)
    improving = max_cell(2)
    balanced = max_cell(4)
    # untrained: most of the corpus piles into one cosine-argmax cell;
    # training shrinks the hot cell monotonically with iterations (the
    # bunched init means Lloyd frees only ~one centroid per pass on
    # this geometry — real corpora with a spread init converge faster)
    assert hot >= 300, hot
    assert improving < hot, (hot, improving)
    assert balanced <= hot / 2, (hot, balanced)


def test_kmeans_deterministic_and_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from banking_data_etl_pipeline_spark.operators import clustering

    emb = tables.load(spark, SF_DIR, "embeddings")
    got = {r.cluster: (r.n_members, r.centroid) for r in clustering.kmeans(emb, k=4, iterations=2).collect()}
    # partitioning-invariance: DECIMAL-exact updates make the result a
    # pure function of the data
    re = {r.cluster: (r.n_members, r.centroid)
          for r in clustering.kmeans(emb.repartition(7), k=4, iterations=2).collect()}
    assert got == re
    assert sum(n for n, _ in got.values()) == emb.count()

    # numpy reference (same init, same argmin/tiebreak rules)
    rows = sorted(emb.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    X = np.array([[float(x) for x in r[1]] for r in rows])
    C = X[:4].copy()
    for _ in range(2):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(4):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    sizes = {c: int((a == c).sum()) for c in range(4) if (a == c).any()}
    assert {c: n for c, (n, _) in got.items()} == sizes
    for c, (_, cent) in got.items():
        assert np.allclose(np.array(cent), C[c], atol=1e-4)


def test_kmeans_wide_dim_bounded(spark):
    """dim=512 training must stay cheap: the posting-list centroid
    update keeps the aggregate plan constant-size in dim (the earlier
    one-decimal-sum-column-per-dimension shape blew up the expression
    tree/codegen at high dims). Checked against the same numpy walk as
    the dim-64 test, plus partitioning invariance."""
    import numpy as np

    from banking_data_etl_pipeline_spark.operators import clustering

    dim, k, n = 512, 4, 240
    rows = [
        (
            i,
            [float(((i * 31 + j * 17) % 101) / 50.0 - 1.0) for j in range(dim)],
        )
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = clustering.train_centroids(emb, k=k, iterations=1)
    re = clustering.train_centroids(emb.repartition(7), k=k, iterations=1)
    assert cents == re

    X = np.array([v for _, v in rows])
    C = X[:k].copy()
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    for c in range(k):
        if (a == c).any():
            C[c] = X[a == c].mean(axis=0)
    for cid, vec in cents:
        assert np.allclose(np.array(vec), C[cid], atol=1e-9), cid


def test_train_centroids_rejects_null_and_ragged(spark):
    """The Lloyd update posting-list aggregate would silently drop
    NULL vectors and truncate over-length ones — both must raise
    loudly up front instead (r7 ADVICE)."""
    import pytest

    from banking_data_etl_pipeline_spark.operators import clustering

    base = [(i, [float(i + j) for j in range(4)]) for i in range(6)]
    for bad_row in [(9, None), (9, [1.0] * 5), (9, [1.0] * 3)]:
        emb = spark.createDataFrame(
            base + [bad_row], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="NULL or ragged"):
            clustering.train_centroids(emb, k=2, iterations=1)
    # clean input still trains
    emb = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    assert len(clustering.train_centroids(emb, k=2, iterations=1)) == 2


@pytest.mark.slowtier
def test_pq_topk_recall_and_determinism(spark):
    """PQ/ADC approximate top-10: deterministic under repartitioning
    (trained codebooks + fixed fold order) and recall vs exact L2
    above the floor measured for 16-bit codes on these near-random
    synthetic embeddings (0.36 measured; random data is PQ's worst
    case — no cluster structure for the codebooks to exploit)."""
    import numpy as np

    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    got = [
        (r.query_id, r.vec_id, r.approx_dist, r.rank)
        for r in similarity.pq_topk(emb, q, k=10).collect()
    ]
    re = [
        (r.query_id, r.vec_id, r.approx_dist, r.rank)
        for r in similarity.pq_topk(emb.repartition(7), q, k=10).collect()
    ]
    assert sorted(got) == sorted(re)
    assert len(got) == 50

    rows = sorted(emb.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    X = np.array([[float(x) for x in r[1]] for r in rows])
    ids = [r[0] for r in rows]
    hits = 0
    for qi in range(5):
        qid = ids[qi]
        d = ((X - X[qi]) ** 2).sum(axis=1)
        true10 = [
            ids[i]
            for i in sorted(range(len(ids)), key=lambda i: (d[i], ids[i]))
            if ids[i] != qid
        ][:10]
        mine = {v for (g, v, _s, _r) in got if g == qid}
        hits += len(mine & set(true10))
    assert hits / 50 >= 0.2, hits / 50


@pytest.mark.slowtier
def test_ivf_pq_topk_recall_and_determinism(spark):
    """Composed IVF+PQ+re-rank: deterministic under repartitioning,
    and recall@10 vs brute-force cosine above the measured floor
    (0.72 measured; plain IVF at the same nprobe measures 0.82 — the
    ~0.1 gap is the 16-bit ADC shortlist's cost on near-random data,
    mostly absorbed by the exact re-rank)."""
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    got = [
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_pq_topk(emb, q, k=10).collect()
    ]
    re = [
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_pq_topk(emb.repartition(7), q, k=10).collect()
    ]
    assert sorted(got) == sorted(re)
    assert len(got) == 50
    truth = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }
    recall = len({(g, v) for (g, v, _s, _r) in got} & truth) / 50
    assert recall >= 0.5, recall


def test_connected_components_matches_union_find(spark):
    """Min-label propagation (with its measured-edge-count partition
    sizing) must equal a driver-side union-find, including singleton
    handling via resolve_duplicates. The graph is CLUSTERED (random
    near-cliques) — the operator's target shape, per its docstring:
    near-dup components have diameter ~2-3, so the loop converges in a
    few rounds (a long sparse path would instead need diameter
    iterations — that regime belongs to a different algorithm)."""
    import random

    from banking_data_etl_pipeline_spark.operators import dedup

    rng = random.Random(42)
    n = 120
    edge_set = set()
    nodes = list(range(n))
    rng.shuffle(nodes)
    i = 0
    while i < n:
        k = rng.randrange(1, 9)  # cluster sizes 1..8 (1 = singleton)
        cluster = nodes[i : i + k]
        i += k
        # a random spanning star + extra chords: connected, diameter <= 3
        for v in cluster[1:]:
            edge_set.add((min(cluster[0], v), max(cluster[0], v)))
        for _ in range(len(cluster)):
            a, b = rng.choice(cluster), rng.choice(cluster)
            if a != b:
                edge_set.add((min(a, b), max(a, b)))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_set:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in range(n)}

    pairs = spark.createDataFrame(sorted(edge_set), "id_a long, id_b long")
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {
        r.doc_id: r.canonical_id
        for r in dedup.resolve_duplicates(docs, pairs).collect()
    }
    assert got == want


def test_run_stats_fold_matches_counter(spark):
    """The sort+fold multiplicity/distinct stats must equal
    collections.Counter on seeded random arrays (incl. empty)."""
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from banking_data_etl_pipeline_spark.functions import texttools

    rng = random.Random(7)
    arrays = [
        [rng.choice("abcdef") for _ in range(rng.randrange(0, 40))]
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i long, arr array<string>"
    ).select("i", texttools._run_stats(F.col("arr")).alias("s"))
    got = {r.i: (r.s.best, r.s.nd) for r in df.collect()}
    for i, a in enumerate(arrays):
        c = Counter(a)
        want = (max(c.values()) if c else 0, len(c))
        assert got[i] == want, (i, a, got[i], want)


def test_connected_components_long_chain(spark):
    """A path component (diameter >> round budget) must still resolve:
    pointer jumping doubles propagation reach per round, so a
    40-node chain converges in ~log2(39) rounds — without it,
    min-label propagation needs diameter rounds and the old
    implementation silently returned split components past max_iter."""
    from banking_data_etl_pipeline_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert comp == {i: 0 for i in range(40)}


def test_minhash_incremental_screens_batch_against_corpus(spark):
    """A new batch doc identical to a corpus doc must collide with
    est_jaccard 1.0; an unrelated doc must not appear; corpus-corpus
    and batch-batch pairs are out of scope for the incremental probe."""
    text = "one two three four five six seven eight nine ten eleven twelve"
    corpus = spark.createDataFrame(
        [(1, text), (2, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, text), (101, "totally unrelated words nothing shared here at all")],
        "doc_id long, text string",
    )
    got = dedup.minhash_lsh_incremental(batch, corpus).collect()
    assert [(r.batch_id, r.corpus_id, r.est_jaccard) for r in got] == [(100, 1, 1.0)]


def test_dup_span_stats_hand_worked(spark):
    """Two docs share one 8-token span; a third is unique; a fourth is
    too short for any shingle — n_shingles/n_shared/dup_frac/dup_heavy
    computed by hand."""
    shared = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} extra1"),  # shingles: shared, 'b..extra1'
            (2, f"{shared} extra2"),  # shingles: shared, 'b..extra2'
            (3, "z1 z2 z3 z4 z5 z6 z7 z8"),  # one unshared shingle
            (4, "short doc"),  # 0 shingles
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.dup_span_stats(docs, n=8).collect()}
    assert len(out) == 4
    for d in (1, 2):
        assert (out[d].n_shingles, out[d].n_shared) == (2, 1)
        assert out[d].dup_frac == 0.5 and out[d].dup_heavy
    assert (out[3].n_shingles, out[3].n_shared) == (1, 0)
    assert out[3].dup_frac == 0.0 and not out[3].dup_heavy
    assert (out[4].n_shingles, out[4].n_shared) == (0, 0)
    assert out[4].dup_frac == 0.0 and not out[4].dup_heavy


def test_semdedup_drops_higher_id_near_dups(spark):
    from banking_data_etl_pipeline_spark.operators import dedup

    # two exact duplicates (1,3), one near-orthogonal vector (2);
    # centroids = both lowest-id vectors -> 1,3 share a cell
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [1.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in dedup.semdedup(emb, n_cells=2, tau=0.9).collect()}
    assert out[1].kept is True       # lowest id in the clique survives
    assert out[3].kept is False      # its duplicate is dropped
    assert out[2].kept is True       # different cell / below tau
    assert out[1].cell == out[3].cell


def test_semdedup_all_kept_below_tau(spark):
    from banking_data_etl_pipeline_spark.operators import dedup

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = dedup.semdedup(emb, n_cells=2, tau=0.99)
    assert all(r.kept for r in out.collect())


def test_quantize_int8_range_and_reconstruction(spark):
    from pyspark.sql import functions as F

    from banking_data_etl_pipeline_spark.functions import vectors

    emb = tables.load(spark, SF_DIR, "embeddings")
    q = vectors.quantize_int8(emb)
    dims = emb.first()
    n = emb.count()
    assert q.count() == n * len(dims.embedding)
    rng = q.agg(F.min("q").alias("lo"), F.max("q").alias("hi")).first()
    assert -127 <= rng.lo and rng.hi <= 127
    # dequantized error is bounded by half a step of the per-dim scale
    flat = emb.select("vec_id", F.posexplode("embedding").alias("dim", "v"))
    sc = flat.groupBy("dim").agg(
        (F.greatest(F.max(F.abs(F.col("v").cast("double"))), F.lit(1e-30)) / 127.0).alias("scale")
    )
    err = (
        q.join(sc, "dim")
        .join(flat, ["vec_id", "dim"])
        .select(
            (F.abs(F.col("q") * F.col("scale") - F.col("v").cast("double")) / F.col("scale")).alias("e")
        )
        .agg(F.max("e"))
        .first()[0]
    )
    assert err <= 0.5 + 1e-9


def test_jl_project_preserves_norms_in_expectation(spark):
    import math

    from pyspark.sql import functions as F

    from banking_data_etl_pipeline_spark.functions import vectors

    emb = tables.load(spark, SF_DIR, "embeddings")
    proj = vectors.jl_project(emb)
    # reassemble per-vector projected norms and compare to originals:
    # E[||proj||^2] = ||x||^2 under the sqrt(out_dim) scaling, so the
    # corpus-mean ratio must sit near 1 (16 dims -> loose band)
    pn = proj.groupBy("vec_id").agg(F.sum(F.col("val") * F.col("val")).alias("p2"))
    on = emb.select(
        "vec_id",
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x * x,
        ).alias("o2"),
    )
    rows = pn.join(on, "vec_id").select((F.col("p2") / F.col("o2")).alias("r")).collect()
    ratios = [r.r for r in rows]
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean
    # and the matrix is the documented deterministic one
    m = vectors.jl_signs()
    assert m == vectors.jl_signs() and len(m) == 16 and len(m[0]) == 64
    assert all(abs(s) == 1.0 for row in m for s in row)
    assert not math.isnan(mean)


def test_energy_profile_monotone_and_complete(spark):
    """Prefix energy is monotone non-decreasing in d, hits exactly 1.0
    at the full dimensionality, and matches a hand-computed value on a
    known vector set."""
    from banking_data_etl_pipeline_spark.functions import vectors

    emb = tables.load(spark, SF_DIR, "embeddings")
    prof = {
        r.prefix_dim: r
        for r in vectors.energy_profile(emb, prefix_dims=(8, 16, 32, 64)).collect()
    }
    n = emb.count()
    vals = [prof[d].mean_energy for d in (8, 16, 32, 64)]
    assert all(prof[d].n == n for d in prof)
    assert all(a <= b for a, b in zip(vals, vals[1:])), vals
    assert vals[-1] == 1.0  # full prefix captures everything
    assert 0.0 < vals[0] < 1.0

    # hand-computed: [3,4] -> d=1 captures 9/25; zero vector -> 0.0
    tiny = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {
        r.prefix_dim: r.mean_energy
        for r in vectors.energy_profile(tiny, prefix_dims=(1, 2)).collect()
    }
    assert got[1] == round((9.0 / 25.0 + 0.0) / 2, 6)
    assert got[2] == round((1.0 + 0.0) / 2, 6)


def test_standardize_dims_moments_and_constant_dim(spark):
    """z-scores have per-dim mean ~0 and std ~1; a constant dimension
    standardizes to NULL (nullif guard), never an ANSI error."""
    from banking_data_etl_pipeline_spark.functions import vectors

    emb = tables.load(spark, SF_DIR, "embeddings")
    rows = vectors.standardize_dims(emb).collect()
    by_dim: dict = {}
    for r in rows:
        by_dim.setdefault(r.dim, []).append(r.z)
    for d, zs in list(by_dim.items())[:8]:
        assert all(z is not None for z in zs)
        m = sum(zs) / len(zs)
        v = sum((z - m) ** 2 for z in zs) / len(zs)
        assert abs(m) < 1e-4, (d, m)
        assert abs(v - 1.0) < 1e-3, (d, v)

    const = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [2.0, 5.0]), (2, [3.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    out = {(r.vec_id, r.dim): r.z for r in vectors.standardize_dims(const).collect()}
    assert out[(0, 1)] is None and out[(2, 1)] is None  # constant dim
    assert out[(0, 0)] is not None and out[(0, 0)] < 0 < out[(2, 0)]


def test_span_removal_cuts_shared_spans_only(spark):
    shared = "a b c d e f g h"  # exactly one 8-token span, in both docs
    docs = spark.createDataFrame(
        [
            (1, f"{shared} tail1 unique1"),
            (2, f"head2 {shared} tail2"),
            (3, "totally different words here with no overlap at all ok"),
            (4, "short doc"),  # < 8 tokens: passes through unchanged
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.shared_span_removal(docs).collect()}
    assert out[1].cleaned_text == "tail1 unique1"
    assert out[1].n_removed == 8 and out[1].n_tokens == 10
    assert out[2].cleaned_text == "head2 tail2"
    assert out[3].n_removed == 0
    assert out[3].cleaned_text == docs.filter("doc_id = 3").first().text
    assert out[4].cleaned_text == "short doc" and out[4].n_removed == 0
    assert out[5].cleaned_text == "" and out[5].n_tokens == 0


def test_span_removal_overlapping_spans_merge_coverage(spark):
    # docs share a 9-token run -> two overlapping shared 8-spans in
    # each; coverage must merge (9 tokens cut, not 16)
    run = "a b c d e f g h i"
    docs = spark.createDataFrame(
        [(1, f"{run} x1"), (2, f"{run} x2")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.shared_span_removal(docs).collect()}
    assert out[1].n_removed == 9 and out[1].cleaned_text == "x1"
    assert out[2].n_removed == 9 and out[2].cleaned_text == "x2"


def test_span_removal_within_doc_repeat_does_not_self_trigger(spark):
    rep = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, f"{rep} {rep}"), (2, "nothing shared with the first doc at all")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.shared_span_removal(docs).collect()}
    # the 8-gram repeats within doc 1 only -> df(distinct docs) == 1
    # -> not shared -> nothing removed
    assert out[1].n_removed == 0


@pytest.mark.slowtier
def test_ann_recall_harness_bounds(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    rows = similarity.ann_recall(emb, q, k=10).collect()
    assert len(rows) == 5
    arms = ("lsh", "ivf", "pq", "ivfpq", "ivfpq_res")
    for r in rows:
        assert r.n_true == 10
        for a in arms:
            hit = getattr(r, f"hit_{a}")
            assert 0 <= hit <= 10, (a, hit)
            assert abs(getattr(r, f"recall_{a}") - hit / 10) < 1e-6, a
    # the approximate indexes must be doing SOMETHING: mean recall > 0
    for a in arms:
        assert sum(getattr(r, f"recall_{a}") for r in rows) > 0, a
    # the composed indexes (ADC shortlist + exact re-rank) should beat
    # plain ADC top-k — the re-rank exists to repair PQ ranking error
    assert sum(getattr(r, "hit_ivfpq") for r in rows) >= sum(
        getattr(r, "hit_pq") for r in rows
    )


@pytest.mark.slowtier
def test_ivf_pq_residual_determinism_and_recall(spark):
    """residual=True (classic IVFPQ): deterministic under
    repartitioning, recall above the measured floor (0.78 measured at
    this SF — statistically tied with raw encoding on this corpus; the
    coarse centroids' norm is only ~0.3 of the vector norm, so the
    residual cloud is barely tighter than the raw cloud — see
    SCALE.md's residual-PQ note)."""
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    got = [
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_pq_topk(emb, q, k=10, residual=True).collect()
    ]
    re = [
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_pq_topk(
            emb.repartition(7), q, k=10, residual=True
        ).collect()
    ]
    assert sorted(got) == sorted(re)
    assert len(got) == 50
    truth = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(emb, q, k=10).collect()
    }
    recall = len({(g, v) for (g, v, _s, _r) in got} & truth) / 50
    assert recall >= 0.5, recall


@pytest.mark.slowtier
def test_ann_recall_shared_models_match_self_trained(spark):
    """The model-sharing hook: passing pre-trained cents/books into
    the arms must be bit-identical to each arm training for itself
    (determinism is what makes the sharing legal)."""
    from banking_data_etl_pipeline_spark.operators import clustering

    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    cents = clustering.train_centroids(emb, 16, 2, "embedding", "vec_id")
    books = similarity.pq_train_codebooks(emb, 4, 16, 1, "embedding", "vec_id")
    self_trained = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_pq_topk(emb, q, k=10).collect()
    )
    injected = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_pq_topk(
            emb, q, k=10, cents=cents, books=books
        ).collect()
    )
    assert self_trained == injected
    ivf_self = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_topk(emb, q, k=10).collect()
    )
    ivf_inj = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rank)
        for r in similarity.ivf_topk(emb, q, k=10, centroids=cents).collect()
    )
    assert ivf_self == ivf_inj


@pytest.mark.slowtier
def test_ivf_build_probe_matches_telescoped(spark, tmp_path):
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    path = str(tmp_path / "ivf_index")
    similarity.build_ivf_index(emb, path)
    # the persisted layout is partitioned by cell (one dir per cell)
    import os

    cells = [d for d in os.listdir(path + "/cells") if d.startswith("cell=")]
    assert len(cells) > 1
    probed = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in similarity.probe_ivf_index(spark, path, q, k=10).collect()
    }
    tele = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in similarity.ivf_topk(emb, q, k=10).collect()
    }
    assert probed == tele


def test_filtered_topk_respects_metadata_slice(spark):
    """Pre-filtered ANN: each query only ranks vectors sharing its
    label, self-matches excluded, and the plan is a broadcast HASH
    join on the filter attribute — never a nested-loop over the
    corpus."""
    from banking_data_etl_pipeline_spark.operators import similarity

    rows = [
        # label 0: query 0 plus three candidates at decreasing cosine
        (0, [1.0, 0.0], 0),
        (2, [1.0, 0.1], 0),
        (4, [0.5, 0.5], 0),
        (6, [-1.0, 0.0], 0),
        # label 1: a PERFECT match that must be invisible to query 0
        (1, [1.0, 0.0], 1),
        (3, [0.9, 0.2], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = similarity.corpus_filtered_queries(emb, n=1)
    out = similarity.filtered_topk(emb, q, k=3).collect()
    got = [(r.vec_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [(2, 1), (4, 2), (6, 3)]  # label-1 ids never appear
    plan = similarity.filtered_topk(emb, q, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_catches_superset_jaccard_misses(spark):
    """A short quote verbatim-embedded in a long article: containment
    of the quote is 1.0 while Jaccard is small — the pair must surface
    with jaccard_misses=True. An unrelated doc must not pair at all."""
    from banking_data_etl_pipeline_spark.operators import dedup

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler),
            (3, "completely different text about other things entirely"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.containment_pairs(docs, threshold=0.8).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    r = rows[0]
    # every quote shingle appears in doc 2 (quote surrounded by spaces)
    assert r.c_ab == 1.0
    assert r.jaccard < 0.8
    assert bool(r.jaccard_misses) is True
    spark.catalog.clearCache()
