"""Iterative clustering (Lloyd's k-means) over the embeddings table —
the driver-loop-iterative operator family.

Each iteration is one map-only assignment pass (centroids inlined as a
literal, same pattern as ``similarity.ivf_topk`` — no corpus×centroid
join, no shuffle for the argmax) plus one aggregation shuffle for the
centroid update. The update sums components through DECIMAL(28,12), so
centroids are EXACTLY order-independent: the result is a pure function
of (data, k, iterations) regardless of partitioning — which is what
makes an iterative distributed algorithm reproducible at any scale.

The decimal-exact updates are what make a full value-hash oracle
possible: ``oracle.kmeans_sql`` unrolls the iterations into CTEs that
repeat the same nearest-double steps (DECIMAL component sums, double
division by the count, one fold order for distances), so the DuckDB
twin walks bit-identical centroids through every iteration.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors


def _assign(emb: DataFrame, centroids: list[tuple[int, list[float]]],
            vec_col: str, id_col: str) -> DataFrame:
    """Map-only nearest-centroid assignment (squared L2, lowest-cid
    tiebreak) against a literal centroid array."""
    # one list-literal node per centroid vector (not dim-many lit
    # nodes): identical array<double> values, ~dim× smaller expression
    # tree — the analyzer/codegen cost of the literal-heavy assignment
    # plan was the dominant per-iteration overhead
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                vectors.lit_doubles(vec).alias("cvec"),
            )
            for cid, vec in centroids
        ]
    )
    dists = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), c["cvec"], lambda a, b: (a.cast("double") - b) ** 2
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    # array_min picks lowest distance, ties -> lowest cid (struct order)
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        F.array_min(dists)["cid"].alias("cluster"),
    )


def train_centroids(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 1,
    plan_hook=None,
) -> list[tuple[int, list[float]]]:
    """The Lloyd training loop alone: k (cid, centroid) pairs after
    ``iterations`` decimal-exact updates from the lowest-id init.
    Shared by ``kmeans`` and by ``similarity.ivf_topk`` /
    ``dedup.semdedup`` (``train_iterations>0``), where data-trained
    centroids keep the inverted-file cells balanced — arbitrary-id
    centroids can leave one hot cell that degrades a probe toward
    brute force. Driver traffic per iteration is k centroid rows
    (model-parameter scale).

    ``sample_mod > 1`` trains on the deterministic 1-in-``sample_mod``
    id-residue sample — how production coarse quantizers are fit (the
    cell structure needs only the data DISTRIBUTION, not every row; at
    100 TB a full-corpus k-means per query would dwarf the query).
    Deterministic, so the DuckDB twin applies the same residue filter
    and walks identical centroids. Init = the k lowest-id sampled
    vectors (rank-based, so it works on sparse id spaces too).

    ``plan_hook(stage, df)``, when given, receives the first
    iteration's update-aggregate DataFrame before it executes — the
    representative per-iteration plan ``scripts/plan_audit.py`` records
    (the loop is driver-side, so the query-level audit can't see it)."""
    if sample_mod > 1:
        sampled = emb.filter(F.col(id_col) % sample_mod == 0)
        # a sample smaller than k can't seed k centroids — train on the
        # full set instead (only reachable on toy inputs; the
        # registered corpora sample thousands of vectors, so the
        # oracle twins never see this branch)
        if sampled.limit(k).count() >= k:
            emb = sampled
    head = emb.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError(
            f"train_centroids: empty input or NULL {vec_col} in the first "
            "row — clean the vector column before clustering"
        )
    dim = len(head[0])
    # loud ragged/NULL validation (r7 ADVICE): the posting-list update
    # below would silently DROP null vectors (posexplode emits no rows,
    # shifting n) and silently TRUNCATE over-length ones (_pos < dim),
    # while under-length ones raise — i.e. one ragged direction shifts
    # centroids without a sound. Fail loudly on all three up front.
    bad = (
        emb.filter(F.col(vec_col).isNull() | (F.size(F.col(vec_col)) != dim))
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            f"train_centroids: NULL or ragged {vec_col} values (expected "
            f"fixed width {dim}) — clean the vector column before clustering"
        )
    init = (
        emb.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    centroids = [(int(r[0]), [float(x) for x in r[1]]) for r in init]

    for it in range(iterations):
        assigned = _assign(emb, centroids, vec_col, id_col)
        # exact order-independent update as a POSTING-LIST aggregate:
        # posexplode to (cluster, pos, x) rows, DECIMAL-sum per
        # (cluster, pos) with map-side combine (k*dim rows per map
        # partition reach the shuffle), then fold back to one
        # array-of-sums row per cluster. The earlier shape — one
        # decimal sum COLUMN per dimension — built a dim-wide
        # aggregate buffer whose expression tree and codegen blow up
        # at dim >= 1024; this one's plan is constant-size in dim and
        # the sums are the same order-independent decimals, so
        # centroids (and every oracle twin walking them) are
        # bit-identical. Driver pull stays k rows of dim-arrays —
        # model-parameter scale. Vectors are fixed-width by the loud
        # pre-check above; the _pos filter and the ragged re-check on
        # the pulled sums stay as defense-in-depth.
        agg = (
            assigned.select("cluster", F.posexplode("v").alias("_pos", "_x"))
            .filter(F.col("_pos") < dim)
            .groupBy("cluster", "_pos")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum(F.col("_x").cast("decimal(28,12)")).alias("_s"),
            )
            .groupBy("cluster")
            .agg(
                F.max("_n").alias("n"),
                F.array_sort(F.collect_list(F.struct("_pos", "_s"))).alias(
                    "sums"
                ),
            )
        )
        if plan_hook is not None and it == 0:
            plan_hook("assign+update", agg)
        rows = {r["cluster"]: r for r in agg.collect()}
        new_centroids = []
        for cid, old in centroids:
            r = rows.get(cid)
            if r is None or r["n"] == 0:  # empty cluster keeps its centroid
                new_centroids.append((cid, old))
            else:
                if len(r["sums"]) != dim:
                    raise ValueError(
                        f"train_centroids: ragged vectors in cluster {cid} "
                        f"({len(r['sums'])} summed dims, expected {dim})"
                    )
                n = r["n"]
                new_centroids.append(
                    (cid, [float(p["_s"]) / n for p in r["sums"]])
                )
        centroids = new_centroids
    return centroids


def kmeans(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means; init = the k lowest-id vectors.
    Returns per-cluster size and the centroid (rounded), deterministic
    across partitionings."""
    centroids = train_centroids(emb, k, iterations, vec_col, id_col)
    final = _assign(emb, centroids, vec_col, id_col)
    cent_map = {cid: vec for cid, vec in centroids}
    cent_arr = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cent_map]),
        F.array(
            *[
                F.array(*[F.round(F.lit(x), 6) for x in cent_map[c]])
                for c in cent_map
            ]
        ),
    )
    return (
        final.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .withColumn("centroid", cent_arr[F.col("cluster")])
        .select("cluster", "n_members", "centroid")
    )


def cluster_purity(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """External clustering evaluation of the k-means assignment
    against the labeled ``label`` column — purity (Σ_c max_l n_cl / N,
    the "how label-homogeneous are the clusters" share) and NMI
    (I(C;L)/√(H(C)·H(L)), Strehl & Ghosh 2002 — purity's inflation-
    resistant companion: assigning everything to singletons games
    purity but not NMI). The readout that turns kmeans from an
    operator into a measured clusterer.

    Scale shape: rides the same decimal-exact Lloyd training and
    map-only literal-centroid assignment as ``kmeans``; everything
    after is ONE groupBy over the |clusters|×|labels| contingency
    (model-parameter scale) plus margin joins on that tiny frame.
    Exact integer counts throughout; the entropy/MI terms are 12-dp
    rounded and summed through DECIMAL(26,12) (order-independent),
    divisions terminal.

    ``centroids``, when given, injects a PREBUILT model (e.g. the
    content-fingerprinted staging in ``queries._kmeans_model``) and
    skips the Lloyd walk — the eval then costs one assignment pass
    plus the contingency matrix, the build/probe amortization the
    prebuilt ANN lifecycles model. Training is deterministic, so
    injected-vs-fresh results are bit-identical.

    Returns one row (n, n_clusters, n_labels, purity_num, purity,
    nmi) — purity/nmi 6-dp."""
    if centroids is None:
        centroids = train_centroids(emb, k, iterations, vec_col, id_col)
    assigned = _assign(emb, centroids, vec_col, id_col)
    cells = (
        assigned.select("vec_id", "cluster")
        .join(
            emb.select(F.col(id_col).alias("vec_id"), F.col(label_col)),
            "vec_id",
        )
        .groupBy("cluster", label_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cl"))
    )
    cl_tot = cells.groupBy("cluster").agg(
        F.sum("n_cl").cast("bigint").alias("n_c")
    )
    lb_tot = cells.groupBy(label_col).agg(
        F.sum("n_cl").cast("bigint").alias("n_l")
    )
    n_all = cells.agg(F.sum("n_cl").alias("n")).scalar().cast("bigint")
    purity_num = (
        cl_tot.join(
            cells.groupBy("cluster").agg(F.max("n_cl").alias("mx")), "cluster"
        )
        .agg(F.sum("mx").alias("p"))
        .scalar()
        .cast("bigint")
    )
    # per-cell MI term and per-margin entropy terms: exact ints into
    # one fixed double expression, 12-dp rounded, DECIMAL-summed
    j = cells.join(cl_tot, "cluster").join(lb_tot, label_col).withColumn(
        "n_all", n_all
    )
    mi_term = F.expr(
        "CAST(round((CAST(n_cl AS DOUBLE) / CAST(n_all AS DOUBLE))"
        " * ln(CAST(n_cl AS DOUBLE) * CAST(n_all AS DOUBLE)"
        "      / (CAST(n_c AS DOUBLE) * CAST(n_l AS DOUBLE))), 12)"
        " AS DECIMAL(26,12))"
    )
    mi = j.agg(F.sum(mi_term).alias("mi"))
    hc = (
        cl_tot.withColumn("n_all", n_all)
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(-(CAST(n_c AS DOUBLE) / CAST(n_all AS DOUBLE))"
                    " * ln(CAST(n_c AS DOUBLE) / CAST(n_all AS DOUBLE)), 12)"
                    " AS DECIMAL(26,12))"
                )
            ).alias("hc")
        )
    )
    hl = (
        lb_tot.withColumn("n_all", n_all)
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(-(CAST(n_l AS DOUBLE) / CAST(n_all AS DOUBLE))"
                    " * ln(CAST(n_l AS DOUBLE) / CAST(n_all AS DOUBLE)), 12)"
                    " AS DECIMAL(26,12))"
                )
            ).alias("hl")
        )
    )
    counts = cells.agg(
        F.count_distinct("cluster").cast("bigint").alias("n_clusters"),
        F.count_distinct(label_col).cast("bigint").alias("n_labels"),
    )
    # the three 1-row metric reductions (MI, H(C), H(L)) enter as
    # uncorrelated scalar subqueries like n_all/purity_num above — no
    # 1-row crossJoins/NLJs anywhere (r12 verdict item 7)
    mi_s = mi.scalar()
    hc_s = hc.scalar()
    hl_s = hl.scalar()
    return counts.select(
        n_all.alias("n"),
        "n_clusters",
        "n_labels",
        purity_num.alias("purity_num"),
        F.round(
            purity_num.cast("double") / n_all.cast("double"), 6
        ).alias("purity"),
        (
            F.round(
                mi_s.cast("double")
                / F.sqrt(hc_s.cast("double") * hl_s.cast("double")),
                6,
            )
            + F.lit(0.0)
        ).alias("nmi"),
    )
