"""PageRank by power iteration over a co-purchase graph — the
iterative-graph-algorithm representative (same driver-side-loop,
distributed-data pattern as Lloyd's k-means in clustering.py, but the
model state — the rank vector — stays DISTRIBUTED: one row per node,
never collected).

Spark-first shape per iteration: one shuffle join (edges ⋈ ranks on
src) + one aggregation (sum contributions by dst). Both key on node
ids, so pre-partitioning edges and ranks on the same key makes every
iteration reuse one partitioning (bucketed checkpoints at production
scale). The damping base term enters as an expression over a
driver-held scalar (node count — model-parameter scale, one count()).

Cross-engine float parity (the DuckDB twin unrolls the same
iterations): per-edge contributions are TRUNCATED to 12 dp
(floor(x*1e12)/1e12 — unlike round(), truncation has no half-way ties,
so it is bit-deterministic across engines), summed EXACTLY via
DECIMAL(32,12) (order-independent), and the new rank is truncated the
same way — so both engines walk bit-identical rank vectors through
every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def _trunc12(col: F.Column) -> F.Column:
    """Truncate a (positive) double to 12 dp, tie-free: the scaled
    value is an exact integer < 2^53, so both engines agree bitwise."""
    return F.floor(col * F.lit(1e12)).cast("double") / F.lit(1e12)


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Symmetric distinct edges between parts appearing in the same
    order.

    Shape: ONE shuffle gathers each order's part set (``collect_set``
    also dedupes within the order, so no pre-``distinct`` pass), the
    per-order pairing is a map-side double ``explode`` (bounded
    fan-out: orders have ~7 lines, so the blowup is ≤ 7² per order — a
    constant, not a skew risk), and one more shuffle dedupes the
    src < dst half across orders before the map-only mirror union.
    Two exchanges total, vs four for the equivalent self-join
    formulation (distinct + re-shuffle of both join sides + pair
    distinct) — the pairing itself never touches the network."""
    sets = lineitem.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    half = (
        sets.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    return half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(
    lineitem: DataFrame,
    iters: int = 3,
    broadcast_nodes: int = 2_000_000,
    plan_hook=None,
) -> DataFrame:
    """Damped PageRank over the co-purchase graph: builds the
    symmetric edge list and delegates to ``ranks_over_edges`` (the
    generic power-iteration machinery, shared with
    ``corpus.textrank_keywords``). Returns (node, r)."""
    return ranks_over_edges(
        copurchase_edges(lineitem), iters, broadcast_nodes, plan_hook
    )


def ranks_over_edges(
    edges: DataFrame,
    iters: int = 3,
    broadcast_nodes: int = 2_000_000,
    plan_hook=None,
    seed_mod: int | None = None,
) -> DataFrame:
    """Ranks after ``iters`` damped power iterations over a symmetric
    (src, dst) edge list, for nodes with at least one edge. Returns
    (node, r).

    When the node count is under ``broadcast_nodes`` the per-iteration
    edges⋈ranks join BROADCASTS the rank vector (a few MB — iterations
    become map-only over the cached edge list plus one small
    aggregation); above it the join falls back to a shuffle that
    co-partitions with the contribution aggregation. Node counts are
    usually orders of magnitude below edge counts, so the broadcast
    path is the common case.

    Each iteration's rank vector is persisted, materialized, and its
    predecessor released — lineage truncation, the same discipline as
    ``dedup.resolve_duplicates``. Without it the final action executes
    a plan nested ``iters`` deep whose broadcast stages re-run every
    earlier iteration (measured superlinear: the 3-deep chain cost
    ~2x the sum of its per-iteration parts at sf0.1).

    ``plan_hook(stage, df)``, when given, receives the first
    iteration's rank-update DataFrame before it materializes — the
    representative per-iteration plan for ``scripts/plan_audit.py``
    (the loop is driver-side, invisible to the query-level audit).

    ``seed_mod`` switches to PERSONALIZED PageRank (Page et al. 1999
    §6; Haveliwala 2002): teleport mass goes only to the seed set
    {node : node % seed_mod == 0} — init 1/|S| on seeds and 0
    elsewhere, per-node restart term 0.15/|S| on seeds and 0
    elsewhere. Identical plan shape per iteration (the restart term
    is a pure CASE projection); the symmetric graph guarantees every
    node receives contributions, so no rank row is ever dropped."""
    # PERSIST the raw edge list first: the degree aggregation and the
    # deg-folded table both consume it, and without the cache the
    # upstream edge build would run once per consumer (it is the
    # dominant cost of the whole query).
    edges = edges.persist()
    # degrees are the ONLY edge-wide aggregation needed: their key set
    # IS the node set (the graph is symmetric), so the node count — a
    # scalar model parameter, the one driver-side pull — is deg.count()
    # and the initial rank vector is a projection of deg. This saves
    # two further full passes over the edge list (a distinct-count and
    # an edge-wide distinct) that earlier versions ran.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    # materializes deg AND the edge cache beneath it; it also gates
    # BOTH broadcast decisions below — deg is node-count-sized too, so
    # force-broadcasting it above the gate would hit the same driver/
    # broadcast limits the gate exists for
    n_nodes = deg.count()
    bcast = n_nodes <= broadcast_nodes
    # broadcast fold keeps the (much larger) edge side shuffle-free on
    # the way into the cache; shuffle-join fallback above the gate
    ed = edges.join(F.broadcast(deg) if bcast else deg, "src").persist()
    ed.count()
    edges.unpersist()
    if seed_mod is None:

        def base_of(node_col: F.Column) -> F.Column:
            return F.lit(0.15) / F.lit(float(n_nodes))

        def init_of(node_col: F.Column) -> F.Column:
            return _trunc12(F.lit(1.0) / F.lit(float(n_nodes)))

    else:
        n_seeds = deg.filter(F.col("src") % seed_mod == 0).count()
        if n_seeds == 0:
            raise ValueError(
                f"ppr: no seed nodes (node % {seed_mod} == 0) in the graph"
            )

        def base_of(node_col: F.Column) -> F.Column:
            return F.when(
                node_col % seed_mod == 0, F.lit(0.15) / F.lit(float(n_seeds))
            ).otherwise(F.lit(0.0))

        def init_of(node_col: F.Column) -> F.Column:
            return F.when(
                node_col % seed_mod == 0,
                _trunc12(F.lit(1.0) / F.lit(float(n_seeds))),
            ).otherwise(F.lit(0.0))

    ranks = deg.select(
        F.col("src").alias("node"),
        init_of(F.col("src")).alias("r"),
    )
    prev = None
    for it in range(iters):
        r_in = F.broadcast(ranks) if bcast else ranks
        contrib = ed.join(r_in, ed["src"] == r_in["node"]).select(
            F.col("dst"),
            _trunc12(F.col("r") / F.col("deg")).alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                F.sum(F.col("c").cast("decimal(32,12)")).cast("double").alias("s")
            )
            .select(
                F.col("dst").alias("node"),
                _trunc12(
                    base_of(F.col("dst")) + F.lit(DAMPING) * F.col("s")
                ).alias("r"),
            )
            .persist()
        )
        if plan_hook is not None and it == 0:
            plan_hook("iteration", ranks)
        ranks.count()  # materialize now; truncates the lineage
        if prev is not None:
            prev.unpersist()
        prev = ranks
    # Release the edge and degree caches before returning: a
    # long-lived session calling pagerank repeatedly must not
    # accumulate edge-list-sized storage blocks per call. The returned
    # DataFrame stays persisted — caller-owned, one row per node
    # (unpersist it or clearCache when done, as bench.py and the
    # parity gate already do).
    ed.unpersist()
    deg.unpersist()
    return ranks


def triangle_counts(
    lineitem: DataFrame,
    broadcast_nodes: int = 2_000_000,
    broadcast_edges: int = 20_000_000,
    plan_hook=None,
    with_degrees: bool = False,
) -> DataFrame:
    """Per-node triangle counts over the co-purchase graph — the
    standard graph-locality/clustering signal (and the classic
    MapReduce triangle-enumeration benchmark).

    Spark-first shape (Cohen / node-iterator++): orient every
    undirected edge from its lower-(degree, id) endpoint to the higher
    one — a total order, so each triangle {x,y,z} survives as EXACTLY
    one directed path x->y->z plus its closing edge x->z. Orienting by
    degree bounds every node's OUT-degree by O(sqrt(m)) — the hub that
    would make a naive self-join quadratic ends up on the RECEIVING
    end of its edges. Triangles are then enumerated by ADJACENCY
    INTERSECTION, not a wedge join: for each oriented edge x->y the
    closing nodes are exactly out(x) ∩ out(y), so only triangles ever
    materialize — the wedge-join alternative would shuffle every
    2-path, orders of magnitude more rows than the triangles they
    close. Work is O(m^1.5) worst-case, all equi-joins on node ids,
    AQE-splittable on residual skew; the out-degree bound keeps every
    adjacency array O(sqrt(m)) so ``collect_list`` can't blow up.
    Integer-only — no float parity concerns.

    Same persist discipline as ``pagerank`` above: the edge list feeds
    the degree agg and the orientation, and the oriented list feeds
    both the adjacency build and the probe side, so each is
    materialized once and released as soon as its consumers are done.
    ``deg`` is node-count-sized; below ``broadcast_nodes`` it
    broadcasts into the orientation join (map-only), above it the join
    falls back to a shuffle."""
    edges = copurchase_edges(lineitem).persist()
    # degrees' key set IS the node set (symmetric graph) — same trick
    # as pagerank: one pass over the cached edges covers the node
    # count AND the degree table, no separate distinct-count pass
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    n_nodes = deg.count()  # also warms the edge cache
    d_in = F.broadcast(deg) if n_nodes <= broadcast_nodes else deg
    half = edges.filter(F.col("src") < F.col("dst"))
    h = (
        half.join(
            d_in.select(F.col("src"), F.col("deg").alias("ds")), "src"
        ).join(
            d_in.select(F.col("src").alias("dst"), F.col("deg").alias("dd")), "dst"
        )
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    # Repartition BEFORE caching: AQE coalesces the broadcast-join
    # output into very few partitions (right for the join, wrong for
    # what follows), and the intersect stage below is the CPU-heavy
    # one — cached at full width it runs on every core instead of
    # three. Hashing on `lo` also pre-co-partitions the non-broadcast
    # adjacency join fallback.
    width = lineitem.sparkSession.sparkContext.defaultParallelism
    e = h.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    ).repartition(width, "lo").persist()
    n_oriented = e.count()
    edges.unpersist()
    if not with_degrees:
        deg.unpersist()  # e is materialized; nothing reads deg anymore
    # The adjacency table totals m array entries across node-count
    # rows, so its broadcast gate is the EDGE count, not the node
    # count (2M half-edges ≈ 16 MB of longs). Below the gate the
    # intersect stage is MAP-ONLY over the thin cached edge list — no
    # shuffle ever carries an array; above it the joins fall back to
    # shuffles, the first of which is already co-partitioned on `lo`.
    adj = e.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
    a_in = F.broadcast(adj) if n_oriented <= broadcast_edges else adj
    tri = (
        e.join(a_in.select(F.col("lo").alias("_x"), F.col("nbrs").alias("nx")),
               F.col("lo") == F.col("_x"))
        .join(a_in.select(F.col("lo").alias("_y"), F.col("nbrs").alias("ny")),
              F.col("hi") == F.col("_y"))
        .select(
            F.col("lo").alias("x"),
            F.col("hi").alias("y"),
            F.explode(F.array_intersect("nx", "ny")).alias("z"),
        )
    )
    out = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
        .persist()
    )
    if plan_hook is not None:
        # the enumeration plan (orientation + adjacency intersect +
        # per-node fold) before it executes, for scripts/plan_audit.py
        # — the operator materializes eagerly, so the query-level
        # audit only ever sees the cached result
        plan_hook("enumerate", out)
    out.count()  # materialize before releasing the oriented-edge cache
    e.unpersist()
    if with_degrees:
        # clustering_coeff consumer: every degree>=2 node, zero-
        # triangle nodes included — reuses the deg frame this pass
        # already built instead of a second edge build (measured 2x
        # on the sf0.1 battery)
        res = (
            deg.filter(F.col("deg") >= 2)
            .select(
                F.col("src").alias("node"),
                F.col("deg").cast("bigint").alias("degree"),
            )
            .join(out, "node", "left")
            .select(
                "node",
                F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
                "degree",
            )
        )
        deg.unpersist()
        return res
    # caller-owned, one row per node (unpersist or clearCache when done
    # — bench.py and the parity gate already do)
    return out


def link_prediction(
    lineitem: DataFrame, top: int = 50, targets_mod: int = 100
) -> DataFrame:
    """Common-neighbors link prediction over the co-purchase graph:
    for a TARGET batch of nodes (the deterministic 1-in-``targets_mod``
    id residue — per-item recommendation batches are how this ships;
    an all-pairs sweep of a dense graph is never the product shape),
    score every non-neighbor at distance 2 by neighborhood Jaccard
    (|N(a) ∩ N(b)| / |N(a) ∪ N(b)|) and return the ``top`` strongest
    predicted links — the "customers also bought" primitive.

    Scale shape: anchoring the wedge join on the target batch bounds
    enumeration at |targets| x avg_deg² instead of the full Σ deg(m)²
    (this co-purchase graph is DENSE — avg degree ~120 at sf0.1, so
    the unanchored sweep is ~300M wedges vs ~3M anchored; measured,
    not guessed). Candidates collapse through a groupBy on (a, b)
    with map-side combine; existing edges leave via one anti-join;
    the top-n is a TakeOrdered with deterministic ties (score desc,
    then a, b). Exactness is per-target: every target's scores are
    exact, no sampling inside a target's neighborhood.

    Returns (a, b, common, jaccard), jaccard 6-dp-rounded."""
    edges = copurchase_edges(lineitem).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    anchored = edges.filter(F.col("src") % targets_mod == 0)
    cand = (
        anchored.alias("x")
        .join(edges.alias("y"), F.col("x.dst") == F.col("y.src"))
        .filter(F.col("x.src") != F.col("y.dst"))
        .groupBy(
            F.col("x.src").alias("a"), F.col("y.dst").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    fresh = cand.join(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("_db"))
    return (
        fresh.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.col("common").cast("bigint").alias("common"),
            F.round(
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b"))
        .limit(top)
    )


def kcore(
    lineitem: DataFrame,
    k: int = 3,
    min_weight: int = 2,
    max_rounds: int = 40,
    plan_hook=None,
) -> DataFrame:
    """k-core of the REPEATED-co-purchase graph by iterative peeling:
    keep only part pairs that co-occur in ≥ ``min_weight`` distinct
    orders (one-off basket coincidences are noise edges — the raw
    co-purchase graph is so dense that every node survives any
    useful k), then repeat "drop every node with degree < k (and its
    edges)" until stable — the standard cohesive-subgraph extractor
    (Seidman 1983; how graph systems separate a dense engaged core
    from the long pendant tail before community detection or
    embedding training).

    Edge build: the distinct (order, part) self-join is co-partitioned
    on the order key with blast radius bounded by basket size (the
    market_basket shape), and the HAVING prune keeps only repeated
    pairs before the mirror union.

    Spark shape: each round is ONE degree aggregation over the
    surviving symmetric edge list plus two semi-join filters against
    the ≥k node set — all equi-joins co-partitioned on node id, no
    pairwise work. The round's edge frame is eagerly
    ``localCheckpoint``ed and the previous round's cache released —
    NOT persist: each round references ``cur`` three times (degree agg
    + both endpoint filters), so an uncheckpointed chain triples the
    LOGICAL tree per round and Catalyst analysis blows up
    exponentially (the CC-loop lesson, dedup.py; reproduced here as a
    2 GB plan string). The driver sees only the alive-node COUNT per
    round (one scalar), and equal counts across consecutive rounds
    imply a fixed point (peeling only ever removes nodes, so
    keep ⊆ alive; equal size ⇒ equal set ⇒ no edge changed). Peeling
    converges in O(peel-depth) rounds — small on real graphs;
    ``max_rounds`` is a backstop, and the converged state is
    IDEMPOTENT, so the DuckDB twin's fixed unroll reproduces it
    exactly (the kmeans/pagerank precedent).

    ``plan_hook(stage, df)`` receives round 1's pruned-edge frame —
    the representative per-iteration plan for scripts/plan_audit.py.

    Returns (part, degree) for every k-core member with its
    WITHIN-CORE degree, ordered by part. Raises if ``max_rounds``
    passes without a fixed point — a partial peel is NOT a k-core,
    and silently returning one would corrupt every consumer (the
    connected-components convention)."""
    po = lineitem.select("l_orderkey", "l_partkey").distinct()
    half = (
        po.alias("a")
        .join(po.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_weight)
        .select("src", "dst")
    )
    cur = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    prev_alive = -1
    converged = False
    for i in range(max_rounds):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        n_alive = keep.count()
        if n_alive == prev_alive:
            converged = True
            break
        prev_alive = n_alive
        pruned = (
            cur.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
        )
        if plan_hook and i == 0:
            plan_hook("peel", pruned)
        nxt = pruned.localCheckpoint()  # eager: cuts the tripled lineage
        cur.unpersist()
        cur = nxt
    if not converged:
        raise RuntimeError(
            f"kcore: no fixed point after {max_rounds} rounds"
        )
    out = (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .select(F.col("src").alias("part"), "degree")
        .orderBy("part")
    )
    return out


def build_hits_edges(
    orders: DataFrame, lineitem: DataFrame, out_dir: str
) -> None:
    """BUILD phase of the staged HITS lifecycle: materialize the
    distinct customer→part purchase edge list once per corpus snapshot
    (r10 verdict: the orders⋈lineitem⋈distinct build re-ran on every
    ``hits`` invocation and dominated its 9 s warm time).

    Layout (all under ``out_dir``):
      - ``edges_by_c``  — edges hash-partitioned + sorted on ``c``
      - ``edges_by_p``  — the SAME edges partitioned + sorted on ``p``
      - ``meta``        — one row (n_c, n_p): node counts, so the probe
        makes its broadcast-vs-shuffle decision without count jobs
        (and from max(n_c, n_p) — both score vectors get broadcast)

    The dual orientation is the at-scale layout: each HITS half-step
    joins edges on a DIFFERENT key (authority step on ``c``, hub step
    on ``p``), so above the broadcast threshold a single-orientation
    edge list re-shuffles per half-step per iteration, while
    orientation-matched copies keep every join's probe side already
    clustered on its key — the classic store-the-graph-twice trade of
    bipartite power iteration. ``meta`` is written LAST so its
    ``_SUCCESS`` marker proves a complete publish."""
    import os

    edges = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .persist()
    )
    n_c = edges.select("c").distinct().count()
    n_p = edges.select("p").distinct().count()
    edges.repartition(8, "c").sortWithinPartitions("c").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "edges_by_c"))
    edges.repartition(8, "p").sortWithinPartitions("p").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "edges_by_p"))
    spark = edges.sparkSession
    spark.createDataFrame(
        [(n_c, n_p)], "n_c bigint, n_p bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "meta")
    )
    edges.unpersist()


def hits(
    orders: DataFrame | None = None,
    lineitem: DataFrame | None = None,
    iters: int = 2,
    broadcast_nodes: int = 2_000_000,
    plan_hook=None,
    *,
    edges: DataFrame | None = None,
    edges_by_p: DataFrame | None = None,
    n_c: int | None = None,
    n_p: int | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the BIPARTITE
    customer -> part purchase graph — the directed companion to the
    undirected-co-purchase ``pagerank``: authorities are the parts
    hub buyers concentrate on, hubs the customers whose baskets
    concentrate on authoritative parts. Classic mutual recursion,
    L2-normalized each half-step:

        auth(p) = sum over edges (c,p) of hub(c);   auth /= ||auth||2
        hub(c)  = sum over edges (c,p) of auth(p);  hub  /= ||hub||2

    Cross-engine determinism: every score is truncated to 12 dp
    (tie-free floor — the ``pagerank`` rule), every edge-sum and
    norm's sum-of-squares accumulates in DECIMAL(32,12) (exact, so
    accumulation order is irrelevant), and each L2 norm enters the
    plan as an uncorrelated scalar subquery over the persisted
    previous half-step — no driver-side pull at all.

    Scale shape: the edge list (distinct customer–part purchase
    pairs) persists once and both half-step joins reuse it; score
    vectors are node-count-sized, so the per-iteration join
    BROADCASTS them under ``broadcast_nodes`` (iterations become
    map-only over the cached edges + one groupBy) and falls back to a
    co-partitioned shuffle join above it. Each half-step is
    persisted, materialized, and its predecessor released — the
    lineage-truncation discipline every driver-side loop here follows.

    Prebuilt-lifecycle keywords: pass ``edges`` (the distinct (c, p)
    frame, e.g. the staged ``edges_by_c`` parquet) to skip the
    orders⋈lineitem build; ``edges_by_p`` optionally supplies the
    p-oriented copy for the hub half-step (defaults to ``edges``);
    ``n_c``/``n_p`` carry the staged node counts so no count jobs run.

    Returns (role, node, score): role 'authority' for parts, 'hub'
    for customers, scores from the final iteration."""
    if edges is None:
        edges = (
            orders.join(
                lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
            )
            .select(
                F.col("o_custkey").alias("c"),
                F.col("l_partkey").alias("p"),
            )
            .distinct()
        )
    edges = edges.persist()
    edges_p = edges if edges_by_p is None else edges_by_p.persist()
    if n_c is None:
        n_c = edges.select("c").distinct().count()
    if n_p is None:
        n_p = edges.select("p").distinct().count()
    # broadcast decision sizes BOTH vectors that get broadcast: the
    # hub (customer-count) and authority (part-count) score frames —
    # sizing from customers alone under-estimated when parts dominate
    bcast = max(n_c, n_p) <= broadcast_nodes

    def _l2(df: DataFrame, col: str):
        return F.sqrt(
            df.agg(
                F.sum(
                    _trunc12(F.col(col) * F.col(col)).cast("decimal(32,12)")
                )
                .cast("double")
                .alias("_n2")
            ).scalar()
        )

    hubs = edges.select("c").distinct().select(
        F.col("c").alias("node"), F.lit(1.0).alias("score")
    ).persist()
    hubs.count()
    auths = None
    prev_h, prev_a = None, None
    for it in range(iters):
        h_in = F.broadcast(hubs) if bcast else hubs
        a_raw = (
            edges.join(h_in, edges["c"] == h_in["node"])
            .groupBy("p")
            .agg(
                F.sum(F.col("score").cast("decimal(32,12)"))
                .cast("double")
                .alias("s")
            )
            .persist()
        )
        a_raw.count()
        auths = a_raw.select(
            F.col("p").alias("node"),
            _trunc12(F.col("s") / _l2(a_raw, "s")).alias("score"),
        ).persist()
        if plan_hook is not None and it == 0:
            plan_hook("iteration", auths)
        auths.count()
        a_raw.unpersist()
        if prev_a is not None:
            prev_a.unpersist()
        prev_a = auths
        a_in = F.broadcast(auths) if bcast else auths
        h_raw = (
            edges_p.join(a_in, edges_p["p"] == a_in["node"])
            .groupBy("c")
            .agg(
                F.sum(F.col("score").cast("decimal(32,12)"))
                .cast("double")
                .alias("s")
            )
            .persist()
        )
        h_raw.count()
        new_h = h_raw.select(
            F.col("c").alias("node"),
            _trunc12(F.col("s") / _l2(h_raw, "s")).alias("score"),
        ).persist()
        new_h.count()
        h_raw.unpersist()
        if prev_h is not None:
            prev_h.unpersist()
        if it == 0:
            hubs.unpersist()  # the initial all-ones vector
        prev_h = new_h
        hubs = new_h
    edges.unpersist()
    if edges_p is not edges:
        edges_p.unpersist()
    # final frames stay persisted — caller-owned, node-count-sized
    return auths.select(
        F.lit("authority").alias("role"), "node", "score"
    ).unionByName(
        hubs.select(F.lit("hub").alias("role"), "node", "score")
    )


def itemitem_cf(
    orders: DataFrame,
    lineitem: DataFrame,
    top: int = 20,
    max_basket: int = 64,
) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al. 2001): cosine
    similarity between parts over their binary customer-incidence
    vectors — cos(a,b) = |C_a ∩ C_b| / sqrt(|C_a|·|C_b|) — the
    "customers who bought this also bought" model build. Differs from
    ``link_prediction`` (anchored wedge Jaccard on the part-part
    projection): this scores the full model from the BIPARTITE
    incidence with the standard hot-user prune.

    Scale shape: candidate pairs come from a per-customer self-join of
    the distinct (customer, part) incidence — the blow-up is Σ
    basket², so customers with baskets over ``max_basket`` distinct
    parts are DROPPED FIRST (the Swing / item-CF power-user prune:
    a 10k-item basket contributes 1e8 pairs and ~zero signal; the cap
    makes the stage Σ min(basket, B)² — linear in customers). The
    basket-size filter, pair counts, and incidence counts are all
    map-side-combined groupBys; the top-``top`` is a TakeOrdered.
    Incidence counts |C_a| are computed AFTER the prune so the cosine
    is internally consistent.

    Exactness: counts are integers; the cosine is one shared double
    expression (6 dp); ties order by (common desc, part_a, part_b).

    Returns (part_a, part_b, common, n_a, n_b, cosine)."""
    inc = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    kept = (
        inc.groupBy("cust")
        .agg(F.count(F.lit(1)).alias("basket"))
        .filter(F.col("basket") <= max_basket)
        .select("cust")
    )
    pruned = inc.join(kept, "cust").persist()
    n_per_part = pruned.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(
            F.col("a.part").alias("part_a"),
            F.col("b.part").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    scored = (
        pairs.join(
            n_per_part.select(
                F.col("part").alias("part_a"), F.col("n").alias("n_a")
            ),
            "part_a",
        )
        .join(
            n_per_part.select(
                F.col("part").alias("part_b"), F.col("n").alias("n_b")
            ),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "common",
            "n_a",
            "n_b",
            F.round(
                F.col("common").cast("double")
                / F.sqrt(
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
    )
    out = scored.orderBy(
        F.desc("cosine"),
        F.desc("common"),
        F.asc("part_a"),
        F.asc("part_b"),
    ).limit(top)
    return out


def bfs_depths(
    lineitem: DataFrame,
    max_depth: int = 8,
    min_weight: int = 2,
    plan_hook=None,
) -> DataFrame:
    """Single-source BFS shortest-path depths over the repeated-
    co-purchase graph (the kcore edge build: part pairs sharing
    ≥ ``min_weight`` distinct orders), seeded at the minimum part id —
    the level-synchronous frontier expansion every distributed graph
    engine uses for unweighted shortest paths (Pregel's hello-world),
    here as plain DataFrame ops.

    Per level: ONE equi-join of the (small) frontier against the
    symmetric edge list on the node key, a distinct, and an anti-join
    against the visited set — no pairwise work, no path enumeration
    (walk-counting explodes combinatorially on dense graphs; the
    visited anti-join is what keeps each node expanded exactly once).
    The frontier/visited frames are eagerly ``localCheckpoint``ed per
    level (the kcore lineage lesson) and the loop early-exits on an
    empty frontier — ``max_depth`` bounds the diameter explored, so
    the DuckDB twin's fixed unroll reproduces the result exactly.

    Scale shape: visited grows to the reachable component, but every
    join is node-keyed (co-partitioned under AQE); the per-level
    frontier is broadcast when small. 100 TB of orders only densifies
    the EDGE build (one groupBy + HAVING); the BFS itself is sized by
    the part catalog, not the fact table.

    Returns (part, depth), depth ∈ [0, max_depth], ordered by part."""
    po = lineitem.select("l_orderkey", "l_partkey").distinct()
    half = (
        po.alias("a")
        .join(po.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_weight)
        .select("src", "dst")
    )
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    seed = edges.agg(F.min("src").alias("s")).collect()[0]["s"]
    spark = lineitem.sparkSession
    if seed is None:
        edges.unpersist()
        return spark.createDataFrame([], "part bigint, depth int")
    visited = _bfs_from(spark, edges, int(seed), max_depth, plan_hook)
    edges.unpersist()
    return visited.orderBy("part")


def _bfs_from(spark, edges, seed: int, max_depth: int, plan_hook=None):
    """The level-synchronous frontier loop from one seed over a
    persisted symmetric edge list — shared by ``bfs_depths`` and
    ``graph_diameter``'s double sweep. Returns the visited frame
    (part, depth)."""
    visited = spark.createDataFrame(
        [(int(seed), 0)], "part bigint, depth int"
    ).localCheckpoint()
    frontier = visited.select("part")
    frontier_n = 1
    # same gate as ranks_over_edges' broadcast_nodes: on a dense
    # connected graph the level-1/2 frontier approaches the whole node
    # set — broadcast only while it is provably small, else let the
    # node-keyed shuffle join (AQE co-partitioned) carry the level
    broadcast_frontier = 2_000_000
    for d in range(1, max_depth + 1):
        f_in = (
            F.broadcast(frontier)
            if frontier_n <= broadcast_frontier
            else frontier
        )
        expand = (
            f_in
            .join(edges, frontier["part"] == edges["src"])
            .select(F.col("dst").cast("bigint").alias("part"))
            .distinct()
            .join(visited.select("part"), "part", "left_anti")
            .select("part", F.lit(d).cast("int").alias("depth"))
        )
        if plan_hook is not None and d == 1:
            plan_hook("frontier", expand)
        nxt = expand.localCheckpoint()
        frontier_n = nxt.count()
        if frontier_n == 0:
            break
        prev = visited
        visited = visited.union(nxt).localCheckpoint()
        prev.unpersist()
        frontier = nxt.select("part")
    return visited


def graph_diameter(
    lineitem: DataFrame,
    max_depth: int = 8,
    min_weight: int = 2,
) -> DataFrame:
    """Double-sweep diameter LOWER BOUND of the repeated-co-purchase
    graph (Magnien, Latapy & Habib 2009: BFS from any node, then BFS
    from the farthest node found — the second eccentricity is a lower
    bound that is exact on trees and empirically tight on real
    graphs; an exact diameter is all-pairs and off the table at
    scale). The one-number "how stretched is this catalog's
    co-purchase structure" readout next to assortativity.

    Both sweeps reuse ONE persisted edge build and the shared
    ``_bfs_from`` frontier loop (broadcast-gated, per-level lineage
    truncation); driver traffic is two single-row pulls (seed and the
    argmax far node). ``max_depth`` bounds both sweeps; depths are
    exact BFS levels within the reachable, depth-bounded ball.

    Returns one row (seed, ecc_seed, far_node, diameter_lb)."""
    po = lineitem.select("l_orderkey", "l_partkey").distinct()
    half = (
        po.alias("a")
        .join(po.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_weight)
        .select("src", "dst")
    )
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    spark = lineitem.sparkSession
    seed = edges.agg(F.min("src").alias("s")).collect()[0]["s"]
    if seed is None:
        edges.unpersist()
        return spark.createDataFrame(
            [], "seed bigint, ecc_seed int, far_node bigint,"
            " diameter_lb int"
        )
    d1 = _bfs_from(spark, edges, int(seed), max_depth)
    far = (
        d1.orderBy(F.desc("depth"), F.asc("part")).limit(1).collect()[0]
    )
    d2 = _bfs_from(spark, edges, int(far["part"]), max_depth)
    ecc2 = d2.agg(F.max("depth").alias("m")).collect()[0]["m"]
    edges.unpersist()
    return spark.createDataFrame(
        [(int(seed), int(far["depth"]), int(far["part"]), int(ecc2))],
        "seed bigint, ecc_seed int, far_node bigint, diameter_lb int",
    )


def label_prop(
    lineitem: DataFrame,
    iters: int = 4,
    min_weight: int = 2,
    plan_hook=None,
) -> DataFrame:
    """Community labels by synchronous MIN-LABEL propagation over the
    repeated-co-purchase graph (the hash-min connected-components
    iteration of Rastogi et al. 2013 — the deterministic variant of
    label propagation: every node adopts the smallest label in its
    closed neighborhood each round, so after ``iters`` rounds each
    label has flooded its ``iters``-hop ball; run to fixpoint it IS
    weakly-connected components). Fixed ``iters`` keeps the DuckDB
    twin an exact unroll (the ``bfs_depths_sql`` pattern) and the
    result deterministic at any scale — no tie-break randomness
    anywhere, min() over bigint labels only.

    Scale shape: the edge build is the kcore/bfs repeated-co-purchase
    construction (one groupBy + HAVING over the fact table — the
    100 TB data touches exactly this pass); each round is ONE
    node-keyed equi-join (edges ⋈ labels, AQE co-partitioned), one
    min-groupBy, one left join — all keyed, no windows, no NLJs.
    Frames are eagerly ``localCheckpoint``ed per round (the kcore
    lineage lesson) so round k reads a materialized frame, not a
    k-deep plan.

    Returns (part, community) for every node, community = the
    smallest node id the label wave has reached it from."""
    po = lineitem.select("l_orderkey", "l_partkey").distinct()
    half = (
        po.alias("a")
        .join(po.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_weight)
        .select("src", "dst")
    )
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").cast("bigint").alias("part"))
        .distinct()
        .select("part", F.col("part").alias("community"))
        .localCheckpoint()
    )
    for i in range(1, iters + 1):
        nbr = (
            edges.join(
                labels.select(
                    F.col("part").alias("src"),
                    F.col("community").alias("nc"),
                ),
                "src",
            )
            .groupBy(F.col("dst").cast("bigint").alias("part"))
            .agg(F.min("nc").alias("nbr"))
        )
        nxt = labels.join(nbr, "part", "left").select(
            "part",
            F.least(
                F.col("community"),
                F.coalesce(F.col("nbr"), F.col("community")),
            )
            .cast("bigint")
            .alias("community"),
        )
        if plan_hook is not None and i == 1:
            plan_hook("round", nxt)
        prev = labels
        labels = nxt.localCheckpoint()
        prev.unpersist()
    edges.unpersist()
    return labels.orderBy("part")


def assortativity(lineitem: DataFrame, min_weight: int = 2) -> DataFrame:
    """Degree assortativity of the repeated-co-purchase graph (Newman
    2002): the Pearson correlation of (deg(src), deg(dst)) over the
    symmetric edge list — positive means hubs link to hubs (a core-
    periphery catalog), negative means hubs fan out to leaves; the
    one-number structure summary next to kcore/triangle_count.

    Exactness: the five sufficient statistics (M, Σx, Σxy, Σx², Σy²)
    are integer sums over edges (degrees are counts), aggregated in
    ONE map-side-combined pass; the correlation assembles them as
    doubles — products are taken AFTER the cast (M·Σx² at 100 TB edge
    counts would overflow int64; the double product is deterministic
    IEEE on both engines). The degree lookup is edges ⋈ degrees twice
    on the node key — the degree frame is node-catalog-sized, AQE
    broadcasts it when it fits.

    On a symmetric edge list Σx = Σy and Σx² = Σy² by construction —
    both are still computed (and emitted) independently as a built-in
    consistency check.

    Returns one row (m_edges, s_x, s_xy, assortativity) — the exact
    sums plus the 6-dp correlation."""
    po = lineitem.select("l_orderkey", "l_partkey").distinct()
    half = (
        po.alias("a")
        .join(po.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_weight)
        .select("src", "dst")
    )
    # persist: the edge list feeds the degree agg AND both lookup
    # joins, and deg itself is probed twice — without the caches the
    # dominant-cost edge build would run once per consumer (the
    # pagerank/kcore discipline; measured 22 -> ~8 distinct exchanges)
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    ).persist()
    labeled = (
        edges.join(deg, "src")
        .withColumnRenamed("deg", "dx")
        .join(deg.select(F.col("src").alias("dst"), F.col("deg").alias("dy")), "dst")
    )
    sums = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("dx").cast("bigint").alias("s_x"),
        F.sum("dy").cast("bigint").alias("s_y"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("s_xy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("s_xx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("s_yy"),
    ).localCheckpoint()  # eager 1-row materialize, then release caches
    edges.unpersist()
    deg.unpersist()
    m = F.col("m").cast("double")
    num = m * F.col("s_xy").cast("double") - F.col("s_x").cast("double") * F.col(
        "s_y"
    ).cast("double")
    den_x = m * F.col("s_xx").cast("double") - F.col("s_x").cast("double") * F.col(
        "s_x"
    ).cast("double")
    den_y = m * F.col("s_yy").cast("double") - F.col("s_y").cast("double") * F.col(
        "s_y"
    ).cast("double")
    return sums.select(
        F.col("m").alias("m_edges"),
        "s_x",
        "s_xy",
        (F.round(num / F.sqrt(den_x * den_y), 6) + F.lit(0.0)).alias(
            "assortativity"
        ),
    )


def clustering_coeff(lineitem: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient over the co-purchase
    graph: c_v = 2·T_v / (deg_v·(deg_v − 1)) — how close each node's
    neighborhood is to a clique (Watts & Strogatz 1998), the
    node-level refinement of triangle_count's global signal.

    Reuses the oriented-intersection triangle enumeration AND its
    degree frame in one pass (``triangle_counts(with_degrees=True)``
    — O(m^1.5), never a wedge shuffle, no second edge build); nodes
    with degree < 2 have no defined coefficient and are dropped, nodes
    in no triangle coalesce to 0. Exact integers until the single
    division.

    Returns (node, n_tri, degree, coeff) — coeff 6-dp, ordered by
    node."""
    td = triangle_counts(lineitem, with_degrees=True)
    return td.select(
        "node",
        "n_tri",
        "degree",
        F.round(
            (F.col("n_tri") * 2).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            6,
        ).alias("coeff"),
    ).orderBy("node")


def ppr(
    lineitem: DataFrame,
    seed_mod: int = 50,
    iters: int = 3,
    broadcast_nodes: int = 2_000_000,
    plan_hook=None,
) -> DataFrame:
    """Personalized PageRank over the co-purchase graph: the teleport
    restarts at the deterministic seed set (part % ``seed_mod`` == 0)
    instead of everywhere — "importance as seen FROM these parts",
    the standard related-items / seeded-recommendation ranker
    (Haveliwala 2002). Same damped power iteration, broadcast rank
    vector and lineage-truncation discipline as ``pagerank``."""
    return ranks_over_edges(
        copurchase_edges(lineitem),
        iters,
        broadcast_nodes,
        plan_hook,
        seed_mod=seed_mod,
    )
