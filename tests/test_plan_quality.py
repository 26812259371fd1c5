"""Plan-quality assertions — the 100 TB design checks: predicate
pushdown reaches the parquet scan, column pruning drops the binary
payload, dimension joins broadcast, top-k never collapses to
#queries reducers."""

from __future__ import annotations

import pytest

import os
import tempfile

from pyspark.sql import functions as F

from banking_data_etl_pipeline_spark.multimodal import binaryops
from banking_data_etl_pipeline_spark.operators import relational, similarity
from banking_data_etl_pipeline_spark.sources import tables

from conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_shipdate_filter(spark):
    li = tables.load(spark, SF_DIR, "lineitem")
    plan = _plan(relational.pricing_summary(li))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_media_metadata_prunes_payload_from_scan(spark):
    # write a real media parquet, then check the metadata-only read
    # never touches the payload column
    d = tempfile.mkdtemp(prefix="media_pq_")
    path = os.path.join(d, "media.parquet")
    media = binaryops.synthesize_media(tables.load(spark, SF_DIR, "documents"))
    media.write.mode("overwrite").parquet(path)

    stored = spark.read.parquet(path)
    plan = _plan(binaryops.media_metadata(stored))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    assert all("payload" not in ln for ln in scan_lines), scan_lines


def test_r5_curation_ops_plan_no_pair_stage(spark):
    """The r5 corpus additions must never plan a cartesian or
    nested-loop join: dup_spans joins back on the shingle hash,
    curation_pipeline on md5(text), xent_buckets on doc_id."""
    from banking_data_etl_pipeline_spark.operators import corpus, dedup

    docs = tables.load(spark, SF_DIR, "documents")
    for df in (
        dedup.dup_span_stats(docs),
        corpus.curation_pipeline(docs),
        corpus.xent_buckets(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_revenue_by_nation_broadcasts_dimension(spark):
    plan = _plan(
        relational.revenue_by_nation(
            tables.load(spark, SF_DIR, "lineitem"),
            tables.load(spark, SF_DIR, "orders"),
            tables.load(spark, SF_DIR, "customer"),
            tables.load(spark, SF_DIR, "nation"),
        )
    )
    assert "BroadcastHashJoin" in plan


def test_topk_exchanges_are_two_phase(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    q = similarity.corpus_queries(emb, n=5)
    plan = _plan(similarity.brute_force_topk(emb, q, k=10))
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    # the full-corpus exchange must be salted (query_id + partition id);
    # only the pruned survivors may hit a query_id-only exchange
    assert any("_part" in ln for ln in ex), ex


def test_core_pipeline_is_shuffle_free(spark):
    from banking_data_etl_pipeline_spark.plans import pipeline as P
    from banking_data_etl_pipeline_spark.sources import synthetic

    cfg = P.PipelineConfig(fixed_timestamp="2026-01-01T00:00:00Z", id_col="_raw")
    good, _bad = P.run_on_lines(synthetic.raw_lines(spark, SF_DIR), cfg)
    plan = _plan(good)
    assert "Exchange" not in plan, "reference pipeline must stay one narrow stage"


def test_raw_parse_evaluates_from_csv_once(spark):
    # the explode(array(from_csv)) barrier must keep the pushed-down
    # good/bad filters from inlining the parse once per reference
    from banking_data_etl_pipeline_spark.plans import pipeline as P
    from banking_data_etl_pipeline_spark.sources import synthetic

    cfg = P.PipelineConfig(fixed_timestamp="2026-01-01T00:00:00Z", id_col="_raw")
    _good, bad = P.run_on_lines(synthetic.raw_lines(spark, SF_DIR), cfg)
    opt = bad._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("from_csv") == 1, opt.count("from_csv")


def test_asof_join_is_single_shuffle(spark):
    plan = _plan(
        relational.asof_last_order(
            tables.load(spark, SF_DIR, "events"), tables.load(spark, SF_DIR, "orders")
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan


def test_range_join_never_nested_loop(spark):
    plan = _plan(relational.range_join_followers(tables.load(spark, SF_DIR, "events")))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cube_is_one_expand_pass(spark):
    plan = _plan(relational.cube_orders(tables.load(spark, SF_DIR, "orders")))
    assert plan.count("Expand") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_partitioned_sink_prunes_partitions(spark):
    from banking_data_etl_pipeline_spark.sources import sinks

    d = tempfile.mkdtemp(prefix="part_sink_")
    path = os.path.join(d, "events_by_type")
    ev = tables.load(spark, SF_DIR, "events")
    sinks.write_partitioned(ev, path, ["event_type"], sort_by=["ts"])

    back = sinks.read_pruned(spark, path)
    assert back.count() == ev.count()
    one = back.filter(back.event_type == "click")
    plan = _plan(one)
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and any("event_type" in ln for ln in scan), plan
    # directory pruning: only the matching partition's files are read
    import re

    m = re.search(r"partition count: (\d+)", plan)
    if m:
        assert int(m.group(1)) == 1, plan


def test_ivf_probe_prunes_nonprobed_cell_files(spark):
    """The persisted-IVF probe must actually PRUNE non-probed cells at
    the FILE level — the property that makes a probe read
    ~nprobe/n_centroids of a 100 TB index instead of all of it. The
    probe pushes the distinct probed-cell set (model scale, <=
    n_centroids values) as a literal partition filter, so the cells
    scan plans `PartitionFilters: [... cell IN (...)]` and the listed
    input files exclude every non-probed cell directory. (Runtime DPP
    would not fire here — Spark's selectivity heuristic does not
    recognize the projection-derived probe set — which is why the
    static filter exists.)"""
    d = tempfile.mkdtemp(prefix="ivf_dpp_")
    emb = tables.load(spark, SF_DIR, "embeddings")
    similarity.build_ivf_index(emb, d, n_centroids=16)
    q = similarity.corpus_queries(emb, n=2)
    probe = similarity.probe_ivf_index(spark, d, q, k=5, nprobe=2)

    plan = _plan(probe)
    cell_scans = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "/cells" in ln
    ]
    assert cell_scans, plan
    import re

    m = None
    for ln in cell_scans:
        m = m or re.search(
            r"PartitionFilters: \[[^\]]*cell#\d+L? IN \(([^)]*)\)", ln
        )
    assert m, "no static cell IN partition filter:\n" + "\n".join(cell_scans)
    probed = [int(x) for x in m.group(1).split(",")]
    # 2 queries x nprobe=2 probe at most 4 distinct cells, out of the
    # 16 on disk
    n_cells_on_disk = len(
        [p for p in os.listdir(os.path.join(d, "cells")) if p.startswith("cell=")]
    )
    assert n_cells_on_disk > 4, n_cells_on_disk
    assert 0 < len(probed) <= 4, probed

    # file-level runtime proof: executing the same partition filter
    # opens ONLY the probed cells' files (input_file_name reflects the
    # files actually read, post-pruning — unlike DataFrame.inputFiles,
    # which lists the pre-pruning index)
    read_files = {
        r[0]
        for r in spark.read.parquet(f"{d}/cells")
        .filter(F.col("cell").isin(probed))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    read_cells = {f.split("/cells/")[1].split("/")[0] for f in read_files}
    assert read_cells == {f"cell={c}" for c in probed}, read_cells


@pytest.mark.slowtier
def test_graph_probe_prunes_nonfrontier_buckets(spark):
    """The persisted-graph probe must touch only FRONTIER-ADJACENT
    rows: every hop pushes the collected frontier ids as literal
    ``bucket IN`` / ``src IN`` filters on the bucket-partitioned
    adjacency, so each hop reads the frontier's bucket directories
    instead of scanning the whole n×R adjacency (the graph-ANN
    scale contract; the IVF-probe static-pruning argument)."""
    import re

    d = tempfile.mkdtemp(prefix="nsw_dpp_")
    emb = tables.load(spark, SF_DIR, "embeddings")
    similarity.build_graph_index(emb, d, n_buckets=16)
    q = similarity.corpus_queries(emb, n=2)
    probe = similarity.probe_graph_index(
        spark, d, q, k=5, beam=2, hops=2, n_buckets=16
    )

    plan = _plan(probe)
    adj_scans = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "/adjacency" in ln
    ]
    # every hop's adjacency scan (2 hops in the final lineage) carries
    # a static bucket IN partition filter
    assert adj_scans, plan
    all_buckets = set()
    for ln in adj_scans:
        m = re.search(r"PartitionFilters: \[[^\]]*bucket#\d+L? IN \(([^)]*)\)", ln)
        assert m, "adjacency scan without bucket IN filter:\n" + ln
        all_buckets |= {int(x) for x in m.group(1).split(",")}
    # 2 queries x beam 2 x 2 hops -> at most 8 frontier ids, so at
    # most 8 of the 16 bucket dirs are ever listed
    n_on_disk = len(
        [p for p in os.listdir(os.path.join(d, "adjacency")) if p.startswith("bucket=")]
    )
    assert n_on_disk > 8, n_on_disk
    assert 0 < len(all_buckets) <= 8, sorted(all_buckets)

    # file-level runtime proof for one hop's filter: only the listed
    # buckets' files open
    read_files = {
        r[0]
        for r in spark.read.parquet(f"{d}/adjacency")
        .filter(F.col("bucket").isin(sorted(all_buckets)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    read_buckets = {
        f.split("/adjacency/")[1].split("/")[0] for f in read_files
    }
    assert read_buckets <= {f"bucket={b}" for b in all_buckets}, read_buckets


def test_ntile_deciles_has_no_single_partition_exchange(spark):
    # the distributed-rank NTILE must never collapse rows to one
    # reducer — the bare Window.orderBy it replaces planned an
    # `Exchange SinglePartition` over the whole table
    plan = _plan(relational.acctbal_deciles(tables.load(spark, SF_DIR, "customer")))
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan.lower(), plan


def test_judge_alpha_reuses_ratings_exchange(spark):
    # pins the justification for judge_alpha's allowed_bnlj entry:
    # keeping the 1-row margins reduction in the SAME tree as the
    # main plan lets ReusedExchange dedupe the expensive shared
    # ratings/by_uv build (the scalar-subquery form plans the build
    # twice and measured 2x slower on the battery, commit 9346fec).
    # If this ReusedExchange ever disappears, the crossJoin has lost
    # its reason to exist — re-measure before re-allowlisting.
    import __spark_entry__ as mod

    df = mod.queries()["judge_alpha"](spark, SF_DIR)
    df.collect()  # AQE surfaces ReusedExchange only in the final plan
    plan = _plan(df)
    assert "ReusedExchange" in plan, plan


@pytest.mark.slowtier
def test_no_query_plans_cartesian_or_nested_loop(spark):
    # sweep every registered batch query: the only nested-loop join
    # allowed is ann_brute's intentional broadcast-scoring crossJoin
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    streaming_or_iterative = {
        "stream_window_agg",
        "stream_dedup",
        "stateful_totals",
        "stream_interval_join",
        "stream_left_interval_join",
        "stream_sessionize",
        "stream_sessionize_append",
        "stream_static_join",
        "stream_srm",
        "kmeans",
        "dedup_resolve",  # iterative label propagation (runs jobs eagerly)
        "fuzzy_resolve",  # same resolver over fuzzy pairs
        "bpe_merges",  # driver-side merge loop (one argmax pull per step)
        "bpe_merges_batched",  # driver-side pass loop (one window pull/pass)
        "stream_quality_gate",  # runs its stream eagerly at build
        "stream_minhash_screen",  # same
        "stream_bloom_screen",  # same
        "stream_funnel",  # same
        "stream_psi_drift",  # same
        "stream_attribution",  # same
        "stream_ewma",  # same
        "ann_ivf_prebuilt",  # builds/reads the persisted index eagerly
        "kcore",  # iterative peel loop (localCheckpoint per round)
        "stream_topk_users",  # runs its stream eagerly at build
        "mmr_rerank",  # greedy selection loop (localCheckpoint per round)
        "stream_msprt",  # runs its stream eagerly at build
        "hits",  # iterative half-steps (persist+materialize per round)
        "hits_prebuilt",  # same loop over the staged edge copies
        "stream_recovery",  # runs two checkpointed streams eagerly
        "stream_recovery_msprt",  # same, over the built-in agg state
        "stream_cms_ngrams",  # runs its stream eagerly at build
        "stream_p95",  # runs its stream eagerly at build
        "stream_hll",  # runs its stream eagerly at build
        "stream_moments",  # runs its stream eagerly at build
        "kcenter_coreset",  # greedy driver loop (one top-1 pull/round)
        "emb_top_pc",  # power-iteration loop (localCheckpoint per step)
        "bt_strengths",  # MM iteration loop (localCheckpoint per step)
    }
    # intentional broadcast cross joins: ann_brute scores the tiny
    # query set against the corpus; source_divergence expands the
    # Zipf-small vocab against the handful of group totals — both
    # broadcast the small side, neither is an accidental plan
    allowed_bnlj = {
        "ann_brute",
        "ann_recall",
        "source_divergence",
        # |sources| x |sources| centroid comparison — catalog-sized
        # tiny cross join by design
        "source_semantic_map",
        # ADC scoring broadcasts the tiny staged-LUT query set against
        # the encoded corpus — the ann_brute pattern over codes
        "pq_topk",
        # composes brute_force_topk (the recall-oracle arm) for its
        # neighbor search — same intentional broadcast cross join
        "knn_classify",
        # semantic arm composes brute_force_topk; the lexical arm and
        # the fusion join are equi-joins
        "rank_fusion",
        # |sources| x |sources| pair grid — catalog-sized tiny cross
        # join by design (the source_semantic_map shape)
        "source_jaccard",
        # dequantized-code scoring broadcasts the tiny query set
        # against the un-shuffled corpus — the ann_brute pattern
        "ann_sq",
        # slice-bag scoring broadcasts the queries×m slice table
        # against the corpus slices — the ann_brute pattern
        "maxsim_topk",
        # ADC probe broadcasts the tiny staged per-query LUTs against
        # the codes-only corpus scan — the pq_topk shape with the LUT
        # side read from the prebuilt index
        "ann_pq_prebuilt",
        # pairwise grp_a < grp_b inequality join over ONE ROW PER
        # GROUP sketch thresholds (event types) — groups² rows of
        # model parameters, never data-proportional. (Was masked
        # until r9: the sorted sweep tripped on ann_pq_prebuilt
        # first.)
        "theta_sketch",
        # class × GLOBAL-value-histogram dense grid: the broadcast
        # side is the m-row value histogram (model-parameter scale),
        # never the data
        "t_closeness",
        # composes brute_force_topk for the exact arm — the ann_brute
        # intentional broadcast cross join; the RBO join itself is an
        # equi-join on (query_id, vec_id)
        "rbo_overlap",
        # composes brute_force_topk TWICE (full + prefix dims) — same
        # intentional broadcast cross join; the recall join is equi
        "matryoshka_recall",
        # day-pair inequality self-join over the CALENDAR-sized daily
        # aggregate (days², never data-proportional — the mann_kendall
        # precedent); its 1-row n_days total is a scalar subquery
        # since r13, so the pair join is the only NLJ left
        "kendall_tau",
        # measured-beneficial single-tree 1-row crossJoin (commit
        # 9346fec): the 1-row judge-mean reduction shares the
        # expensive ratings build with the main plan, so keeping it
        # in ONE tree lets ReusedExchange dedupe the shared build —
        # the scalar-subquery form plans the build twice and ran 2x
        # slower. test_judge_alpha_reuses_ratings_exchange pins the
        # ReusedExchange that justifies this entry.
        "judge_alpha",
        # HNSW's 1-row global entry seed is an intentional tiny
        # broadcast cross join (the cells² entry grid left the probe
        # plan in r15 — it is staged by build_graph_index now); the
        # maintained-index probe shares the seed shape
        "ann_hnsw",
        "ann_hnsw_incremental",
        # composes brute_force_topk over the survivor set for its
        # ground truth — the ann_brute intentional broadcast cross
        # join; both index arms and the recall joins are equi-joins
        "ann_churn_recall",
    }
    # r12: negative_samples left this allowlist — its draw→interval
    # lookup is now a bucketed-cell BroadcastHashJoin (the production
    # shape the r11 docstring promised), so the sweep holds it to the
    # no-BNLJ standard like everything else.
    # r13 (verdict item 7): the 1-row-totals crossJoins left this
    # allowlist — ks_drift / mannwhitney_u / cvm_drift / kmeans_purity
    # / survival_km / good_turing / tfidf_allpairs / tfidf_recall /
    # brier_eval / bootstrap_ci now thread their 1-row reductions as
    # uncorrelated scalar subqueries (struct-typed, single column
    # reference), so the sweep holds them unconditionally; the
    # remaining entries are intentional tiny-broadcast cross joins
    # (queries×corpus scoring, catalog grids), kendall_tau's
    # calendar-sized inequality pair join, and judge_alpha's
    # measured-beneficial single-tree 1-row crossJoin (above)
    # collect ALL violations before asserting: a first-failure abort
    # masks every later name in the sorted sweep (theta_sketch hid
    # behind ann_pq_prebuilt for a full round)
    #
    # build/plan the ~300 queries from a THREAD POOL: the per-query
    # cost is driver-side py4j + JVM analysis (no jobs run — eager
    # queries are excluded above), py4j releases the GIL on every
    # socket wait, and plan construction for distinct queries shares
    # no mutable state beyond the pin registry (whose cross-release
    # is correctness-safe by its documented contract). 8 workers cut
    # this sweep from ~220 s to ~60 s of the suite's budget.
    from concurrent.futures import ThreadPoolExecutor

    def check(item):
        name, fn = item
        plan = _plan(fn(spark, SF_DIR))
        out = []
        if "CartesianProduct" in plan:
            out.append(f"{name}: cartesian")
        if name not in allowed_bnlj and "BroadcastNestedLoopJoin" in plan:
            out.append(f"{name}: bnlj")
        return out

    todo = [
        (name, fn)
        for name, fn in sorted(mod.queries().items())
        if name not in streaming_or_iterative
    ]
    with ThreadPoolExecutor(max_workers=8) as pool:
        bad = [v for out in pool.map(check, todo) for v in out]
    assert not bad, bad


def test_zorder_key_interleaves_bits(spark):
    from banking_data_etl_pipeline_spark.sources import sinks

    df = spark.createDataFrame(
        [(0b101, 0b011)], "a long, b long"
    ).select(sinks.zorder_key(F.col("a"), F.col("b"), bits=4).alias("z"))
    # a=0b101 -> z bits 0,4; b=0b011 -> z bits 1,3: z = 1+2+8+16 = 27
    assert df.collect()[0].z == 27


@pytest.mark.slowtier
def test_zorder_layout_bounds_both_dimensions_per_file(spark):
    import glob
    import tempfile

    from banking_data_etl_pipeline_spark.sources import sinks

    # a 256x256 grid of points
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    d = tempfile.mkdtemp(prefix="test_zorder_")
    sinks.write_zordered(grid, d + "/z", "x", "y", files=16, bits=8)

    def extents(path):
        out = []
        for f in glob.glob(path + "/part-*.parquet"):
            p = spark.read.parquet(f).agg(
                (F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy"),
            ).collect()[0]
            out.append((p.dx, p.dy))
        return out

    zext = extents(d + "/z")
    # one-dimensional layout for contrast: y extent per file is the
    # full range, so y predicates never skip a file
    grid.repartitionByRange(16, F.col("x")).write.mode("overwrite").parquet(d + "/s")
    sext = extents(d + "/s")
    assert all(dy == 255 for _dx, dy in sext), sext
    # z-order: most files cover a bounded rectangle in BOTH dims (a
    # range-boundary file crossing a high-order Morton bit may span one
    # dim — that's inherent to the curve), so min/max stats prune scans
    # filtered on either column for the bulk of the data
    bounded = [e for e in zext if e[0] <= 128 and e[1] <= 128]
    assert len(bounded) >= len(zext) * 0.6, zext


def test_compaction_preserves_data_and_bounds_files(spark):
    import glob
    import tempfile

    from banking_data_etl_pipeline_spark.sources import sinks

    d = tempfile.mkdtemp(prefix="test_compact_")
    p = d + "/t"
    # 64 tiny files
    spark.range(10_000).repartition(64).write.parquet(p)
    assert len(glob.glob(p + "/part-*.parquet")) == 64
    before = {r.id for r in spark.read.parquet(p).collect()}
    n_files = sinks.compact(spark, p, target_rows_per_file=4_000)
    assert n_files == 3
    assert len(glob.glob(p + "/part-*.parquet")) == 3
    assert {r.id for r in spark.read.parquet(p).collect()} == before


def test_compact_recovers_from_crash_window(spark):
    """A crash between compact()'s two renames leaves path missing and
    .old intact; the next call must restore and proceed, and stale
    leftovers must not fail the rerun with ENOTEMPTY."""
    import glob
    import os
    import shutil
    import tempfile

    from banking_data_etl_pipeline_spark.sources import sinks

    d = tempfile.mkdtemp(prefix="test_compact_crash_")
    p = d + "/t"
    spark.range(8_000).repartition(16).write.parquet(p)
    before = {r.id for r in spark.read.parquet(p).collect()}
    # simulate the crash: path renamed away, stale tmp left behind
    os.rename(p, p + ".old")
    os.makedirs(p + ".compact_tmp")
    n_files = sinks.compact(spark, p, target_rows_per_file=4_000)
    assert n_files == 2
    assert {r.id for r in spark.read.parquet(p).collect()} == before
    assert not os.path.exists(p + ".old")
    assert not os.path.exists(p + ".compact_tmp")
    shutil.rmtree(d, ignore_errors=True)


def test_zorder_quantizes_out_of_range_inputs(spark):
    """Columns wider than 2^bits must be bucketed, not bit-truncated:
    with raw truncation rows 0 and 2^bits collide on one Morton key
    and the per-file rectangles blow up. Quantized, a coarse grid of
    huge values still yields bounded rectangles per file."""
    import glob
    import shutil
    import tempfile

    from banking_data_etl_pipeline_spark.sources import sinks

    # 64x64 grid scaled far beyond 2^8: values in [0, 63*2**40]
    grid = spark.range(64 * 64).select(
        ((F.col("id") % 64) * (1 << 40)).alias("x"),
        ((F.col("id") / 64).cast("long") * (1 << 40)).alias("y"),
    )
    d = tempfile.mkdtemp(prefix="test_zorder_q_")
    sinks.write_zordered(grid, d + "/z", "x", "y", files=16, bits=8)
    exts = []
    for f in glob.glob(d + "/z/part-*.parquet"):
        r = spark.read.parquet(f).agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        ).collect()[0]
        exts.append((r.dx >> 40, r.dy >> 40))
    full = 63
    bounded = [e for e in exts if e[0] <= full // 2 and e[1] <= full // 2]
    assert len(bounded) >= len(exts) * 0.6, exts
    shutil.rmtree(d, ignore_errors=True)


def test_zorder_empty_and_allnull_inputs(spark):
    """A no-data day (or an all-NULL cluster column) must still write a
    readable layout instead of crashing on int(None) during
    quantization."""
    import shutil
    import tempfile

    from banking_data_etl_pipeline_spark.sources import sinks

    d = tempfile.mkdtemp(prefix="test_zorder_empty_")
    empty = spark.createDataFrame([], "x long, y long")
    sinks.write_zordered(empty, d + "/e", "x", "y", files=4, bits=8)
    assert spark.read.parquet(d + "/e").count() == 0
    allnull = spark.createDataFrame([(None, None)] * 3, "x long, y long")
    sinks.write_zordered(allnull, d + "/n", "x", "y", files=4, bits=8)
    assert spark.read.parquet(d + "/n").count() == 3
    shutil.rmtree(d, ignore_errors=True)


def test_unigram_xent_prunes_document_scan(spark):
    # the LM scorer must read only (doc_id, text) — never lang/source/
    # n_chars — in every scan branch (token stream, vocab, total)
    from banking_data_etl_pipeline_spark.operators import corpus

    plan = _plan(corpus.unigram_xent(tables.load(spark, SF_DIR, "documents")))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        assert "lang" not in ln and "source" not in ln and "n_chars" not in ln, ln


def test_semdedup_joins_on_cell_and_prunes_label(spark):
    from banking_data_etl_pipeline_spark.operators import dedup

    plan = _plan(dedup.semdedup(tables.load(spark, SF_DIR, "embeddings")))
    # candidate pairs come from an equi-join on the cell id, never a
    # cross product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("label" not in ln for ln in scan_lines), scan_lines


def test_quality_ensemble_keeps_generate_barrier(spark):
    # the signal projection must sit behind a Generate (explode) node;
    # without it Catalyst inlines the repetition folds into every CASE
    # branch of the verdict (measured ~2x wall at sf0.1)
    from banking_data_etl_pipeline_spark.operators import corpus

    plan = _plan(corpus.quality_ensemble(tables.load(spark, SF_DIR, "documents")))
    assert "Generate explode" in plan, plan[:2000]


def test_heavy_hitters_broadcasts_candidates(spark):
    # the exact pass must pre-filter the token stream with a BROADCAST
    # of the O(k x partitions) candidate set — a shuffled join here
    # would move the whole vocabulary, defeating the sketch
    from banking_data_etl_pipeline_spark.operators import sketches

    plan = _plan(sketches.heavy_hitters(tables.load(spark, SF_DIR, "documents")))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_shuffle_shard_is_one_hash_exchange_no_global_sort(spark):
    # per-shard row_number: exactly one hash exchange on shard, and
    # never a rangepartitioning (global sort) or SinglePartition plan
    from banking_data_etl_pipeline_spark.operators import sampling

    plan = _plan(
        sampling.shuffle_shard(tables.load(spark, SF_DIR, "documents"), key="doc_id")
    )
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1 and "hashpartitioning(shard" in exchanges[0], plan


def test_bigram_pmi_totals_are_scalar_subqueries(spark):
    # the N and B corpus totals must enter as uncorrelated scalar
    # subqueries (map-only aggregates), never via a joined/recomputed
    # token stream; and nothing may collapse to a single reducer
    from banking_data_etl_pipeline_spark.operators import corpus

    plan = _plan(corpus.bigram_pmi(tables.load(spark, SF_DIR, "documents")))
    assert "Subquery" in plan, plan
    # the only single-reducer exchanges allowed are the scalar totals'
    # global-aggregate merges: one row per map partition (partial_sum)
    # crosses the wire, never the token stream
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = "\n".join(lines[i + 1 : i + 3])
            assert "partial_sum" in below, plan


def test_negative_samples_joins_on_cdf_cell(spark):
    """The draw→token interval lookup must hash on the quantized CDF
    cell (r11 verdict item 3): a BroadcastHashJoin with the interval
    residual as a filter, never a nested-loop range join over
    draws × vocab."""
    from banking_data_etl_pipeline_spark.operators import sampling

    docs = tables.load(spark, SF_DIR, "documents")
    plan = _plan(sampling.negative_samples(docs))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_heaps_spine_has_no_single_partition_window(spark):
    """heaps_law's cumulative token/type spine must be the two-pass
    partitioned prefix sum (r11 verdict item 2): a bare Window.orderBy
    cumsum would plan `Exchange SinglePartition` over every per-doc
    row — the window must be partitioned by the doc-id range bucket."""
    from banking_data_etl_pipeline_spark.operators import corpus

    docs = tables.load(spark, SF_DIR, "documents")
    spine, n_docs = corpus._heaps_spine(docs)
    assert n_docs == docs.count()
    plan = _plan(spine)
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan, plan
    # the offsets side enters as a broadcast, never a shuffled join
    assert "BroadcastHashJoin" in plan, plan
    # the global rank and cumulative sums must agree with the naive
    # single-partition spine on the fixture (correctness of the
    # offset fold)
    rows = spine.orderBy("d").collect()
    assert [r.rn for r in rows] == list(range(1, n_docs + 1))
    assert all(
        a.cum_tokens < b.cum_tokens and a.cum_types <= b.cum_types
        for a, b in zip(rows, rows[1:])
    )


def test_curriculum_order_has_no_single_partition_window(spark):
    """curriculum_order's two total orders (stage banding + emit
    index) must be the distributed-rank construction (r12 verdict item
    1): a bare ntile/row_number over an unpartitioned window would
    plan `Exchange SinglePartition` over every document row — both
    windows must be partitioned by the range-bucket pid, with the
    offsets entering as literals."""
    from banking_data_etl_pipeline_spark.operators import sampling

    docs = tables.load(spark, SF_DIR, "documents")
    out = sampling.curriculum_order(docs, n_stages=4)
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan, plan
    # correctness of the two-level offset fold: emit_order is the
    # exact permutation 1..N and stages are contiguous emit bands
    rows = out.orderBy("emit_order").collect()
    n = docs.count()
    assert [r.emit_order for r in rows] == list(range(1, n + 1))
    assert [r.stage for r in rows] == sorted(r.stage for r in rows)
    sizes = {}
    for r in rows:
        sizes[r.stage] = sizes.get(r.stage, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_quantile_normalize_cdf_is_bucket_compressed(spark):
    """quantile_normalize's knot search must run on the compressed
    candidate-bucket CDF (r12 verdict item 2): the cumulative window
    is partitioned by the fixed-width value bucket (never
    `Exchange SinglePartition` over the distinct-value histogram) and
    its input is candidate-bucket-sized — at most the ≤ m+1 candidate
    buckets' values enter the window, not the whole reference."""
    from banking_data_etl_pipeline_spark.functions import texttools
    from banking_data_etl_pipeline_spark.operators import profiling

    docs = tables.load(spark, SF_DIR, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        F.round(texttools.quality_score(F.col("text")), 6).alias("q"),
    )
    refname = scored.agg(F.min("source").alias("source"))
    ref = scored.join(F.broadcast(refname), "source")
    hooked = {}
    out = profiling.quantile_normalize(
        scored, "source", "q", "doc_id", ref, m=4,
        n_buckets=8,  # few knots, small width: compression visible on fixture
        plan_hook=lambda name, frame: hooked.update({name: frame}),
    )
    per_v = hooked["knot_cdf"]
    plan = _plan(per_v)
    # the only single-reducer exchange allowed is the ref-source-name
    # global-aggregate merge (one partial_min row per map partition);
    # the cumulative window itself must be partitioned by bucket
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = "\n".join(lines[i + 1 : i + 3])
            assert "partial_min" in below, plan
    assert "windowspecdefinition(b#" in plan, plan
    # candidate buckets enter as a broadcast, never a shuffled join
    assert "BroadcastHashJoin" in plan, plan
    n_ref_distinct = ref.select("q").distinct().count()
    n_window_input = per_v.count()
    assert n_window_input < n_ref_distinct, (
        n_window_input,
        n_ref_distinct,
    )
    # the compressed path must still emit the exact order-statistic
    # knots: spot-check the extremes against a driver-side sort
    vals = sorted(r["q"] for r in ref.select("q").collect())
    norms = {r["val_norm"] for r in out.select("val_norm").collect()}
    assert min(norms) >= vals[0] and max(norms) <= vals[-1]


def test_zorder_stats_rectangles_bounded(spark):
    """Fixed-width curve buckets must (a) partition the rows exactly
    and (b) bound each rectangle: the top 4 key bits are the top 2
    quantized bits of EACH dimension interleaved, so no bucket's side
    may exceed 2^(bits-2) quantized cells."""
    from banking_data_etl_pipeline_spark.sources import sinks, tables

    ev = tables.load(spark, SF_DIR, "events")
    rows = sinks.zorder_layout_stats(
        ev, "user_id", "event_id", bits=8, buckets_log2=4
    ).collect()
    assert sum(r.n_rows for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r.bucket < 16
        assert r.a_max - r.a_min < 2 ** 6, r
        assert r.b_max - r.b_min < 2 ** 6, r
