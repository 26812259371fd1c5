"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <warm total sec>, "unit": "sec",
   "queries": {name: warm sec, ...}, "queries_cold": {...}, ...}

The same line is also written to bench_result.json next to this file:
in r3 the stdout line interleaved with Spark progress output and the
driver's parsed record was lost ("parsed": null), so the file is the
durable copy and stdout the driver-facing one (progress bars are
disabled below so they can't clobber the line again).

Cold/warm methodology (r5): every query runs TWICE back-to-back; the
second (warm) time is the round-over-round comparable — r3 and r4
both burned a judge cycle on "regressions" that were first-run
codegen/JIT noise, so `queries` now carries the warm times and
`queries_cold` the first-run times (the flagship's cold time also
stays headlined as `flagship_cold_sec` since the BASELINE.md anchor
is a cold single run). `value` is the warm-pass total.

Round-over-round deltas confirm themselves (r7): any query whose warm
time regressed >1.4x and >0.3s vs the committed previous
bench_result.json is re-timed in ISOLATION (n=3, min) after the
battery, and the JSON line's `regression_deltas` field carries a
confirmed/noise verdict per query — the manual procedure SCALE.md's
bench notes document from r3-r6, automated. THREE baselines feed the
same gate (r11 verdict item 1): the last run (bench_result.json), the
intra-round anchor (BENCH_ANCHOR.json), and the PREVIOUS ROUND'S
COMMITTED CLOSE (highest-numbered BENCH_r{N}.json — never overwritten
after a round closes), so a drift that lands mid-round and then
becomes its own anchor still gets adjudicated against the last close
(`round_over_round_deltas`).

Each query is forced end-to-end with a noop write (full computation,
no driver-side collect). The flagship `pipeline_enriched` is the
comparable for BASELINE.md's 1M-records-in-252s anchor (~3,970 rec/s
on row-at-a-time Beam); rows/sec for it is reported alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Every implemented family is represented so a regression anywhere is
# visible round-over-round: the reference pipeline (narrow,
# shuffle-free), the parse/error path, all dedup variants, ANN,
# clustering, text, relational (agg/window/rollup/pivot/rank),
# streaming, and multimodal.
BENCH_QUERIES = [
    "pipeline_enriched",
    # round 4b/5 additions
    "heavy_hitters",
    "shuffle_shard",
    "bigram_pmi",
    "bpe_merges",
    "bpe_merges_batched",
    "quantize_emb",
    "jl_project",
    "key_skew",
    "pit_join",
    "ols2",
    "corr_matrix",
    "bpe_tokenize",
    "unigram_xent",
    "xent_buckets",
    "curation_pipeline",
    "stream_quality_gate",
    "stream_minhash_screen",
    "emb_energy_profile",
    "standardize_emb",
    "source_divergence",
    "triangle_count",
    "dsir_weights",
    "semdedup",
    "quality_ensemble",
    "error_records",
    "dedup_exact",
    "dup_spans",
    "minhash_lsh",
    "ngram_jaccard",
    "simhash",
    "emb_near_dup",
    "dedup_resolve",
    "ann_brute",
    "ann_lsh",
    "ann_ivf",
    "kmeans",
    "text_stats",
    "lang_id",
    "fingerprint",
    "bpe_token_stats",
    "corpus_filter",
    "chunk_docs",
    "revenue_by_nation",
    "pricing_summary",
    "brand_revenue",
    "rollup_orders",
    "cube_orders",
    "pivot_daily",
    "multires_rollup",
    "ntile_deciles",
    "price_histogram",
    "percentiles",
    "regr_slope",
    "zscore",
    "asof_join",
    "range_join",
    "moving_avg",
    "trailing_hour",
    "window_agg",
    "sessionize",
    "topk_per_group",
    "salted_totals",
    "stateful_totals",
    "stream_dedup",
    "stream_interval_join",
    "stream_left_interval_join",
    "stream_sessionize",
    "stream_sessionize_append",
    "media_metadata",
    "media_features",
    "media_decode",
    "media_pcm",
    "media_png",
    "unigram_lm_merges",
    "unigram_tokenize",
    "label_prop",
    "perm_test",
    "emb_psi",
    "ate_report",
    "media_text_chunks",
    "graph_diameter",
    "top_supplier",
    "nation_volume",
    "moments_profile",
    "stream_moments",
    "frame_sample",
    "vocab_topn",
    "tfidf_terms",
    "pii_redact",
    "stratified_sample",
    "dataset_mix",
    "pct_rank",
    "grouping_sets",
    "stream_static_join",
    "resample_ffill",
    "funnel",
    "cohort_retention",
    "seq_pack",
    "contamination",
    "scd2_merge",
    "fuzzy_join",
    "unpivot_pricing",
    "intersect_custs",
    "winsorize",
    "mad_outliers",
    "pagerank",
    "salted_join",
    "decay_totals",
    "emb_dim_stats",
    "split_manifest",
    "table_checksum",
    "grouped_checksum",
    "dq_checks",
    "fuzzy_resolve",
    "event_deltas",
    "media_resize",
    "event_transitions",
    "jsonl_quarantine",
    "evolved_union",
    "repetition_filter",
    "profile_orders",
    "chunk_overlap",
    "minhash_incremental",
    # remaining registered queries: cheap singles, included so EVERY
    # query has a round-over-round regression record
    "stream_window_agg",
    "error_split",
    "parse_typed",
    "repeat_customers",
    "distinct_users",
    "lapsed_customers",
    "above_avg_orders",
    "listagg_users",
    "semi_join",
    "anti_join",
    "props_stats",
    "age_group",
    "wealth_segment",
    "contact_day_type",
    "has_loans",
    "engagement_score",
    "rfm_scores",
    "customer_segment",
    "normalize",
    "range_filter",
    "required_filter",
    "lineage",
    # round 8 additions
    "ivf_pq_residual",
    "rank_fusion_ann",
    "weighted_sample",
    "quality_topp",
    "source_jaccard",
    "bottleneck_suppliers",
    "attribution",
    "zipf_fit",
    "stream_attribution",
    "quantile_sketch",
    # round 8b additions
    "order_priority",
    "cust_order_dist",
    "promo_revenue",
    "small_qty_revenue",
    "large_orders",
    "idle_customers",
    "discounted_revenue",
    "skyline_parts",
    "ann_sq",
    "ewma_anomaly",
    "rake_keywords",
    "join_hotspots",
    "media_near_dup",
    "stream_ewma",
    "grouped_hll",
    "market_basket",
    "chi2_independence",
    "cuped_adjust",
    "theta_sketch",
    "dp_counts",
    "maxsim_topk",
    "bucketed_join",
    "textrank_keywords",
    "ann_pq_prebuilt",
    "srm_check",
    "stream_srm",
    "judge_agreement",
    "bootstrap_ci",
    "did_report",
    "orc_roundtrip",
    "winnow_dedup",
    "kn_xent",
    "lift_deciles",
    "column_entropy",
    # round 9 additions
    "ann_graph",
    "ann_graph_prebuilt",
    "ann_ivfpq_prebuilt",
    "score_auc",
    "calibration_bins",
    "kcore",
    "hard_negatives",
    "stream_topk_users",
    "mmr_rerank",
    "ndcg_eval",
    # round 7 additions
    "bm25_topk",
    "pq_topk",
    "ivf_pq_topk",
    "bigram_xent",
    "dedup_recall",
    "l_diversity",
    "split_leakage",
    "stream_psi_drift",
    "feature_hash",
    "knn_classify",
    "dedup_clusters",
    # round 6 additions
    "hll_distinct",
    "bloom_screen",
    "span_removal",
    "snapshot_diff",
    "temperature_mix",
    "stream_bloom_screen",
    "ann_recall",
    "oov_rate",
    "psi_drift",
    "k_anonymity",
    "media_phash",
    "pretrain_export",
    "source_span_overlap",
    "source_semantic_map",
    "text_normalize",
    "shipping_priority",
    "returned_revenue",
    "quality_autocut",
    "dataset_card",
    "ann_ivf_prebuilt",
    "link_prediction",
    "hll_merge",
    "media_validate",
    "stream_funnel",
    "market_share",
    "rank_fusion",
    "ann_filtered",
    "countmin_freq",
    "phrase_search",
    "containment_dedup",
    "substr_dedup",
    "t_closeness",
    "hits",
    "dup_profile",
    "kcenter_coreset",
    "msprt_monitor",
    "woe_iv",
    "substr_incremental",
    "emb_top_pc",
    "stream_msprt",
    "mrr_eval",
    "curriculum_order",
    "bt_strengths",
    "rm3_expansion",
    "cdc_chunks",
    "zorder_stats",
    # round 11 additions
    "hits_prebuilt",
    "stream_recovery",
    "cms_ngrams",
    "cms_ngrams_exact",
    "rbo_overlap",
    "spearman_quality",
    "benford_audit",
    "quantile_normalize",
    "stream_cms_ngrams",
    "cms_incremental",
    "mase_eval",
    "matryoshka_recall",
    # round 11b additions
    "mann_kendall",
    "cusum_changepoint",
    "survival_km",
    "gini_concentration",
    "itemitem_cf",
    "good_turing",
    "lexical_diversity",
    "heaps_law",
    "acf_lags",
    "seasonality_strength",
    "hill_tail",
    "df_burstiness",
    "tfidf_allpairs",
    "theil_sen",
    "brier_eval",
    "judge_alpha",
    "stream_p95",
    "readability",
    "stream_hll",
    "leadlag_ccf",
    "negative_samples",
    "position_attribution",
    "pareto_cut",
    "ks_drift",
    "mannwhitney_u",
    "kendall_tau",
    "bfs_depths",
    "bigram_llr",
    "holt_linear",
    "assortativity",
    "strat_ate",
    "langid_confusion",
    "vocab_coverage",
    "clustering_coeff",
    "partition_prune",
    "stream_langid_mix",
    "ppr",
    "map_eval",
    "cheapest_supplier",
    "event_trigrams",
    "transition_entropy",
    "lorenz_deciles",
    "cvm_drift",
    "kmeans_purity",
    "lateness_audit",
    "overdispersion",
    # round 12 additions
    "stream_recovery_msprt",
    "tfidf_recall",
    # round 14 additions
    "ann_ivf_incremental",
    "ivf_cell_growth",
    "chunk_dedup",
    "ann_hnsw",
    "ann_ivfpq_incremental",
    "shard_plan",
    "media_jpeg",
    # round 15 additions
    "ann_graph_incremental",
    "graph_index_growth",
    "ann_delete_mask",
    "ivf_live_fraction",
    "ann_churn_recall",
    "media_jpeg_color",
    "pretrain_manifest",
    "ann_hnsw_incremental",
    "graph_compact",
    "ivf_compact",
]


def _cold_oneshot() -> None:
    """Child-process mode: ONE fresh-JVM cold run of the flagship.

    r10 verdict: the committed single-sample cold number carried ±40%
    spread (31.0k rows/s at close vs 50.2k an hour earlier) while warm
    was rock-stable — so the BASELINE.md cold anchor is now the MIN of
    three fresh-JVM samples, each its own process (true cold: no shared
    codegen cache, no warmed shuffle service). The child writes its
    sample to $SPARK_GRAFT_COLD_OUT (stdout interleaves with Spark log
    noise — the r3 lesson)."""
    import __spark_entry__ as entry
    from banking_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench-cold")
    qs = entry.queries()
    t0 = time.time()
    qs["pipeline_enriched"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = round(time.time() - t0, 3)
    with open(os.environ["SPARK_GRAFT_COLD_OUT"], "w", encoding="utf-8") as f:
        json.dump({"flagship_cold_sec": dt}, f)
    spark.stop()


def _cold_n3min() -> float | None:
    """Run the fresh-JVM cold one-shot three times sequentially and
    return the min (None if any child fails — never sink the battery
    over the anchor sample)."""
    import subprocess
    import tempfile

    samples = []
    for _ in range(3):
        fd, out = tempfile.mkstemp(suffix=".json")
        os.close(fd)
        env = dict(os.environ)
        env["SPARK_GRAFT_COLD_ONESHOT"] = "1"
        env["SPARK_GRAFT_COLD_OUT"] = out
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                timeout=600,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            if r.returncode != 0:
                return None
            with open(out, encoding="utf-8") as f:
                samples.append(json.load(f)["flagship_cold_sec"])
        except (OSError, ValueError, subprocess.TimeoutExpired):
            return None
        finally:
            try:
                os.unlink(out)
            except OSError:
                pass
    return min(samples)


def main() -> None:
    import __spark_entry__ as entry
    from banking_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry.queries()

    # Previous run's warm times (bench_result.json is committed per
    # round, so at driver time this is last round's battery) — any
    # query that regressed >1.4x AND >0.3s absolute gets an ISOLATED
    # n=3 re-timing after the battery, and the JSON line carries a
    # confirmed/noise verdict per delta. This automates the manual
    # procedure r3-r6 each rediscovered: in-battery warm numbers carry
    # cross-query JVM/GC noise, and a phantom "regression" otherwise
    # costs a judge cycle.
    def _load_warm_map(path: str) -> dict[str, float]:
        try:
            with open(path, encoding="utf-8") as f:
                doc = json.load(f)
            # driver-committed BENCH_r{N}.json wraps the metric line
            # in a "parsed" key; bench_result.json / BENCH_ANCHOR.json
            # are the bare line
            if isinstance(doc.get("parsed"), dict):
                doc = doc["parsed"]
            if doc.get("sf") == float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]):
                return doc.get("queries", {}) or {}
        except (OSError, ValueError):
            pass
        return {}

    here = os.path.dirname(os.path.abspath(__file__))
    prev = _load_warm_map(os.path.join(here, "bench_result.json"))
    # ROUND-OVER-ROUND anchor (r9 verdict): bench_result.json is
    # overwritten by every run, so a regression that lands mid-round
    # becomes its own baseline by round close — ivf_pq_residual's +56%
    # was invisible to the run-over-run diff. BENCH_ANCHOR.json is the
    # PREVIOUS round-close snapshot (committed once per round, never
    # touched by ordinary runs), so the same gate against it catches
    # anything that drifted since the last round closed.
    anchor = _load_warm_map(os.path.join(here, "BENCH_ANCHOR.json"))
    # CROSS-ROUND axis (r11 verdict item 1): BENCH_ANCHOR advances with
    # every intra-round battery, so a drift that lands between round
    # closes is never adjudicated against the PREVIOUS ROUND's close
    # (stream_msprt 1.50->2.40s and phrase_search 1.15->1.64s crossed
    # r10->r11 unchecked). BENCH_CLOSE_r{N}.json is a copy of the
    # FINAL bench_result.json of round N, committed once at that
    # round's close and never touched again (the driver's own
    # BENCH_r{N}.json can carry parsed:null when stdout truncates, so
    # the repo keeps its own authoritative close snapshots). The
    # highest-numbered one is the previous-round baseline.
    import glob
    import re

    round_files = sorted(
        glob.glob(os.path.join(here, "BENCH_CLOSE_r*.json")),
        key=lambda p: int(
            re.search(r"BENCH_CLOSE_r(\d+)\.json$", p).group(1)
        ),
    )
    prev_round_file = round_files[-1] if round_files else ""
    prev_round = _load_warm_map(prev_round_file) if prev_round_file else {}

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not first-call JIT (the driver anchor is steady-state too).
    qs["range_filter"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    # host-contention context (r13 verdict item 3): the r13 driver
    # battery "confirmed" two regressions that were pure VM contention
    # (load ~6 ran everything ~1.5x slow) — record the 1m/5m/15m load
    # average at battery start/end and at every isolated re-time so
    # adjudication is data, not narrative
    load_start = [round(x, 2) for x in os.getloadavg()]
    t_all = time.time()
    for name in BENCH_QUERIES:
        for times in (cold, warm):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
            # blocks persisted inside operators (postings, signatures,
            # CC labels) must not accumulate across — or subsidize —
            # runs/queries; the GC nudge keeps heap pressure from one
            # query's freed blocks from taxing the next query's timing
            spark.catalog.clearCache()
            spark._jvm.System.gc()
    battery = round(time.time() - t_all, 3)
    load_end = [round(x, 2) for x in os.getloadavg()]
    total = round(sum(warm.values()), 3)

    def _is_regression(now: float, before: float) -> bool:
        # Sub-second queries flap across the 1.4x ratio between battery
        # samples (r10 close: 17 flags, 7 manual cap overflows, all
        # noise) — for them a >1s absolute jump, OR a >3x ratio that
        # lands above 0.5s, is worth a re-timing (r11 advice: the
        # absolute-only rule let a 0.1->1.0s 10x creep compound
        # unflagged round over round); ratio+0.3s still guards
        # everything >= 1s.
        if before < 1.0:
            return (now - before > 1.0) or (
                now > 3.0 * before and now > 0.5
            )
        return now > 1.4 * before and now - before > 0.3

    flagged_prev = [
        n for n in BENCH_QUERIES
        if n in prev and _is_regression(warm[n], prev[n])
    ]
    flagged_anchor = [
        n for n in BENCH_QUERIES
        if n in anchor and _is_regression(warm[n], anchor[n])
    ]
    flagged_round = [
        n for n in BENCH_QUERIES
        if n in prev_round and _is_regression(warm[n], prev_round[n])
    ]
    # NEAR-THRESHOLD bucket (r14 verdict item 6): market_share drifted
    # 1.49x round-over-round but sat under the absolute-delta cutoffs,
    # so it was never re-timed and the drift went unadjudicated. Any
    # query whose round-over-round warm ratio is >= 1.4x now joins the
    # re-time queue even when the flag rules pass on it, and gets its
    # own loadavg-stamped verdict (ratio-based: drift vs noise) — so
    # BENCH_r{N} carries a verdict for EVERY >= 1.4x r-o-r mover, not
    # just the ones big enough to flag.
    near_threshold = [
        n for n in BENCH_QUERIES
        if n in prev_round
        and prev_round[n] > 0
        and warm[n] >= 1.4 * prev_round[n]
        and n not in flagged_round
    ]
    # re-time EVERY flagged query (r13 verdict item 3: the 24-entry
    # cap left 26 anchor deltas "unconfirmed (capped)" exactly when
    # the battery was noisiest — the cap is gone; the sub-second
    # pre-filter already bounds the flag set to real candidates).
    # Ordering stays largest-delta-first so a manual abort still
    # covers the worst offenders.
    to_retime = sorted(
        set(flagged_prev)
        | set(flagged_anchor)
        | set(flagged_round)
        | set(near_threshold),
        key=lambda n: -max(
            warm[n] - prev.get(n, warm[n]),
            warm[n] - anchor.get(n, warm[n]),
            warm[n] - prev_round.get(n, warm[n]),
        ),
    )
    retimed: dict[str, float] = {}
    retime_load: dict[str, list[float]] = {}
    for name in to_retime:
        times = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        retimed[name] = round(min(times), 3)
        retime_load[name] = [round(x, 2) for x in os.getloadavg()]

    def _delta_section(flagged: list[str], base: dict[str, float], key: str):
        out: dict[str, dict] = {}
        for name in flagged:
            d = {key: base[name], "battery_warm": warm[name]}
            if name in retimed:
                d["isolated_n3_min"] = retimed[name]
                d["load_at_retime"] = retime_load[name]
                d["verdict"] = (
                    "confirmed"
                    if _is_regression(retimed[name], base[name])
                    else "noise"
                )
            else:  # unreachable since r14 (cap removed); kept defensive
                d["verdict"] = "unconfirmed (not re-timed)"
            out[name] = d
        return out

    deltas = _delta_section(flagged_prev, prev, "prev_warm")
    anchor_deltas = _delta_section(flagged_anchor, anchor, "anchor_warm")
    round_deltas = _delta_section(
        flagged_round, prev_round, "prev_round_close_warm"
    )
    # near-threshold verdicts are RATIO-based (the bucket exists for
    # drifts too small for the absolute flag rules): isolated-n3 min
    # still >= 1.4x the last close -> "confirmed-drift", else noise
    near_deltas: dict[str, dict] = {}
    for name in near_threshold:
        d = {
            "prev_round_close_warm": prev_round[name],
            "battery_warm": warm[name],
            "ratio": round(warm[name] / prev_round[name], 2),
        }
        if name in retimed:
            d["isolated_n3_min"] = retimed[name]
            d["load_at_retime"] = retime_load[name]
            d["verdict"] = (
                "confirmed-drift"
                if retimed[name] >= 1.4 * prev_round[name]
                else "noise"
            )
        else:
            d["verdict"] = "unconfirmed (not re-timed)"
        near_deltas[name] = d

    # rows/sec for the flagship against the 1M/252s baseline anchor
    # (cold, like the anchor's single fresh run) PLUS the warm
    # steady-state anchor (r8 verdict): the 2x-of-baseline contract is
    # really about steady-state throughput, and the cold number on a
    # ~3 s query is dominated by ±0.5 s codegen noise — report both,
    # keep BASELINE.md honest about the reference's single-fresh-run
    # methodology
    flag_rows = qs["pipeline_enriched"](spark, SF_DIR).count()
    flag_rps = round(flag_rows / cold["pipeline_enriched"], 1)
    flag_rps_warm = round(flag_rows / warm["pipeline_enriched"], 1)

    # The BASELINE.md cold anchor: min of three FRESH-JVM single runs
    # (r10 verdict item 2 — the in-battery single cold sample carried
    # ±40% spread; three independent processes bound the jitter while
    # staying honest about the reference's fresh-run methodology).
    cold_n3 = _cold_n3min()
    cold_n3_rps = round(flag_rows / cold_n3, 1) if cold_n3 else None

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps(
        {
            "metric": "headline_queries_total_warm_wall",
            "value": total,
            "unit": "sec",
            "queries": warm,
            "queries_cold": cold,
            "battery_wall": battery,
            "sf": float(sf),
            "flagship_rows": flag_rows,
            "flagship_cold_sec": cold["pipeline_enriched"],
            "flagship_cold_sec_n3min": cold_n3,
            "flagship_cold_n3min_rows_per_sec": cold_n3_rps,
            "flagship_rows_per_sec": flag_rps,
            "flagship_warm_sec": warm["pipeline_enriched"],
            "flagship_warm_rows_per_sec": flag_rps_warm,
            "loadavg_battery_start": load_start,
            "loadavg_battery_end": load_end,
            "regression_deltas": deltas,
            "round_anchor_deltas": anchor_deltas,
            "round_over_round_deltas": round_deltas,
            "near_threshold_deltas": near_deltas,
            "round_over_round_baseline": os.path.basename(prev_round_file),
        }
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json"),
        "w",
        encoding="utf-8",
    ) as f:
        f.write(line + "\n")
    # The driver's stdout capture keeps only a ~2000-char tail (r12
    # verdict item 6: BENCH_r12.json carried parsed:null because the
    # full per-query line outgrew it) — print a COMPACT summary line
    # that always fits; the authoritative per-query map and the
    # regression adjudication bodies live in bench_result.json (copied
    # to BENCH_CLOSE_r{N}.json at each round close).
    def _confirmed(sections) -> list[str]:
        return sorted(
            {
                n
                for sec in sections
                for n, d in sec.items()
                if d.get("verdict") == "confirmed"
            }
        )

    slowest = dict(
        sorted(warm.items(), key=lambda kv: -kv[1])[:8]
    )
    compact = json.dumps(
        {
            "metric": "headline_queries_total_warm_wall",
            "value": total,
            "unit": "sec",
            "sf": float(sf),
            "n_queries": len(BENCH_QUERIES),
            "battery_wall": battery,
            "flagship_rows": flag_rows,
            "flagship_cold_sec": cold["pipeline_enriched"],
            "flagship_cold_sec_n3min": cold_n3,
            "flagship_cold_n3min_rows_per_sec": cold_n3_rps,
            "flagship_warm_sec": warm["pipeline_enriched"],
            "flagship_warm_rows_per_sec": flag_rps_warm,
            "loadavg": {"start": load_start, "end": load_end},
            "regressions_confirmed": _confirmed(
                [deltas, anchor_deltas, round_deltas]
            ),
            "n_flagged": {
                "vs_prev_run": len(deltas),
                "vs_anchor": len(anchor_deltas),
                "vs_prev_round_close": len(round_deltas),
                "near_threshold": len(near_deltas),
            },
            "near_threshold_drift_confirmed": sorted(
                n
                for n, d in near_deltas.items()
                if d.get("verdict") == "confirmed-drift"
            ),
            # the 8 slowest warm queries — dict-shaped per the driver
            # contract; the FULL 300+-entry map is in bench_result.json
            "queries": slowest,
            "queries_full": "bench_result.json",
        }
    )
    # drain any buffered Spark/log noise before the one stdout line
    sys.stderr.flush()
    sys.stdout.flush()
    print(compact, flush=True)


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_COLD_ONESHOT"):
        _cold_oneshot()
    else:
        main()
