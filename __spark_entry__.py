"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
registers one Spark builder per implemented operator (SURVEY.md §2 +
the LLM-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
twin for each (see ``banking_data_etl_pipeline_spark/oracle.py`` for
the cross-engine float/hash parity rules).

``stream_window_agg`` intentionally shares WINDOW_AGG_Q with the batch
query: the availableNow streaming run must produce the identical
result, which is a stronger check than rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from banking_data_etl_pipeline_spark import oracle, queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.pipeline_enriched(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness harness checks the first
    # 50 entries only.
    #
    # ROTATION POLICY (r5+, mechanical — no per-round judgment):
    #   1. flagship first, always;
    #   2. queries whose code (operator, builder, or oracle twin)
    #      changed this round, or that are new — they MUST re-prove on
    #      current code;
    #   3. the remaining window slots fill stalest-first by the round
    #      of each query's most recent green CORRECTNESS row (this
    #      round: 11 new + 13 changed + 25 r02-stale slots — all nine
    #      r02 stragglers enter; the remaining r02 singles are covered
    #      by the committed PARITY_r07.json local proof);
    #   4. bank-core singles sort last within a staleness tier — the
    #      flagship pipeline_enriched composes all of them, so they are
    #      additionally re-proven every round through tier 1.
    return {
        # --- tier 1: flagship (green every round)
        "pipeline_enriched": Q.pipeline_enriched,
        # --- tier 2: new in round 7
        "bm25_topk": Q.bm25_topk,  # new operator
        "pq_topk": Q.pq_topk,  # new operator
        "ivf_pq_topk": Q.ivf_pq_topk,  # new operator
        "bigram_xent": Q.bigram_xent,  # new operator
        "dedup_recall": Q.dedup_recall,  # new operator
        "l_diversity": Q.l_diversity,  # new operator
        "split_leakage": Q.split_leakage,  # new operator
        "stream_psi_drift": Q.stream_psi_drift,  # new operator
        "feature_hash": Q.feature_hash,  # new operator
        "knn_classify": Q.knn_classify,  # new operator
        "dedup_clusters": Q.dedup_clusters,  # new operator
        # --- tier 2: code, builder, or oracle changed in round 7 —
        # must re-prove on current code (posting-list k-means update;
        # derived semdedup cells; salted pair joins; CC/pagerank/bpe
        # plan hooks; IVF static partition pruning + cache fingerprint;
        # psi_drift guards)
        "semdedup": Q.semdedup,
        "kmeans": Q.kmeans,
        "ann_ivf": Q.ann_ivf,
        "ann_recall": Q.ann_recall,
        "ann_ivf_prebuilt": Q.ann_ivf_prebuilt,
        "psi_drift": Q.psi_drift,
        "minhash_lsh": Q.minhash_lsh,
        "ngram_jaccard": Q.ngram_jaccard,
        "dedup_resolve": Q.dedup_resolve,
        "fuzzy_resolve": Q.fuzzy_resolve,
        "pagerank": Q.pagerank,
        "triangle_count": Q.triangle_count,
        "bpe_merges": Q.bpe_merges,
        # --- tier 3: stalest-first (last driver-green r02) — all nine
        # r02 stragglers plus the stalest singles; everything past the
        # boundary is locally proven in PARITY_r07.json and the bank
        # singles are re-proven through the flagship (policy rule 4)
        "simhash": Q.simhash,
        "emb_near_dup": Q.emb_near_dup,
        "ann_brute": Q.ann_brute,
        "ann_lsh": Q.ann_lsh,
        "text_stats": Q.text_stats,
        "lang_id": Q.lang_id,
        "fingerprint": Q.fingerprint,
        "corpus_filter": Q.corpus_filter,
        "chunk_docs": Q.chunk_docs,
        "error_records": Q.error_records,
        "error_split": Q.error_split,
        "parse_typed": Q.parse_typed,
        "bpe_token_stats": Q.bpe_token_stats,
        "revenue_by_nation": Q.revenue_by_nation,
        "pricing_summary": Q.pricing_summary,
        "brand_revenue": Q.brand_revenue,
        "rollup_orders": Q.rollup_orders,
        "moving_avg": Q.moving_avg,
        "trailing_hour": Q.trailing_hour,
        "repeat_customers": Q.repeat_customers,
        "distinct_users": Q.distinct_users,
        "lapsed_customers": Q.lapsed_customers,
        "above_avg_orders": Q.above_avg_orders,
        "listagg_users": Q.listagg_users,
        "cube_orders": Q.cube_orders,
        # ---- driver checks the first 50 entries; the window boundary
        # ---- falls HERE (cube_orders is slot 50). Tail order = next
        # ---- rounds' rotation queue (stalest first); everything below
        # ---- is locally proven in PARITY_r07.json regardless.
        "semi_join": Q.semi_join_big_spenders,
        "anti_join": Q.anti_join_no_orders,
        "percentiles": Q.price_percentiles,
        "asof_join": Q.asof_join,
        "range_join": Q.range_join,
        "props_stats": Q.props_stats,
        "multires_rollup": Q.multires_rollup,
        "pivot_daily": Q.pivot_daily,
        "age_group": Q.age_group,
        "wealth_segment": Q.wealth_segment,
        "contact_day_type": Q.contact_day_type,
        "has_loans": Q.has_loans,
        # r02-green
        "engagement_score": Q.engagement_score,
        "rfm_scores": Q.rfm_scores,
        "customer_segment": Q.customer_segment,
        "normalize": Q.normalize,
        "range_filter": Q.range_filter,
        "required_filter": Q.required_filter,
        "lineage": Q.lineage,
        # r03-green
        "stratified_sample": Q.stratified_sample,
        "dataset_mix": Q.dataset_mix,
        "pct_rank": Q.pct_rank,
        "grouping_sets": Q.grouping_sets_orders,
        "stream_static_join": Q.stream_static_join,
        "resample_ffill": Q.resample_ffill,
        "funnel": Q.funnel,
        "cohort_retention": Q.cohort_retention,
        "seq_pack": Q.seq_pack,
        "contamination": Q.contamination,
        "scd2_merge": Q.scd2_merge,
        "fuzzy_join": Q.fuzzy_join,
        "unpivot_pricing": Q.unpivot_pricing,
        "intersect_custs": Q.intersect_custs,
        "winsorize": Q.winsorize,
        "mad_outliers": Q.mad_outliers,
        "emb_dim_stats": Q.emb_dim_stats,
        "salted_join": Q.salted_join,
        "decay_totals": Q.decay_totals,
        "split_manifest": Q.split_manifest,
        "dq_checks": Q.dq_checks,
        "event_deltas": Q.event_deltas,
        "event_transitions": Q.event_transitions,
        "table_checksum": Q.table_checksum,
        "grouped_checksum": Q.grouped_checksum,
        # r04-green
        "bigram_pmi": Q.bigram_pmi,
        "quantize_emb": Q.quantize_emb,
        "jl_project": Q.jl_project,
        "key_skew": Q.key_skew,
        "bpe_tokenize": Q.bpe_tokenize,
        "unigram_xent": Q.unigram_xent,
        "dsir_weights": Q.dsir_weights,
        "quality_ensemble": Q.quality_ensemble,
        "jsonl_quarantine": Q.jsonl_quarantine,
        "evolved_union": Q.evolved_union,
        "repetition_filter": Q.repetition_filter,
        "profile_orders": Q.profile_orders,
        "chunk_overlap": Q.chunk_overlap,
        "minhash_incremental": Q.minhash_incremental,
        "ntile_deciles": Q.ntile_deciles,
        "price_histogram": Q.price_histogram,
        "regr_slope": Q.regr_slope,
        "zscore": Q.zscore,
        "window_agg": Q.window_agg,
        "stream_window_agg": Q.stream_window_agg,
        "stream_dedup": Q.stream_dedup,
        "stream_interval_join": Q.stream_interval_join,
        "stream_left_interval_join": Q.stream_left_interval_join,
        "stream_sessionize": Q.stream_sessionize,
        "stateful_totals": Q.stateful_totals,
        "salted_totals": Q.salted_totals,
        "sessionize": Q.sessionize,
        "topk_per_group": Q.topk_per_group,
        "stream_sessionize_append": Q.stream_sessionize_append,
        "vocab_topn": Q.vocab_topn,
        "tfidf_terms": Q.tfidf_terms,
        "pii_redact": Q.pii_redact,
        # r06-green
        "hll_distinct": Q.hll_distinct,
        "bloom_screen": Q.bloom_screen,
        "span_removal": Q.span_removal,
        "snapshot_diff": Q.snapshot_diff,
        "temperature_mix": Q.temperature_mix,
        "stream_bloom_screen": Q.stream_bloom_screen,
        "oov_rate": Q.oov_rate,
        "k_anonymity": Q.k_anonymity,
        "media_phash": Q.media_phash,
        "pretrain_export": Q.pretrain_export,
        "source_span_overlap": Q.source_span_overlap,
        "source_semantic_map": Q.source_semantic_map,
        "text_normalize": Q.text_normalize,
        "shipping_priority": Q.shipping_priority,
        "returned_revenue": Q.returned_revenue,
        "quality_autocut": Q.quality_autocut,
        "dataset_card": Q.dataset_card,
        "link_prediction": Q.link_prediction,
        "hll_merge": Q.hll_merge,
        "media_validate": Q.media_validate,
        "stream_funnel": Q.stream_funnel,
        "market_share": Q.market_share,
        "rank_fusion": Q.rank_fusion,
        "ann_filtered": Q.ann_filtered,
        "countmin_freq": Q.countmin_freq,
        "phrase_search": Q.phrase_search,
        "containment_dedup": Q.containment_dedup,
        "zorder_stats": Q.zorder_stats,
        "dup_spans": Q.dup_spans,
        "xent_buckets": Q.xent_buckets,
        "curation_pipeline": Q.curation_pipeline,
        "stream_quality_gate": Q.stream_quality_gate,
        "stream_minhash_screen": Q.stream_minhash_screen,
        "emb_energy_profile": Q.emb_energy_profile,
        "standardize_emb": Q.standardize_emb,
        "source_divergence": Q.source_divergence,
        "bpe_merges_batched": Q.bpe_merges_batched,
        "heavy_hitters": Q.heavy_hitters,
        "shuffle_shard": Q.shuffle_shard,
        "ols2": Q.ols2,
        "corr_matrix": Q.corr_matrix,
        "pit_join": Q.pit_join,
        "media_metadata": Q.media_metadata,
        "media_features": Q.media_features,
        "media_resize": Q.media_resize,
        "frame_sample": Q.frame_sample,
        "dedup_exact": Q.dedup_exact,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pipeline_enriched": oracle.PIPELINE_ENRICHED,
        "bm25_topk": oracle.bm25_topk_sql(),
        "pq_topk": oracle.pq_topk_sql(),
        "ivf_pq_topk": oracle.ivf_pq_topk_sql(),
        "bigram_xent": oracle.BIGRAM_XENT_Q,
        "dedup_recall": oracle.DEDUP_RECALL_Q,
        "l_diversity": oracle.L_DIVERSITY_Q,
        "split_leakage": oracle.split_leakage_sql(),
        # batch-equivalence: the streamed bin accumulation must equal
        # the batch PSI over the same bounded events
        "stream_psi_drift": oracle.STREAM_PSI_DRIFT_Q,
        "feature_hash": oracle.FEATURE_HASH_Q,
        "knn_classify": oracle.KNN_CLASSIFY_Q,
        "dedup_clusters": oracle.dedup_cluster_stats_sql(),
        "heavy_hitters": oracle.HEAVY_HITTERS_Q,
        "shuffle_shard": oracle.SHUFFLE_SHARD_Q,
        "bigram_pmi": oracle.BIGRAM_PMI_Q,
        "bpe_merges": oracle.bpe_merges_sql(),
        "bpe_merges_batched": oracle.bpe_merges_batched_sql(),
        "dup_spans": oracle.DUP_SPANS_Q,
        "xent_buckets": oracle.XENT_BUCKETS_Q,
        "curation_pipeline": oracle.curation_pipeline_sql(),
        "stream_quality_gate": oracle.STREAM_QUALITY_GATE_Q,
        "stream_minhash_screen": oracle.minhash_incremental_sql(),
        "emb_energy_profile": oracle.energy_profile_sql(),
        "standardize_emb": oracle.STANDARDIZE_EMB_Q,
        "source_divergence": oracle.SOURCE_DIVERGENCE_Q,
        "quantize_emb": oracle.QUANTIZE_EMB_Q,
        "jl_project": oracle.jl_project_sql(),
        "key_skew": oracle.KEY_SKEW_Q,
        "pit_join": oracle.PIT_JOIN_Q,
        "ols2": oracle.ols2_sql(),
        "corr_matrix": oracle.corr_matrix_sql(),
        "bpe_tokenize": oracle.bpe_tokenize_sql(),
        "hll_distinct": oracle.HLL_DISTINCT_Q,
        "bloom_screen": oracle.BLOOM_SCREEN_Q,
        "span_removal": oracle.SPAN_REMOVAL_Q,
        "snapshot_diff": oracle.SNAPSHOT_DIFF_Q,
        "temperature_mix": oracle.TEMPERATURE_MIX_Q,
        "stream_bloom_screen": oracle.STREAM_BLOOM_SCREEN_Q,
        "ann_recall": oracle.ann_recall_sql(),
        "oov_rate": oracle.OOV_RATE_Q,
        "psi_drift": oracle.PSI_DRIFT_Q,
        "k_anonymity": oracle.K_ANONYMITY_Q,
        "media_phash": oracle.MEDIA_PHASH_Q,
        "pretrain_export": oracle.pretrain_export_sql(),
        "source_span_overlap": oracle.SOURCE_SPAN_OVERLAP_Q,
        "source_semantic_map": oracle.SOURCE_SEMANTIC_MAP_Q,
        "text_normalize": oracle.TEXT_NORMALIZE_Q,
        "shipping_priority": oracle.SHIPPING_PRIORITY_Q,
        "returned_revenue": oracle.RETURNED_REVENUE_Q,
        "quality_autocut": oracle.QUALITY_AUTOCUT_Q,
        "dataset_card": oracle.DATASET_CARD_Q,
        # identical semantics and parameters to ann_ivf — the split
        # lifecycle must reproduce the telescoped plan's answer
        "ann_ivf_prebuilt": oracle.ann_ivf_sql(),
        "link_prediction": oracle.LINK_PREDICTION_Q,
        "hll_merge": oracle.HLL_MERGE_Q,
        "media_validate": oracle.MEDIA_VALIDATE_Q,
        # batch-equivalence: the stateful streaming funnel must equal
        # the batch funnel over the same bounded events
        "stream_funnel": oracle.FUNNEL_Q,
        "market_share": oracle.MARKET_SHARE_Q,
        "rank_fusion": oracle.hybrid_rank_fusion_sql(),
        "ann_filtered": oracle.ANN_FILTERED_Q,
        "countmin_freq": oracle.countmin_freq_sql(),
        "phrase_search": oracle.phrase_search_sql(),
        "containment_dedup": oracle.containment_pairs_sql(),
        "zorder_stats": oracle.zorder_stats_sql(),
        "unigram_xent": oracle.UNIGRAM_XENT_Q,
        "triangle_count": oracle.TRIANGLE_COUNT_Q,
        "dsir_weights": oracle.DSIR_WEIGHTS_Q,
        "semdedup": oracle.semdedup_sql(),
        "quality_ensemble": oracle.QUALITY_ENSEMBLE_Q,
        "age_group": oracle.AGE_GROUP_Q,
        "wealth_segment": oracle.WEALTH_Q,
        "contact_day_type": oracle.DAY_TYPE_Q,
        "has_loans": oracle.HAS_LOANS_Q,
        "engagement_score": oracle.ENGAGEMENT_Q,
        "rfm_scores": oracle.RFM_Q,
        "customer_segment": oracle.SEGMENT_Q,
        "normalize": oracle.NORMALIZE_Q,
        "range_filter": oracle.RANGE_FILTER_Q,
        "required_filter": oracle.REQUIRED_FILTER_Q,
        "lineage": oracle.LINEAGE_Q,
        "parse_typed": oracle.PARSE_TYPED_Q,
        "error_split": oracle.ERROR_SPLIT_Q,
        "error_records": oracle.ERROR_RECORDS_Q,
        "dedup_resolve": oracle.dedup_resolve_sql(),
        "vocab_topn": oracle.VOCAB_TOPN_Q,
        "tfidf_terms": oracle.TFIDF_TERMS_Q,
        "pii_redact": oracle.pii_redact_sql(),
        "stratified_sample": oracle.stratified_sample_sql(),
        "dataset_mix": oracle.dataset_mix_sql(),
        "pct_rank": oracle.PCT_RANK_Q,
        "grouping_sets": oracle.GROUPING_SETS_Q,
        "stream_static_join": oracle.STREAM_STATIC_JOIN_Q,
        "resample_ffill": oracle.RESAMPLE_FFILL_Q,
        "funnel": oracle.FUNNEL_Q,
        "cohort_retention": oracle.COHORT_RETENTION_Q,
        "seq_pack": oracle.SEQ_PACK_Q,
        "contamination": oracle.CONTAMINATION_Q,
        "scd2_merge": oracle.SCD2_MERGE_Q,
        "fuzzy_join": oracle.FUZZY_JOIN_Q,
        "unpivot_pricing": oracle.UNPIVOT_PRICING_Q,
        "intersect_custs": oracle.INTERSECT_CUSTS_Q,
        "winsorize": oracle.WINSORIZE_Q,
        "mad_outliers": oracle.MAD_OUTLIERS_Q,
        "pagerank": oracle.pagerank_sql(),
        "salted_join": oracle.SALTED_JOIN_Q,
        "decay_totals": oracle.DECAY_TOTALS_Q,
        "kmeans": oracle.kmeans_sql(),
        "emb_dim_stats": oracle.EMB_DIM_STATS_Q,
        "split_manifest": oracle.split_manifest_sql(),
        "table_checksum": oracle.TABLE_CHECKSUM_Q,
        "grouped_checksum": oracle.GROUPED_CHECKSUM_Q,
        "dq_checks": oracle.DQ_CHECKS_Q,
        "fuzzy_resolve": oracle.fuzzy_resolve_sql(),
        "event_deltas": oracle.EVENT_DELTAS_Q,
        "media_resize": oracle.media_resize_sql(),
        "event_transitions": oracle.EVENT_TRANSITIONS_Q,
        "jsonl_quarantine": oracle.JSONL_QUARANTINE_Q,
        "evolved_union": oracle.EVOLVED_UNION_Q,
        "repetition_filter": oracle.REPETITION_Q,
        "profile_orders": oracle.PROFILE_ORDERS_Q,
        "chunk_overlap": oracle.CHUNK_OVERLAP_Q,
        "minhash_incremental": oracle.minhash_incremental_sql(),
        "dedup_exact": oracle.DEDUP_EXACT_Q,
        "ngram_jaccard": oracle.NGRAM_JACCARD_Q,
        "minhash_lsh": oracle.minhash_lsh_sql(),
        "simhash": oracle.simhash_sql(),
        "emb_near_dup": oracle.EMB_NEAR_DUP_Q,
        "ann_brute": oracle.ANN_BRUTE_Q,
        "ann_lsh": oracle.ann_lsh_sql(),
        "ann_ivf": oracle.ann_ivf_sql(),
        "text_stats": oracle.TEXT_STATS_Q,
        "lang_id": oracle.langid_sql(),
        "fingerprint": oracle.FINGERPRINT_Q,
        "bpe_token_stats": oracle.BPE_TOKEN_STATS_Q,
        "corpus_filter": oracle.corpus_filter_sql(),
        "chunk_docs": oracle.CHUNK_DOCS_Q,
        "revenue_by_nation": oracle.REVENUE_BY_NATION_Q,
        "pricing_summary": oracle.PRICING_SUMMARY_Q,
        "brand_revenue": oracle.BRAND_REVENUE_Q,
        "rollup_orders": oracle.ROLLUP_ORDERS_Q,
        "moving_avg": oracle.MOVING_AVG_Q,
        "trailing_hour": oracle.TRAILING_HOUR_Q,
        "repeat_customers": oracle.REPEAT_CUSTOMERS_Q,
        "distinct_users": oracle.DISTINCT_USERS_Q,
        "lapsed_customers": oracle.LAPSED_CUSTOMERS_Q,
        "above_avg_orders": oracle.ABOVE_AVG_Q,
        "listagg_users": oracle.LISTAGG_USERS_Q,
        "cube_orders": oracle.CUBE_ORDERS_Q,
        "semi_join": oracle.BIG_SPENDERS_Q,
        "anti_join": oracle.NO_ORDERS_Q,
        "percentiles": oracle.PRICE_PERCENTILES_Q,
        "asof_join": oracle.ASOF_JOIN_Q,
        "range_join": oracle.RANGE_JOIN_Q,
        "props_stats": oracle.PROPS_STATS_Q,
        "multires_rollup": oracle.MULTIRES_ROLLUP_Q,
        "pivot_daily": oracle.PIVOT_DAILY_Q,
        "ntile_deciles": oracle.NTILE_DECILES_Q,
        "price_histogram": oracle.PRICE_HISTOGRAM_Q,
        "regr_slope": oracle.REGR_SLOPE_Q,
        "zscore": oracle.ZSCORE_Q,
        "window_agg": oracle.WINDOW_AGG_Q,
        "stream_window_agg": oracle.WINDOW_AGG_Q,
        "stream_dedup": oracle.STREAM_DEDUP_Q,
        "stream_interval_join": oracle.STREAM_INTERVAL_JOIN_Q,
        "stream_left_interval_join": oracle.STREAM_LEFT_INTERVAL_JOIN_Q,
        "stream_sessionize": oracle.SESSIONIZE_Q,
        "stream_sessionize_append": oracle.SESSIONIZE_APPEND_Q,
        "stateful_totals": oracle.STATEFUL_TOTALS_Q,
        "salted_totals": oracle.SALTED_TOTALS_Q,
        "sessionize": oracle.SESSIONIZE_Q,
        "topk_per_group": oracle.TOPK_PER_GROUP_Q,
        "media_metadata": oracle.MEDIA_META_Q,
        "media_features": oracle.MEDIA_FEATURES_Q,
        "frame_sample": oracle.FRAME_SAMPLE_Q,
    }
