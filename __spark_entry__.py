"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 inventory +
LLM-pipeline extensions), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible operators: sketches, LSH-ANN, SimHash,
frame sampling).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _catalog():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parquet_query_spark.operators.catalog import load_all

    return load_all()


# Driver-facing presentation order.  The correctness harness samples the
# catalog front-to-back (~50 slots per round), so queries that still need
# their FIRST green driver row come first, new-this-round operators next
# (inside the sample window, so the never-sampled gap cannot recur), then
# everything previously driver-green for re-confirmation.  All entries
# pass the local sf0.01 differential suite before they are listed here.
# Names not present in the catalog are skipped; catalog entries not
# listed keep registration order.
_DRIVER_PRIORITY = [
    # Round 7: VERDICT r6 Next-round #1 — the 30 catalog entries that have
    # never received a driver CORRECTNESS row (round-6 additions past the
    # ~50-slot sample window) go first.  All are local-green under the
    # identical strict compare; 30 < 50 slots, so this round takes
    # cumulative driver verification from 254/284 to 284/284.  New
    # round-7 operators follow in the remaining slots (so they get their
    # FIRST row this round instead of recreating the gap), then
    # everything previously driver-green for re-confirmation.
    "scalar_datetime_functions",
    "agg_exact_mode_per_group",
    "events_user_active_streaks",
    "events_outage_windows",
    "events_spike_attribution",
    "events_error_budget_burn",
    "events_alert_flap_detector",
    "text_ngram_novelty_curve",
    "text_lang_mix_entropy_by_source",
    "text_code_detection",
    "text_js_divergence_by_source",
    "text_contamination_hit_rate",
    "incremental_minhash_update",
    "dedup_minhash_estimator_error",
    "dedup_modality_agreement",
    "dedup_cluster_size_distribution",
    "embedding_dimension_profile",
    "embedding_knn_label_eval",
    "orders_cohort_ltv",
    "supplier_lead_time_control_chart",
    "dq_rule_violations",
    "orders_weekday_effect_ftest",
    "nation_revenue_rank_shift",
    "orders_open_order_aging",
    "pipeline_token_budget_mix",
    "pipeline_holdout_split",
    "lineitem_rolling_revenue_zscore",
    "warehouse_snapshot_diff",
    "warehouse_partition_skew_report",
    "streaming_ingest_decontaminate",
    # ── round-7 additions (first driver rows; filled as built) ──
    "orders_backlog_burndown",
    "agg_weighted_median",
    "events_sliding_distinct_users",
    "scalar_regex_functions",
    "profile_numeric_correlations",
    "dedup_band_tuning_table",
    "sample_bottom_k_mergeable",
    "multimodal_exact_dupes_by_hash",
    "text_c4_quality_filters",
    "pipeline_curriculum_order",
    "lineitem_returnflag_mix_shift",
    "events_burstiness_fano",
    "vocab_coverage_curve",
    "window_rolling_median_revenue",
    "embedding_ivf_nprobe_sweep",
    "pipeline_mix_rebalance_delta",
    "events_trend_mann_kendall",
    "text_zipf_law_fit",
    # ── streaming tier re-confirmation (VERDICT r6 #5: the slots after
    #    the 44 first-row entries go to the streaming set) ──
    "streaming_tumbling_counts",
    "streaming_dedup_by_key",
    "streaming_session_windows",
    "streaming_static_join_enrich",
    "streaming_stream_stream_join",
    "streaming_corpus_ingest_dedup",
    "streaming_hourly_ohlc",
    "streaming_stateful_user_totals",
    "streaming_foreach_batch_sink",
    "streaming_ewma_hourly",
    "streaming_bot_cadence",
    # ── previously driver-green, re-confirmation order ──
    "crossmodal_len_peakedness_correlation",
    "customer_interpurchase_time",
    "dedup_shingle_df_profile",
    "dedup_threshold_sensitivity",
    "embedding_exact_duplicates",
    "embedding_pair_distance_histogram",
    "events_adoption_curve",
    "events_benford_profile",
    "events_bot_cadence",
    "events_conversion_lag_histogram",
    "events_error_rate_alert",
    "events_heavy_hitter_drift",
    "events_hourly_entropy",
    "events_new_vs_returning",
    "events_seasonal_naive_backtest",
    "events_session_bounce_rate",
    "events_session_interarrival",
    "events_type_cooccurrence",
    "events_user_gini",
    "events_value_boxplot",
    "events_volume_autocorrelation",
    "join_null_safe_contrast",
    "lineitem_discount_elasticity",
    "lineitem_returns_by_brand",
    "multimodal_aspect_outliers",
    "orders_customer_hhi",
    "orders_duplicate_payments",
    "orders_fulfillment_lead_time",
    "orders_monthly_seasonality",
    "orders_priority_segment_contingency",
    "orders_quarter_end_loading",
    "pareto_supplier_revenue",
    "parts_supply_risk_matrix",
    "pipeline_dedup_bias_audit",
    "range_join_bucketed_probes",
    "revenue_yoy_growth",
    "scalar_bitwise_functions",
    "supplier_revenue_volatility",
    "text_boilerplate_prefixes",
    "text_case_style_profile",
    "text_language_confusion",
    "text_markup_residue",
    "text_readability_score",
    "text_source_vocab_overlap",
    "text_vocab_growth_curve",
    # ── round-6 additions already driver-green in r6 ──
    "embedding_norm_outliers",
    "embedding_label_centroid_drift",
    "events_peak_hours",
    "text_char_trigram_entropy",
    # ── previously driver-green, re-confirmation order ──
    "events_rate_limited_sample",
    "events_anomaly_mad",
    "incremental_upsert_orders",
    "customers_rfm_segmentation",
    "embedding_quantize_int8",
    "dedup_minhash_signatures_fast",
    # ── TPC-H closure ──
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q20_dominant_part_suppliers",
    "q21_suppliers_kept_waiting",
    # ── round-5 flagships, batch A ──
    "bloom_prune_join",
    "pipeline_shard_assignment",
    "text_script_profile",
    "neardup_pagerank",
    "neardup_triangles",
    "events_hourly_ohlc",
    "events_session_paths",
    "events_first_touch_attribution",
    "events_incremental_agg_merge",
    "agg_hll_mergeable_sketches",
    "events_value_winsorize",
    "dedup_cross_source_matrix",
    "crossmodal_lang_label_profile",
    # ── round-5 flagships, batch B ──
    "ann_recall_eval",
    "embedding_pca_top_component",
    "warehouse_forget_users",
    "neardup_kcore",
    "events_ewma_hourly",
    "agg_cms_heavy_hitters",
    "dedup_minhash_containment",
    "pipeline_funnel_report",
    "events_late_arrival_audit",
    "events_dau_wau_stickiness",
    "events_session_surprisal",
    "dedup_lsh_efficiency",
    "embedding_cluster_balance",
    "multimodal_corrupt_audit",
    "multimodal_size_histogram",
    "text_bigram_lm_score",
    "embedding_matryoshka_retention",
    "orders_basket_pairs",
    "events_cusum_changepoint",
    "text_zipf_slope",
    "events_ab_test_two_proportion",
    # ── round-4 tier, re-confirmation ──
    "embedding_pq_codes",
    "embedding_random_projection",
    "sink_roundtrip_orc",
    "maintenance_compact_small_files",
    "sink_zorder_cluster",
    "neardup_graph_degrees",
    "events_retention_cohorts",
    "pipeline_dataset_card",
    "fuzzy_join_rarest_token",
    "ann_ivfpq_adc",
    "pipeline_gopher_rules",
    "orders_scd2_history",
    "events_markov_transitions",
    "pipeline_dedup_report",
    "events_gapfill_hourly",
    "events_concurrency_sweep",
    "profile_value_histogram",
    # ── rounds 1-3 catalog, re-confirmation order ──
    "events_sessionize",
    "events_pivot_type_by_user",
    "events_two_level_rollup",
    "events_sliding_window_counts",
    "events_json_extract",
    "events_hourly_stats",
    "events_weekday_hour_heatmap",
    "events_from_json_struct",
    "window_distribution_ranks",
    "window_range_frame_weekly_revenue",
    "agg_grouping_sets",
    "agg_exact_quantiles",
    "agg_approx_quantiles",
    "subq_correlated_min_price",
    "unpivot_lineitem_measures",
    "values_inline_table",
    "lateral_top2_customers_per_nation",
    "profile_orders_columns",
    "pipeline_clean_corpus",
    "agg_salted_skew",
    "join_salted_skew",
    "sample_deterministic_hash",
    "sink_roundtrip_bucketed_join",
    "dedup_simhash_buckets",
    "dedup_simhash",
    "dedup_cluster_survivors",
    "dedup_decontaminate",
    "text_tfidf_top_terms",
    "ann_lsh_cosine",
    "pipeline_quality_threshold",
    "text_chunk_for_training",
    "sample_stratified_per_lang",
    "dedup_cluster_best_keeper",
    "agg_approx_distinct",
    "multimodal_frame_sample",
    "text_repetition_stats",
    "dedup_common_spans",
    "pipeline_pack_sequences",
    "kmeans_embeddings",
    "semdedup_prune",
    "events_funnel",
    "text_unigram_lm_score",
    "text_pii_redact",
    "vocab_top_pairs",
    "pipeline_source_mixing",
    "template_account_summary",
    "template_service_summary",
    "template_monthly_summary",
    "template_account_details",
    "template_savings_plans",
    "template_reserved_instances",
    "dedup_exact_groups",
    "dedup_minhash_signatures",
    "dedup_minhash_candidate_pairs",
    "dedup_connected_components",
    "dedup_cluster_pipeline",
    "embedding_neardup_clusters",
    "ann_ivf_cosine",
    "knn_bruteforce_cosine",
    "text_stats",
    "text_quality_score",
    "multimodal_decode_meta",
    "multimodal_audio_meta",
    "multimodal_video_meta",
    "udf_grouped_zscore",
    "asof_purchase_last_view",
    "recursive_cte_month_series",
    # (everything else keeps catalog registration order here)
]

# Genuinely no-oracle entries — forced to the very end of the sample
# order (a slot spent on them can never produce a green row).  Empty
# since round 5: dedup_minhash_signatures_fast gained a generated
# pure-SQL XXH64 oracle (functions/xxh64_sql.py).
_DRIVER_LAST: list[str] = []


def _ordered(catalog):
    first = [n for n in _DRIVER_PRIORITY if n in catalog]
    last = [n for n in _DRIVER_LAST if n in catalog]
    placed = set(first) | set(last)
    rest = [n for n in catalog if n not in placed]
    return {n: catalog[n] for n in (*first, *rest, *last)}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary at sf0.001."""
    from parquet_query_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    catalog = _catalog()
    return catalog["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    catalog = _catalog()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from parquet_query_spark.session import ensure_session_confs

            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in _ordered(catalog).items()}


def oracle_sql() -> dict[str, str]:
    catalog = _catalog()
    return {name: spec.oracle for name, spec in _ordered(catalog).items() if spec.oracle}
