"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``assignment4_spark`` package; operators
self-register into assignment4_spark.registry (SURVEY.md §2 Part B keys).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment4_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return registry.QUERIES["agg_groupby_basic"](spark, "/root/testdata/sf0.001")


# Static verification-priority prefix, hard-coded at commit time. A plain
# committed constant — fully reproducible, independent of any files
# present at run time; unknown names are ignored (robust to renames).
_PRIORITY = [
    # Round-12 rotation: pure staleness policy, no additions (this is
    # an optimization round — the surface is frozen at 300). The 50
    # names the round-11 driver window hash-verified (CORRECTNESS_r11,
    # 50/50 green) move to the BACK; everything else keeps the r11
    # restage order, which was already last-green-round ascending — so
    # the front of this list is exactly the ops whose latest driver
    # check is oldest. Rows-only-by-design ops stay at the back of
    # their block (they cannot earn a hash row).
    "vec_upsert_merge", "agg_cms_heavy_hitters", "agg_incremental_merge",
    "agg_mutual_information", "agg_ttest_ab", "dedup_cluster_representative",
    "dedup_paragraph_rewrite", "graph_label_propagation",
    "join_nearest_spatial", "json_variant_shred", "rag_answer_select",
    "report_markdown_sink", "sample_cluster_holdout",
    "sample_curriculum_order", "scan_expectations_gate", "scan_table_profile",
    "scan_zorder_cluster", "stream_dedup_ids", "stream_late_data",
    "stream_neardup_gate", "stream_profile_enrich", "stream_rest_feed",
    "stream_session_window", "stream_sliding_avg", "stream_stateful_running",
    "stream_stream_join", "stream_tumbling_count", "stream_tumbling_topk",
    "text_bpe_apply", "text_dsir_importance", "text_fertility_by_lang",
    "text_gopher_rules", "ts_attribution_lasttouch", "ts_scd2_pointintime",
    "udf_grouped_agg", "udf_grouped_map", "udf_map_in_arrow",
    "udf_map_in_pandas", "udf_pandas_iter", "udf_pandas_scalar",
    "udf_python_scalar", "udtf_split_explode", "vec_centroid_outliers",
    "vec_matryoshka_eval", "agg_argminmax", "agg_collect_ordered",
    "agg_count_distinct", "agg_cube", "agg_groupby_basic",
    "agg_grouping_sets", "agg_having_filterclause", "agg_histogram",
    "agg_ks_drift", "agg_percentile", "agg_psi_drift", "agg_rollup",
    "agg_stats", "filter_conjunct", "filter_in_between_like",
    "filter_null_semantics", "join_anti", "join_broadcast",
    "join_cross_limited", "join_inner_shuffle", "join_left_right_full",
    "join_self_pairs", "join_semi", "json_parse_props", "merge_changes_feed",
    "merge_delete_tombstones", "merge_schema_evolve", "merge_upsert",
    "proj_select_alias", "rag_context_pack", "scan_binary_files",
    "scan_csv_roundtrip", "scan_files_compaction", "scan_json_roundtrip",
    "scan_orc_roundtrip", "scan_parquet", "scan_permissive_corrupt",
    "scan_python_datasource", "scan_schema_evolution", "scan_text_sink",
    "set_intersect", "set_union_all", "set_union_distinct", "sort_limit_topk",
    "stream_merge_sink", "stream_tv_drift_daily", "vec_embedding_drift",
    "agg_bootstrap_ci", "date_calendar_dim", "dedup_connected_components",
    "dedup_contamination", "dedup_edit_distance", "dedup_exact",
    "dedup_first_occurrence", "dedup_incremental_index", "dedup_minhash_lsh",
    "dedup_near_embedding", "dedup_near_jaccard", "dedup_simhash",
    "dedup_url_normalize", "join_asof_directional",
    "merge_bloom_point_lookup", "merge_clustered_read",
    "merge_identity_assign", "merge_partial_update", "merge_rebucket",
    "merge_vacuum_retention", "multimodal_table_explode",
    "rag_hybrid_bm25_cosine", "rag_pipeline_ingest", "rag_rrf_fusion",
    "sample_kfold_assign", "sample_poisson_bootstrap",
    "sample_reservoir_hash", "sample_split_hash", "sample_stratified_hash",
    "sample_temperature", "sample_weighted_ares", "sort_multikey_nulls",
    "stream_cdf_materialize", "stream_changes_feed", "stream_index_admission",
    "text_curate_pipeline", "text_fingerprint", "ts_dow_anomaly",
    "ts_forecast_backtest", "ts_holt_forecast", "udtf_token_offsets",
    "win_first_last", "win_lag_lead", "win_moving_avg_range",
    "win_ntile_cume", "win_pattern_match", "win_rank_dense_rownum",
    "win_running_sum", "win_topk_per_group", "agg_approx_distinct",
    "agg_cuped_adjustment", "agg_decimal_money", "agg_diff_in_diff",
    "agg_kmv_set_ops", "agg_mode", "agg_pivot", "agg_skew_salted",
    "agg_sprt_sequential", "array_higher_order", "cond_case_coalesce",
    "cond_try_cast", "date_funcs", "dedup_threshold_sweep",
    "graph_copurchase_pairs", "join_asof_nearest", "join_bloom_prefilter",
    "join_bucketed_colocated", "merge_expectations_gate",
    "merge_restore_version", "merge_serializable_check",
    "merge_shallow_clone", "merge_wap_publish", "scan_manifest_history",
    "stream_expectations_gate", "text_lang_id", "text_lang_stats",
    "text_ngram_freq", "text_pii_redact", "text_quality_score", "text_tfidf",
    "text_token_count", "text_unigram_logprob", "text_winnow_fingerprint",
    "text_word_count", "ts_anomaly_zscore", "ts_ewma", "ts_funnel_stages",
    "ts_gap_fill", "ts_interpolate_linear", "ts_ohlc_bars",
    "ts_retention_cohort", "ts_scd2_history", "ts_sessionize",
    "ts_stl_decompose", "vec_cosine_similarity", "vec_kmeans_assign",
    "vec_knn_topk", "vec_quantize_int8", "vec_upsert_dedup",
    "agg_bayes_ab_posterior", "agg_binned_quantile_sketch", "agg_corr_matrix",
    "agg_group_sequential", "agg_msprt_always_valid", "agg_weighted_median",
    "array_funcs", "dedup_containment_pairs", "join_interval_overlap",
    "join_skew_salted", "join_theta_range", "map_funcs", "math_funcs",
    "merge_delete_mor", "merge_optimize_compact", "merge_schema_drop",
    "scan_dynamic_partition_prune", "scan_null_pruned_audit",
    "scan_partition_pruning", "scan_stats_pruned_filter", "set_except",
    "set_unpivot", "sql_q10_returned_items", "sql_q11_important_parts",
    "sql_q12_priority_shipping", "sql_q13_customer_distribution",
    "sql_q14_promo_effect", "sql_q15_top_supplier", "sql_q16_supplier_cnt",
    "sql_q17_small_qty_avg", "sql_q18_large_volume",
    "sql_q19_disjunctive_rev", "sql_q1_pricing_summary",
    "sql_q20_parts_suppliers", "sql_q21_waiting_supplier",
    "sql_q22_global_sales", "sql_q2_min_acctbal_supplier",
    "sql_q3_shipping_priority", "sql_q4_order_priority",
    "sql_q5_local_supplier", "sql_q6_forecast_revenue",
    "sql_q7_volume_shipping", "sql_q8_market_share", "sql_q9_product_profit",
    "sql_recursive_bom", "str_funcs", "str_regexp", "str_split_tokens",
    "win_regr_slope", "win_streaks_islands", "agg_hll_distinct",
    "rag_embed_hash", "text_bpe_train", "vec_ann_ivf_topk",
    "vec_ann_recall_report", "vec_ann_rp_lsh_multiprobe",
    "vec_ann_rp_lsh_topk", "vec_kmeans_train", "vec_mmr_rerank",
    "vec_pca_project", "merge_delete_dv", "stream_cdf_pruned",
    "scan_time_travel_ts", "merge_replace_where", "merge_delete_where",
    "scan_partition_overwrite", "dedup_exact_substring",
    "dedup_pipeline_survivors", "dedup_semantic_cluster", "graph_bfs_layers",
    "graph_degree_hist", "graph_jaccard_neighbors", "graph_pagerank",
    "graph_triangle_count", "join_spatial_epsilon",
    "multimodal_audio_windows", "multimodal_binary_meta",
    "multimodal_frame_sample", "multimodal_image_phash",
    "multimodal_resize_plan", "multimodal_scene_cuts", "rag_chunk_text",
    "rag_metadata_project", "rag_search_format", "report_compose",
    "report_pdf_sink", "sample_class_balance", "sample_group_holdout",
    "sample_mix_proportions", "sample_shuffle_hash",
    "scan_file_skipping_stats", "scan_rest_datasource",
    "scan_snapshot_time_travel", "text_bigram_logprob",
    "text_bpe_pair_counts", "text_char_entropy", "text_lang_id_eval",
    "text_pack_sequences", "text_quality_bucket", "text_rake_keywords",
    "text_repetition_filter", "ts_cdc_apply", "ts_changepoint_cusum",
    "ts_downsample_ltob", "ts_seasonal_profile", "vec_ann_ivf_pq_topk",
    "vec_hard_negatives", "vec_ivf_build_stats", "vec_pq_quantize",
    "vec_sign_binary_hamming",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    names = list(registry.QUERIES)
    prio = [n for n in _PRIORITY if n in registry.QUERIES]
    rest = [n for n in names if n not in set(prio)]
    return {name: registry.QUERIES[name] for name in prio + rest}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
