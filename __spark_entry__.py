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


# Static verification-priority prefix, hard-coded at commit time (round 4)
# from the committed CORRECTNESS_r01-r03 artifacts: the four queries that
# FAILED the round-2 driver check (since fixed) and `agg_approx_distinct`
# (whose oracle was reworked in round 3) come first so the driver's
# 50-query correctness window re-confirms them, followed by every query
# that has never received a driver CORRECTNESS row. This ordering is a
# plain committed constant — fully reproducible, independent of any files
# present at run time. Queries not listed here follow in registration
# order; unknown names are ignored (robust to renames).
_PRIORITY = [
    # r2 driver FAILs, fixed in r3 — re-confirm first
    "join_theta_range", "join_asof_nearest", "agg_pivot", "agg_decimal_money",
    # oracle reworked r3 (rows-only before) — first hash check
    "agg_approx_distinct",
    # never driver-checked as of r3 (CORRECTNESS_r01-r03 set difference).
    # agg_hll_distinct (rows-only by design) is deferred to the tail of
    # this list so it doesn't spend one of the driver's 50 hash-check
    # slots on a rows-only row.
    "join_interval_overlap", "agg_mode", "win_regr_slope",
    "win_streaks_islands", "set_except", "set_unpivot", "scan_partition_pruning",
    "join_bucketed_colocated", "agg_skew_salted", "join_skew_salted",
    "scan_dynamic_partition_prune", "join_bloom_prefilter",
    "sql_q1_pricing_summary", "sql_q2_min_acctbal_supplier",
    "sql_q3_shipping_priority", "sql_q4_order_priority", "sql_q5_local_supplier",
    "sql_q6_forecast_revenue", "sql_q7_volume_shipping", "sql_q8_market_share",
    "sql_q9_product_profit", "sql_q10_returned_items", "sql_q11_important_parts",
    "sql_q12_priority_shipping", "sql_q13_customer_distribution",
    "sql_q14_promo_effect", "sql_q15_top_supplier", "sql_q16_supplier_cnt",
    "sql_q17_small_qty_avg", "sql_q18_large_volume", "sql_q19_disjunctive_rev",
    "sql_q20_parts_suppliers", "sql_q21_waiting_supplier", "sql_q22_global_sales",
    "sql_recursive_bom", "str_funcs", "str_regexp", "str_split_tokens",
    "date_funcs", "math_funcs", "cond_case_coalesce", "array_funcs",
    "array_higher_order", "map_funcs", "cond_try_cast", "rag_chunk_text",
    "rag_metadata_project", "rag_embed_hash", "rag_search_format",
    "multimodal_binary_meta", "multimodal_resize_plan", "multimodal_frame_sample",
    "report_compose", "multimodal_image_phash", "multimodal_audio_windows",
    "graph_pagerank", "graph_triangle_count", "graph_degree_hist",
    "stream_tumbling_count", "stream_sliding_avg", "stream_session_window",
    "stream_dedup_ids", "stream_late_data", "stream_stateful_running",
    "stream_stream_join", "udf_python_scalar", "udf_pandas_scalar",
    "udf_grouped_map", "udf_grouped_agg", "udf_pandas_iter",
    "udf_map_in_pandas", "udtf_split_explode", "udf_map_in_arrow",
    # added in round 4 — never driver-checked
    "vec_upsert_merge", "scan_rest_datasource", "text_pack_sequences",
    "text_bpe_pair_counts", "sample_shuffle_hash", "dedup_pipeline_survivors",
    "text_quality_bucket", "text_repetition_filter", "sample_class_balance",
    "sample_mix_proportions",
    # added later in round 4 — never driver-checked
    "agg_cms_heavy_hitters", "text_dsir_importance", "dedup_exact_substring",
    "dedup_semantic_cluster", "vec_pq_quantize", "ts_downsample_ltob",
    "scan_snapshot_time_travel", "vec_ann_ivf_pq_topk", "text_bigram_logprob",
    "ts_changepoint_cusum", "ts_cdc_apply", "dedup_containment_pairs",
    "graph_bfs_layers", "text_rake_keywords", "sample_group_holdout",
    "join_spatial_epsilon", "scan_file_skipping_stats", "vec_ivf_build_stats",
    "stream_tumbling_topk", "text_lang_id_eval", "multimodal_scene_cuts",
    "report_pdf_sink",
    # rows-only by design — a driver row adds no hash check; keep last
    "agg_hll_distinct", "text_bpe_train",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    names = list(registry.QUERIES)
    prio = [n for n in _PRIORITY if n in registry.QUERIES]
    rest = [n for n in names if n not in set(prio)]
    return {name: registry.QUERIES[name] for name in prio + rest}


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
