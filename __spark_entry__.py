"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real code lives in the ``tile_etl_spark`` package; this module is a
thin view over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tile_etl_spark import registry  # noqa: E402

registry.load_all()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q_agg_group"

# Verification priority. The driver records ~50 CORRECTNESS rows per
# round, in this order. Front: (a) the two previously-red, now-repaired
# time-series qids (must re-verify inside the budget), then (a00/a0/a1)
# the never-driver-checked additions oldest-first, then (b/c) refresh
# tiers for qids whose shared infrastructure changed. With ~100 unchecked
# qids and ~50 rows/round, the backlog drains over the next 2 rounds;
# rotate newly-checked qids out of the front as CORRECTNESS_r{N} files
# confirm them. Registration/implementation is unchanged — this orders
# only the exported dict views.
_PRIORITY = [
    # (a) r3-red, REPAIRED this round (bucket now epoch-second BIGINT —
    # constructed-timestamp outputs were the failing representation
    # class): must be re-checked inside the ~50-row budget to prove the
    # fix, so they lead the list.
    "q_ts_resample",
    "q_ts_interpolate",
    # (a-1) NEW in round 7 — need their first-ever driver rows
    "src_xml",
    "q_sql_udf",
    "q_pipe_sql",
    "q_param_sql",
    "q_collation",
    "q_tpch_q21",
    "q_url_funcs",
    "q_sample_weighted",
    "q_observe_metrics",
    "s_tile_ingest",
    "q_graph_bfs",
    "src_python_ds_stream",
    "q_ts_seasonal_decompose",
    "q_dedup_url",
    "q_rolling_distinct",
    "q_scd2_snapshot",
    "q_cdc_apply",
    "q_multimodal_pngmeta",
    "sink_partition_overwrite",
    "q_text_compress_ratio",
    "q_udtf_analyze",
    "q_minhash_portable",
    "q_simhash_portable",
    # (a00) NEW in round 5 — need their first-ever driver rows
    "q_funnel_ttc",
    "q_basket_pairs",
    "q_rel_division",
    "q_cumulative_uniques",
    "q_peak_concurrency",
    "q_seasonality_dow",
    "q_tile_neighbors",
    "q_schema_evolution",
    "src_csv_badrecords",
    "q_tile_zorder",
    "q_dedup_cluster_stats",
    "q_multimodal_audio",
    "q_cohort_ltv",
    "q_graph_degree_dist",
    "q_dq_partition_stats",
    "q_hof_funcs",
    "q_tpch_q7",
    "q_tpch_q12",
    "q_tpch_q14",
    "q_tpch_q19",
    "q_tile_sync_delta",
    "q_join_asof_fwd",
    "q_feature_hash",
    "q_text_boilerplate",
    "q_tile_pyramid",
    "q_bm25",
    "q_lm_doc_score",
    "q_rfm_segments",
    "q_session_paths",
    "q_skyline",
    "q_agg_entropy",
    "q_ts_ewma",
    "q_embed_knn_graph",
    "q_embed_prototype",
    "q_graph_triangles",
    "q_agg_bitmap_distinct",
    "q_calendar_fill",
    "q_agg_incremental",
    "q_attribution",
    "q_join_dpp",
    "src_text",
    # (a0) NEW in round 4 — need their first-ever driver rows
    "q_join_bloom",
    "q_hist_equiwidth",
    "q_hist_equidepth",
    "q_text_inverted_index",
    "q_text_cooccur",
    "q_ts_rollup",
    "q_scd2_intervals",
    "q_outlier_robust",
    "s_foreachbatch",
    "q_dedup_contain",
    "q_topk_heavy_hitters",
    "q_tile_point_lookup",
    "q_embed_centroids",
    "q_join_fuzzy",
    "q_sql_api",
    "q_agg_mode",
    "q_win_islands",
    "q_agg_stringagg",
    "q_winsorize",
    "q_retention_cohorts",
    "q_abtest_ztest",
    "q_tpch_q18",
    "q_ts_moving_median",
    "q_event_transitions",
    "q_text_bigram_lm",
    "q_agg_filtered",
    "q_win_share",
    # (a1) NEW in round 6 — need their first-ever driver rows
    "q_tpch_q13",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q22",
    "q_tpch_q9",
    "q_corr_pearson",
    "q_cuped",
    "q_sample_reservoir",
    "q_anomaly_window",
    "q_text_vocab_growth",
    "q_tpch_q2",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q8",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_tpch_q20",
    "sink_compact",
    "q_delete_propagate",
    "q_tile_haversine",
    "q_recursive_cte",
    "q_lateral_topn",
    "q_variant_funcs",
    "src_python_ds",
    "q_cogroup_pandas",
    "q_embed_pca",
    "s_ss_join_louter",
    "q_ivm_join",
    "q_union_by_name",
    "q_regex_funcs",
    "q_try_funcs",
    "q_join_hints",
    "q_table_profile",
    "q_generator_funcs",
    "q_array_funcs2",
    "q_bitwise_funcs",
    "q_feature_scale",
    "q_onehot_encode",
    "s_progress_metrics",
    "q_udf_arrow",
    "q_map_in_arrow",
    # (b) events-based — fixture timestamp type changed post-r3
    "q_filter_null_bool",
    "q_join_nullsafe",
    "q_join_interval",
    "q_join_asof",
    "q_sessionize",
    "q_window_sliding",
    "q_window_tumbling",
    "q_win_leadlag",
    "q_win_range",
    "q_json_funcs",
    "q_udaf_grouped",
    "q_udaf_agg",
    "q_partition_prune",
    "q_funnel",
    "q_merge_upsert",
    # (c) last driver row is r1/r2 — refresh, oldest infra-coupled first
    "q_agg_collect",
    "q_agg_approx",
    "q_win_rank",
    "q_win_running",
    "q_win_ntile",
    "q_win_value",
    "q_str_funcs",
    "q_date_funcs",
    "q_hash_funcs",
    "q_cast_types",
    "q_udf_scalar",
    "q_udtf",
    "q_dedup_exact",
    "q_dedup_near",
    "q_dedup_ngram",
    "q_dedup_simhash",
    "q_dedup_embed",
    "q_sim_cosine_topk",
    "q_sim_ann_ivf",
    "q_text_stats",
    "q_text_tfidf",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_text_fingerprint",
    "q_multimodal_join",
    "q_multimodal_decode",
    "q_tile_grid",
    "q_tile_path",
    "q_tile_s3_variant",
    "q_tile_manifest_semi",
    "q_tile_stats",
    "q_tile_etl_e2e",
    "sink_objectstore",
    "src_csv_json",
    "src_csv_infer",
    "sink_parquet",
    "src_binary",
    "q_join_bucketed",
    "q_filter_in_like",
    "q_join_inner",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_cross",
    "q_join_theta",
    "q_pivot",
    "q_unpivot",
    "q_subquery_scalar",
    "q_subquery_corr",
    "q_sort_multi",
    "q_topk",
    "q_topk_per_group",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_except_all",
    "q_intersect_all",
    "s_tumbling",
    "s_sliding",
    "s_session",
    "s_watermark",
    "s_dedup",
    "s_stateful",
]


def _ordered(names: list[str]) -> list[str]:
    """Priority qids first, then the rest in registration order."""
    missing = [q for q in _PRIORITY if q not in registry.QUERIES]
    assert not missing, f"priority qids not registered: {missing}"
    front = [q for q in _PRIORITY if q in names]
    return front + [q for q in names if q not in _PRIORITY]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001; driver checks rows>0."""
    return registry.QUERIES[FLAGSHIP](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return {q: registry.QUERIES[q] for q in _ordered(list(registry.QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins for every H-checked qid (SURVEY §2B)."""
    return {q: registry.ORACLES[q] for q in _ordered(list(registry.ORACLES))}
