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

# Round-3 verification priority. The driver records ~50 CORRECTNESS
# rows per round; r1 covered the first 50 registry entries, r2 the
# 50-qid priority block. Round 3 front-loads (a) the 4 qids repaired
# this round (r2 red: sgn INT cast, capped DOUBLE cast, array/map
# outputs serialized to strings), (b) the 3 qids never checked in
# either round, then (c) the 48 r1-green qids whose shared
# infrastructure (io.py memoization, cache.py scoping, session.py)
# changed in rounds 2-3, so their green doesn't go stale — freshest
# signal first, within the ~50-row budget. Registration/implementation
# is unchanged — this orders only the exported dict views.
_PRIORITY = [
    # (a0) NEW this round (curation extensions + ORC source) — need
    # their first-ever driver rows
    "q_dedup_cluster",
    "q_decontam",
    "q_pii_scrub",
    "q_data_split",
    "q_pack_sequences",
    "q_text_repetition",
    "q_funnel",
    "q_embed_quantize",
    "src_orc",
    "q_sample_stratified",
    "q_doc_chunk",
    "q_mixture_weights",
    "q_quality_filter",
    "q_sim_ann_lsh",
    "s_join",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_join_skew_salted",
    "s_ss_join",
    "q_text_normalize",
    "q_merge_upsert",
    "q_agg_hll_sketch",
    "q_curation_e2e",
    "q_ts_resample",
    "q_partition_prune",
    "q_graph_pagerank",
    "q_ts_interpolate",
    "q_dq_checks",
    # (a) repaired this round — were driver-red in CORRECTNESS_r02
    "q_math_funcs",
    "q_cond_funcs",
    "q_array_funcs",
    "q_map_funcs",
    # (b) never driver-checked in r1 or r2
    "q_str_funcs2",
    "q_date_funcs2",
    "q_multimodal_framesample",
    # (c) r1-green, shared infra touched since: re-verify
    "q_agg_global",
    "q_agg_group",
    "q_agg_distinct",
    "q_agg_having",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_gsets",
    "q_agg_stats",
    "q_agg_percentile",
    "q_agg_argminmax",
    "q_scan_project",
    "q_scan_pushdown",
    "q_filter_range",
    "q_project_expr",
    "q_filter_in_like",
    "q_filter_null_bool",
    "q_join_inner",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_cross",
    "q_join_theta",
    "q_join_nullsafe",
    "q_join_interval",
    "q_join_asof",
    "q_join_bucketed",
    "q_sort_multi",
    "q_pivot",
    "q_unpivot",
    "q_subquery_scalar",
    "q_subquery_corr",
    "q_sessionize",
    "q_window_sliding",
    "q_window_tumbling",
    "q_tile_grid",
    "q_tile_path",
    "q_tile_s3_variant",
    "q_tile_manifest_semi",
    "q_tile_stats",
    "q_tile_etl_e2e",
    "src_csv_json",
    "src_csv_infer",
    "sink_parquet",
    "src_binary",
    "sink_objectstore",
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
