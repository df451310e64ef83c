"""Physical-plan shape assertions (the 100 TB posture, SURVEY §4).

Correctness tests prove the operators compute the right rows; these
prove Catalyst is executing them the way the scale design intends —
filters reach the parquet reader, dimension joins broadcast, rewritten
joins never fall back to nested loops, top-k never globally sorts.
A regression here is a silent 100× at-scale slowdown that row counts
would never catch.
"""

from __future__ import annotations

import pytest

from tile_etl_spark import registry

registry.load_all()


def plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def q(qid, spark, sf_dir):
    return registry.QUERIES[qid](spark, sf_dir)


def test_projection_prunes_scan(spark, sf_dir):
    p = plan(q("q_scan_project", spark, sf_dir))
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read and "l_shipdate" in read
    assert "l_extendedprice" not in read and "l_comment" not in read


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    p = plan(q("q_scan_pushdown", spark, sf_dir))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    assert "GreaterThanOrEqual(l_shipdate" in pushed


def test_q6_pushes_all_range_predicates(spark, sf_dir):
    p = plan(q("q_filter_range", spark, sf_dir))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    for frag in ("l_shipdate", "l_discount", "LessThan(l_quantity"):
        assert frag in pushed, pushed


def test_dimension_joins_broadcast(spark, sf_dir):
    for qid in ("q_join_inner", "q_join_broadcast"):
        p = plan(q(qid, spark, sf_dir))
        assert "BroadcastHashJoin" in p, qid
        assert "CartesianProduct" not in p, qid


def test_rewritten_joins_avoid_nested_loop(spark, sf_dir):
    """The whole point of the banding/union-window builders (SURVEY
    §4.3): no BroadcastNestedLoopJoin in interval or as-of plans."""
    for qid in ("q_join_interval", "q_join_asof"):
        p = plan(q(qid, spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in p, qid
        assert "CartesianProduct" not in p, qid


def test_theta_join_keeps_equi_component(spark, sf_dir):
    p = plan(q("q_join_theta", spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p
    assert "Join" in p  # hash join on p_brand with residual <


def test_topk_uses_take_ordered(spark, sf_dir):
    p = plan(q("q_topk", spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_grouped_topk_limits_inside_window(spark, sf_dir):
    p = plan(q("q_topk_per_group", spark, sf_dir))
    assert "WindowGroupLimit" in p


def test_agg_has_partial_and_final(spark, sf_dir):
    df = q("q_agg_group", spark, sf_dir)
    p = plan(df)
    assert p.count("HashAggregate") >= 2  # map-side partial + final
    # AQE hides codegen stars pre-execution; codegen mode shows subtrees
    assert "WholeStageCodegen" in plan(df, "codegen")


def test_near_dup_pipeline_has_no_cartesian(spark, sf_dir):
    p = plan(q("q_dedup_near", spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pandas_udf_is_arrow(spark, sf_dir):
    p = plan(q("q_udf_scalar", spark, sf_dir))
    assert "ArrowEvalPython" in p


def test_bucketed_join_eliminates_exchanges(spark, sf_dir):
    """The bucketing payoff: orders⋈lineitem over bucketed-by-orderkey
    tables sort-merges with NO shuffle and NO sort on the join inputs.
    (At test scale Catalyst rightly prefers broadcast, so broadcast is
    disabled to expose the big⋈big shape bucketing exists for; the only
    Exchange left is the post-join aggregation's.)"""
    from tile_etl_spark.operators.bucketed import bucketed_tables

    assert bucketed_tables(spark, sf_dir) is not None, "metastore expected in tests"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p = plan(q("q_join_bucketed", spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in p
    assert "Bucketed: true" in p
    for ln in p.splitlines():
        if "Exchange" in ln:
            assert "orderkey" not in ln, f"join input shuffled:\n{p}"
    # NB: a LOCAL per-bucket Sort remains — Spark ≥3.0 ignores bucket
    # sort metadata by default (legacy outputOrdering flag). The
    # network shuffle, the part that matters at 100 TB, is gone.


def test_semi_anti_are_joins_not_subquery_loops(spark, sf_dir):
    for qid, kind in (("q_join_semi", "LeftSemi"), ("q_join_anti", "LeftAnti")):
        p = plan(q(qid, spark, sf_dir))
        assert kind in p, qid


def test_global_rank_never_single_reducer_sorts(spark, sf_dir):
    """q_win_ntile's two-pass form: the orders data flows through a
    RangePartitioning exchange + per-partition windows; the ONLY
    unpartitioned window allowed is the one over the tiny per-partition
    histogram (input: an Aggregate, not the scan)."""
    p = plan(q("q_win_ntile", spark, sf_dir))
    assert "rangepartitioning" in p.lower(), p
    # the data-bearing window partitions by pid (spark_partition_id)
    assert "spark_partition_id" in p.lower(), p
    # the invariant: any Window node ordering the full data by
    # o_totalprice must carry a partition spec (pid); an unpartitioned
    # one would be the single-reducer global sort this plan exists to
    # avoid. (The histogram window is unpartitioned but never touches
    # o_totalprice.)
    for ln in p.splitlines():
        if "Window" in ln and "o_totalprice" in ln:
            assert "pid" in ln or "spark_partition_id" in ln, ln


def test_mixture_interleave_never_single_reducer_sorts(spark, sf_dir):
    """Round-6 rewrite: the global training-order position comes from
    the two-pass pid-offset pattern, so every doc-bearing Window node
    carries a partition spec (source for the per-source rank, pid for
    the local rank) — never an unpartitioned row_number over the whole
    interleaved corpus."""
    p = plan(q("q_mixture_interleave", spark, sf_dir))
    assert "rangepartitioning" in p.lower(), p
    assert "spark_partition_id" in p.lower(), p
    for ln in p.splitlines():
        if "Window" in ln and "doc_id" in ln:
            assert "pid" in ln or "source" in ln, ln


def test_rfm_ntiles_never_single_reducer_sort(spark, sf_dir):
    """Round-6 rewrite: all three RFM quartiles run as two-pass global
    ranks — any Window node touching a customer metric must be
    pid-partitioned; the only unpartitioned windows run over the
    n_parts-row histogram."""
    p = plan(q("q_rfm_segments", spark, sf_dir))
    assert "rangepartitioning" in p.lower(), p
    for ln in p.splitlines():
        if "Window" in ln and (
            "last_order" in ln or "frequency" in ln or "monetary" in ln
        ):
            assert "pid" in ln or "spark_partition_id" in ln, ln


def test_session_paths_topk_before_rank_window(spark, sf_dir):
    """Round-6 reorder: the top-k filter is a TakeOrderedAndProject
    (parallel per-partition heaps) BEFORE the rank window, so the
    unpartitioned window only ever sees PATH_TOPK rows, not the full
    distinct-path table."""
    p = plan(q("q_session_paths", spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p


def test_peak_concurrency_sweep_is_two_level(spark, sf_dir):
    """Round-6 rewrite: the sweep-line running sum is partial per range
    shard + broadcast offset merge — any Window node over the boundary
    stream (ordered by us) must be pid-partitioned."""
    p = plan(q("q_peak_concurrency", spark, sf_dir))
    assert "rangepartitioning" in p.lower(), p
    for ln in p.splitlines():
        if "Window" in ln and "us#" in ln:
            assert "pid" in ln or "spark_partition_id" in ln, ln


def test_tpch_q3_star_plan(spark, sf_dir):
    """Composite star query: dims broadcast (fact never pre-shuffles
    for the joins), top-10 via TakeOrderedAndProject, date filters
    pushed to the scans."""
    p = plan(q("q_tpch_q3", spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in p


def test_tpch_q5_single_fact_shuffle(spark, sf_dir):
    """Six-table join: every non-fact relation broadcasts; the only
    exchange is the final 5-row aggregate's."""
    p = plan(q("q_tpch_q5", spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p
    # one shuffle for the aggregate (plus AQE reads); never a fact sort
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_skew_salted_join_is_sort_merge(spark, sf_dir):
    """The salted demo must actually exercise the shuffle path — a
    broadcast would dodge the skew instead of spreading it — and join
    on the widened (skew_key, salt) key."""
    p = plan(q("q_join_skew_salted", spark, sf_dir))
    assert "SortMergeJoin" in p
    assert "skew_key" in p and "salt" in p


def test_decontam_broadcasts_eval_side(spark, sf_dir):
    """The eval shingle set must broadcast (a benchmark is KBs against
    a 100 TB corpus) — the corpus side must never shuffle for the
    join."""
    p = plan(q("q_decontam", spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pii_scrub_is_pure_map(spark, sf_dir):
    """Scrubbing is a single narrow projection — no exchange, no UDF."""
    p = plan(q("q_pii_scrub", spark, sf_dir))
    assert "Exchange" not in p
    assert "Python" not in p  # no Python UDF in the hot path


def test_merge_upsert_single_join(spark, sf_dir):
    """MERGE decomposes to ONE full-outer join pass over the key."""
    import re

    p = plan(q("q_merge_upsert", spark, sf_dir))
    assert "FullOuter" in p
    # exactly one join node (detail headers look like "(14) SortMergeJoin")
    joins = re.findall(r"^\(\d+\) \w*Join", p, flags=re.M)
    assert len(joins) == 1, joins
    assert "CartesianProduct" not in p


def test_partition_prune_reads_one_directory(spark, sf_dir):
    """The date filter must reach the scan as a PartitionFilter with
    the literal date — one directory listed and read, not a post-scan
    filter over every partition."""
    p = plan(q("q_partition_prune", spark, sf_dir))
    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln][0]
    assert "event_date" in pf and "=" in pf, pf
    assert "dynamicpruning" in pf or "event_date" in pf


def test_bloom_probe_filters_before_join(spark, sf_dir):
    """q_join_bloom's whole point: the bitmap membership predicate runs
    in the probe side's scan stage (xxhash64 + bitwise AND visible in a
    Filter over the lineitem scan), the residual exact join broadcasts,
    and nothing nested-loops."""
    p = plan(q("q_join_bloom", spark, sf_dir))
    assert "xxhash64" in p.lower(), p
    assert "BroadcastHashJoin" in p, p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the membership predicate must run in a Filter condition (fused
    # with the probe scan, below the join) — formatted mode puts node
    # names and conditions on separate lines
    cond_lines = [
        ln
        for ln in p.splitlines()
        if "Condition" in ln and "element_at" in ln
    ]
    assert cond_lines, p


def test_equidepth_never_single_reducer_sorts(spark, sf_dir):
    """Same invariant as q_win_ntile: the lineitem data flows through
    RangePartitioning + pid-partitioned windows; no unpartitioned
    data-bearing window/sort."""
    p = plan(q("q_hist_equidepth", spark, sf_dir))
    assert "rangepartitioning" in p.lower(), p
    assert "spark_partition_id" in p.lower(), p
    for ln in p.splitlines():
        if "Window" in ln and "cents" in ln:
            assert "pid" in ln or "spark_partition_id" in ln, ln


def test_equiwidth_broadcasts_bounds(spark, sf_dir):
    """The 1-row min/max aggregate joins in as a broadcast (never a
    shuffled join), and the per-bucket aggregate is partial+final."""
    p = plan(q("q_hist_equiwidth", spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert p.count("HashAggregate") >= 2, p


def test_cooccur_broadcasts_vocab(spark, sf_dir):
    """The df-pruned vocabulary joins into the token stream as a
    broadcast; the only wide shuffle is the pair aggregate."""
    p = plan(q("q_text_cooccur", spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_ts_rollup_single_expand_pass(spark, sf_dir):
    """Grouping sets = ONE scan + Expand + partial/final aggregate —
    not three scans unioned."""
    p = plan(q("q_ts_rollup", spark, sf_dir))
    # formatted mode prints each node in the tree AND as a "(n) Node"
    # detail header — count the detail headers
    scans = [
        ln
        for ln in p.splitlines()
        if ln.strip().startswith("(") and "Scan parquet" in ln
    ]
    assert len(scans) == 1, p
    assert "Expand" in p, p
    assert p.count("HashAggregate") >= 4, p  # partial+final, 2 spots each


def test_outlier_stats_broadcast_back(spark, sf_dir):
    """Per-type median/MAD stats join back into the event scan as a
    broadcast — the big side never shuffles for the scoring pass."""
    p = plan(q("q_outlier_robust", spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_fuzzy_join_blocks_on_brand(spark, sf_dir):
    """The levenshtein residual must ride a HASH join on the blocking
    key — an unblocked fuzzy join would be a cartesian scan."""
    p = plan(q("q_join_fuzzy", spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "levenshtein" in p.lower(), p


def test_tpch_q18_semi_join_and_topk(spark, sf_dir):
    """The HAVING key set must come back as a semi-join (never a
    re-aggregation per probe row) and the top-100 must be
    TakeOrderedAndProject, not a global sort."""
    p = plan(q("q_tpch_q18", spark, sf_dir))
    assert "LeftSemi" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p


def test_dpp_prunes_fact_scan(spark, sf_dir):
    """q_join_dpp's whole point: with the selective filter on the DIM
    side only, the fact scan's PartitionFilters must carry a
    dynamicpruning subquery (runtime partition pruning), and the dim
    must broadcast — no static filter exists that could prune the scan
    at plan time."""
    p = plan(q("q_join_dpp", spark, sf_dir))
    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln][0]
    assert "dynamicpruning" in pf, pf
    assert "BroadcastExchange" in p


def test_skyline_local_prefilter_before_global_sort(spark, sf_dir):
    """Two window passes: the partition-local frontier (keyed by
    spark_partition_id, no shuffle) must appear BELOW the global
    single-partition window, so the global sort only sees local
    survivors."""
    p = plan(q("q_skyline", spark, sf_dir))
    assert p.count("windowspecdefinition") >= 2, p
    # the local pass partitions by the pid column; the global pass has
    # an empty partition spec
    assert "windowspecdefinition(pid" in p, p


def test_knn_graph_single_shuffle_then_topk_window(spark, sf_dir):
    """Block-grid kNN: one hash partitioning on (gi, gj) feeds the
    Arrow kernel; no CartesianProduct / nested loop anywhere; the final
    per-src window ranks bounded candidates."""
    p = plan(q("q_embed_knn_graph", spark, sf_dir))
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "FlatMapGroupsInPandas" in p or "ApplyInPandas" in p, p


def test_calendar_fill_joins_aggregates_not_rows(spark, sf_dir):
    """The fill join's right side must be the pre-aggregated daily
    frame (HashAggregate below the join), never raw orders."""
    p = plan(q("q_calendar_fill", spark, sf_dir))
    import re

    join_line = re.search(r"\(\d+\) (\w*Join\w*)", p)
    assert join_line, p
    assert "HashAggregate" in p


def test_tpch_q7_broadcasts_all_dims(spark, sf_dir):
    """Q7's three dimension arms (supplier, customer, nation×2) must
    broadcast; the only shuffled join is lineitem⋈orders; nothing
    nested-loops."""
    p = plan(q("q_tpch_q7", spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_tpch_q19_pushes_residual_predicates(spark, sf_dir):
    """The OR-of-ANDs disjunction must not block scan-level pushdown of
    the derivable single-side conjuncts: the lineitem scan carries a
    pushed quantity filter, and the join broadcasts."""
    p = plan(q("q_tpch_q19", spark, sf_dir))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("l_quantity" in ln for ln in pushed), pushed
    assert "BroadcastHashJoin" in p


def test_bm25_stats_broadcast_fact_single_sort(spark, sf_dir):
    """BM25: df and corpus stats broadcast; the scoring join on doc_id
    is hash/broadcast (no nested loop); the top-k is one bounded
    window, not a global sort of the corpus."""
    p = plan(q("q_bm25", spark, sf_dir))
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    # the ONLY nested-loop allowed is the broadcast of the 1-row
    # (N, avgdl) stats frame — the same scalar-join shape as tf-idf's
    # corpus-size N; anything more means a real pair blowup
    import re

    bnlj = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, flags=re.M)
    assert len(bnlj) <= 1, p


def test_feature_hash_single_shuffle(spark, sf_dir):
    """Hashing-trick featurization must be explode → ONE hash aggregate
    (map-side combined): exactly one shuffle exchange, no join."""
    import re

    p = plan(q("q_feature_hash", spark, sf_dir))
    exchanges = re.findall(r"^\(\d+\) Exchange", p, flags=re.M)
    assert len(exchanges) == 1, exchanges
    assert "Join" not in p


def test_sync_delta_single_fullouter_join(spark, sf_dir):
    """The manifest diff is ONE full-outer sort-merge/hash join on the
    key — no repeated grid generation fan-in beyond the two sides."""
    import re

    p = plan(q("q_tile_sync_delta", spark, sf_dir))
    joins = re.findall(r"^\(\d+\) \w*Join\w*", p, flags=re.M)
    assert len(joins) == 1, joins
    assert "FullOuter" in p


def test_asof_fwd_no_inequality_join(spark, sf_dir):
    """Forward as-of must be the union+window rewrite: no join operator
    at all in the plan, one user-keyed window."""
    p = plan(q("q_join_asof_fwd", spark, sf_dir))
    assert "Join" not in p, p
    assert "windowspecdefinition" in p


def test_tpch_q2_argmin_uses_window_group_limit(spark, sf_dir):
    """Q2's rn=1 argmin must plan as WindowGroupLimit (per-partition
    local minima kept before the shuffle) with broadcast dims and no
    nested loop."""
    p = plan(q("q_tpch_q2", spark, sf_dir))
    assert "WindowGroupLimit" in p
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_tpch_q4_semi_join_keeps_equi_key(spark, sf_dir):
    """Q4's EXISTS carries a non-equi residual (shipdate vs orderdate),
    but the semi join must still hash on the l_orderkey equi key —
    never degrade to a nested loop over the residual."""
    p = plan(q("q_tpch_q4", spark, sf_dir))
    assert "LeftSemi" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_tpch_q6_pushes_all_predicates(spark, sf_dir):
    p = plan(q("q_tpch_q6", spark, sf_dir))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    for frag in ("l_shipdate", "l_discount", "LessThan(l_quantity"):
        assert frag in pushed, pushed


def test_tpch_q8_single_shuffled_join(spark, sf_dir):
    """Q8's six-hop snowflake: every dimension broadcasts — the only
    shuffle exchanges belong to lineitem⋈orders and the final
    aggregate."""
    p = plan(q("q_tpch_q8", spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q16_blacklist_is_broadcast_anti(spark, sf_dir):
    p = plan(q("q_tpch_q16", spark, sf_dir))
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p


def test_sample_reservoir_uses_window_group_limit(spark, sf_dir):
    """The deterministic sampler must keep only local top-k per
    partition before the shuffle — the WindowGroupLimit path."""
    p = plan(q("q_sample_reservoir", spark, sf_dir))
    assert "WindowGroupLimit" in p


def test_corr_and_cuped_single_aggregate_pass(spark, sf_dir):
    """Moment-sum analytics: partial+final hash aggregate, no window,
    no cartesian — the whole query is one shuffle plus scalar math."""
    for qid in ("q_corr_pearson",):
        p = plan(q(qid, spark, sf_dir))
        assert "HashAggregate" in p and "partial" in p.lower(), qid
        assert "Window" not in p, qid
        assert "CartesianProduct" not in p, qid


def test_vocab_growth_prefix_sum_is_range_partitioned(spark, sf_dir):
    """The Heaps-law running sum must use the two-pass range-partition
    + offsets form: any window over doc-grain rows must be partitioned
    (by pid), never a global unpartitioned sort of the data."""
    p = plan(q("q_text_vocab_growth", spark, sf_dir), "extended")
    assert "REPARTITION_BY_NUM" in p or "RepartitionByExpression" in p
    phys = plan(q("q_text_vocab_growth", spark, sf_dir))
    # the only unpartitioned window is over the per-partition totals
    # (pid grain); the doc-grain window is partitioned by pid
    assert "windowspecdefinition(pid" in phys.lower() or "pid" in phys


def test_ts_gap_fill_has_no_grid_join(spark, sf_dir):
    """The observation-pair rewrite: gap rows are generated, never
    joined — the resample/interpolate plans contain NO join at all
    (explode + window over observation grain only)."""
    for qid in ("q_ts_resample", "q_ts_interpolate"):
        p = plan(q(qid, spark, sf_dir))
        for frag in ("SortMergeJoin", "BroadcastHashJoin",
                     "ShuffledHashJoin", "CartesianProduct"):
            assert frag not in p, (qid, frag)
        assert "Generate" in p, qid  # the explode is the amplifier


# Benign BroadcastNestedLoopJoin users: either a DECLARED tiny cross
# product (q_join_cross: 5×25) or the keyless broadcast of a 1-row
# scalar aggregate (totals, thresholds, global stats) into a big side —
# a 1-row nested loop is a map-side constant, not a scale risk.
_BNLJ_OK = {
    "q_abtest_ztest", "q_basket_pairs", "q_bm25", "q_cuped",
    "q_dedup_cluster_stats", "q_funnel_ttc", "q_hist_equiwidth",
    "q_join_cross", "q_mixture_weights", "q_rel_division",
    "q_text_cooccur", "q_text_tfidf", "q_tile_neighbors",
    "q_topk_heavy_hitters", "q_tpch_q11", "q_tpch_q22", "q_win_share",
    # round 4: 24-row offsets dim (knn), 1-row global stats (target
    # encode), four 1-row cells (diff-in-diff), |sources|-row sketch
    # pairing (sketch_overlap: 5x5 inequality join of 64-col sketches)
    "q_tile_knn", "q_target_encode", "q_diff_in_diff",
    "q_sketch_overlap", "q_drift_chi2",
    # compose q_bm25, inheriting its whitelisted 1-row corpus-stats
    # broadcast (N, avgdl) — the only BNLJ in either plan
    "q_hybrid_rrf", "q_context_pack",
    # two 1-row broadcast crosses (totals → hot-key filter → final row)
    "q_join_skew_profile",
}
# Python UDTFs execute via BatchEvalPythonUDTF — the API's execution
# mode, declared once here; everything else must stay Arrow-vectorized.
_ROW_PYTHON_OK = {"q_udtf", "q_udtf_analyze"}
# Unpartitioned Window specs ("Moving all data to a single partition"):
# NO exemptions remain. The former allowlist (post-top-k rank windows,
# calendar-grain day series, q_skyline's frontier pass — all bounded by
# construction) now uses bounded_window_key() (operators/windows.py):
# a constant non-foldable partition key, same single-partition physical
# shape, no WindowExec warning. The pid-histogram windows of the
# two-pass global-rank/sweep pattern use pid_hist_window() likewise.
# Any qid tripping this check is a single-reducer sort over
# data-proportional rows — the exact regression class rounds 5/6
# rewrote away — OR a bounded frame that should say so via
# bounded_window_key.
_SINGLETON_WINDOW_OK: set[str] = set()

# bounded_window_key / pid_hist_window REGISTERED CALL SITES.
# Those helpers deliberately silence both Spark's 'No Partition
# Defined' warning and the singleton-window sweep above, so the sweep
# alone can no longer catch a data-proportional single-reducer window
# disguised behind them. This registry closes that hole: every call
# site, keyed (module-relative path, enclosing function), must appear
# here WITH a one-line proof of why its input is bounded. A new call
# site fails test_bounded_window_call_sites_are_registered until its
# boundedness argument is written down and reviewed.
_BOUNDED_WINDOW_SITES: dict[tuple[str, str], object] = {
    # value: one-line boundedness proof, or (proof, n_calls) when the
    # function legitimately makes more than one helper call
    ("tile_etl_spark/llm/similarity.py", "q_hybrid_rrf"):
        "rank window over the union of two fixed top-K retrieval lists"
        " (≤ 2·SIM_TOPK rows by construction)",
    ("tile_etl_spark/llm/similarity.py", "q_context_pack"):
        "running token sum over q_hybrid_rrf's fused list (≤ 2·SIM_TOPK"
        " rows)",
    ("tile_etl_spark/operators/analytics.py", "q_skyline"):
        "second frontier pass runs on per-partition skyline survivors"
        " only (local prune first; survivors ≤ skyline size × n_parts)",
    ("tile_etl_spark/operators/analytics.py", "q_dq_partition_stats"):
        "calendar-day grain: one row per event date after groupBy,"
        " bounded by the time domain, not data volume",
    ("tile_etl_spark/operators/analytics.py", "q_cumulative_uniques"):
        "calendar-day grain: one row per first-seen date after groupBy",
    ("tile_etl_spark/operators/sessionize.py", "q_session_paths"):
        "rank window runs AFTER .limit(PATH_TOPK)"
        " (TakeOrderedAndProject), over ≤ PATH_TOPK rows",
    ("tile_etl_spark/llm/text.py", "q_bm25"):
        "rank window runs AFTER .limit(_BM25_TOPK), over ≤ _BM25_TOPK"
        " rows",
    ("tile_etl_spark/operators/windows.py", "global_rank"): (
        "pid histogram: one row per input partition (≤ n_parts); two"
        " frame variants (preceding-offset + full) of the same window",
        2,
    ),
    ("tile_etl_spark/operators/windows.py", "q_win_ntile"): (
        "pid histogram of the range-partitioned block (≤ n_parts rows);"
        " two frame variants of the same window",
        2,
    ),
    ("tile_etl_spark/operators/analytics.py", "q_hist_equidepth"): (
        "pid histogram of the range-partitioned block (≤ n_parts rows);"
        " two frame variants of the same window",
        2,
    ),
    ("tile_etl_spark/operators/analytics.py", "q_peak_concurrency"):
        "pid histogram of the range-partitioned block (≤ n_parts rows)",
    ("tile_etl_spark/llm/text.py", "q_text_vocab_growth"):
        "pid histogram of the range-partitioned block (≤ n_parts rows)",
}


def test_bounded_window_call_sites_are_registered():
    """Every bounded_window_key()/pid_hist_window() call site in the
    source tree must be registered in _BOUNDED_WINDOW_SITES with a
    non-empty boundedness justification — the helpers suppress the
    single-reducer-window warning AND the plan sweep, so an
    unregistered call site is an unreviewed scale claim.

    AST-based (not line regex): mentions in comments/docstrings don't
    create phantom sites, calls inside class methods or nested helpers
    attribute to their real innermost enclosing function, and the call
    COUNT per site is enforced — a second call added to an
    already-registered function needs a fresh boundedness proof (bump
    the count in the registry value), it can't ride the old one."""
    import ast
    import os
    from collections import Counter

    _HELPERS = {"bounded_window_key", "pid_hist_window"}
    root = os.path.join(os.path.dirname(__file__), "..")
    found: Counter[tuple[str, str]] = Counter()

    class _CallScan(ast.NodeVisitor):
        def __init__(self, rel: str) -> None:
            self._rel = rel
            self._stack: list[str] = []

        def visit_FunctionDef(self, node: ast.AST) -> None:
            self._stack.append(node.name)
            self.generic_visit(node)
            self._stack.pop()

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_Call(self, node: ast.Call) -> None:
            fn = node.func
            name = (
                fn.id
                if isinstance(fn, ast.Name)
                else fn.attr if isinstance(fn, ast.Attribute) else None
            )
            if name in _HELPERS:
                enclosing = self._stack[-1] if self._stack else "<module>"
                found[(self._rel, enclosing)] += 1
            self.generic_visit(node)

    for dirpath, _dirs, files in os.walk(
        os.path.join(root, "tile_etl_spark")
    ):
        if "__pycache__" in dirpath:
            continue
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, root)
            tree = ast.parse(open(path).read(), filename=rel)
            _CallScan(rel).visit(tree)

    # registry values: a proof string (1 call), or (proof, count)
    registered = {
        site: v[1] if isinstance(v, tuple) else 1
        for site, v in _BOUNDED_WINDOW_SITES.items()
    }
    assert dict(found) == registered, {
        "unregistered or count-changed (add/update with a boundedness"
        " proof)": {
            s: c for s, c in found.items() if registered.get(s) != c
        },
        "stale (remove)": sorted(set(registered) - set(found)),
    }
    for v in _BOUNDED_WINDOW_SITES.values():
        text = v[0] if isinstance(v, tuple) else v
        assert text.strip()


def _unpartitioned_window_specs(p: str) -> list[str]:
    """windowspecdefinition(...) occurrences whose first top-level arg
    is a sort item or the frame — i.e. no partition columns. (Physical
    WindowExec with an empty partitionSpec is what triggers Spark's
    'Moving all data to a single partition' warning.)"""
    import re

    out = []
    for m in re.finditer(r"windowspecdefinition\(", p):
        i, depth, arg = m.end(), 1, ""
        while depth and i < len(p):
            c = p[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            if depth == 1 and c == ",":
                break
            if depth:
                arg += c
            i += 1
        a = arg.strip()
        if a.startswith("specifiedwindowframe") or " ASC" in a or " DESC" in a:
            out.append(a[:60])
    return out
# Builders with eager side effects (streaming runs, sink writes,
# multi-job iterative drivers) — their plan shapes are pinned by their
# own dedicated tests; re-running them here would re-execute the work.
_SWEEP_SKIP_PREFIX = ("s_",)
_SWEEP_SKIP = {
    "sink_objectstore", "sink_parquet", "sink_compact", "q_tile_etl_e2e",
}


def test_registry_wide_plan_antipatterns(spark, sf_dir):
    """EVERY registered batch qid is scanned for the two silent
    scale-killers: CartesianProduct (nothing may plan one — even the
    declared cross join broadcasts) and row-at-a-time Python
    (BatchEvalPython outside the UDTF API). BroadcastNestedLoopJoin is
    allowed only for the whitelisted 1-row-broadcast/declared-tiny
    cases. A new operator that trips this must justify itself here."""
    offenders = {}
    for qid, fn in sorted(registry.QUERIES.items()):
        if qid.startswith(_SWEEP_SKIP_PREFIX) or qid in _SWEEP_SKIP:
            continue
        p = plan(fn(spark, sf_dir))
        if "CartesianProduct" in p:
            offenders.setdefault("cartesian", []).append(qid)
        if "BatchEvalPython" in p and qid not in _ROW_PYTHON_OK:
            offenders.setdefault("row_python", []).append(qid)
        if "BroadcastNestedLoopJoin" in p and qid not in _BNLJ_OK:
            offenders.setdefault("bnlj", []).append(qid)
        if (
            qid not in _SINGLETON_WINDOW_OK
            and _unpartitioned_window_specs(p)
        ):
            offenders.setdefault("singleton_window", []).append(qid)
    assert not offenders, offenders


def test_join_hint_is_honored(spark, sf_dir):
    """The SHUFFLE_HASH hint must override the default broadcast
    choice — the plan contains ShuffledHashJoin, not BroadcastHashJoin."""
    p = plan(q("q_join_hints", spark, sf_dir))
    assert "ShuffledHashJoin" in p
    assert "BroadcastHashJoin" not in p


def test_pipe_sql_and_sql_udf_desugar_to_plain_plans(spark, sf_dir):
    """The Spark-4 sugar surfaces (pipe syntax, SQL UDFs) must leave NO
    runtime trace: their physical plans are ordinary scan→partial/final
    hash-aggregate pipelines — no Python eval, no extra exchanges, and
    the SQL-UDF call is inlined (no UDF node survives analysis)."""
    for qid in ("q_pipe_sql", "q_sql_udf", "q_param_sql"):
        p = plan(q(qid, spark, sf_dir))
        assert "HashAggregate" in p, qid
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, qid
        assert p.count("Exchange") <= 2, (qid, p.count("Exchange"))


def test_param_sql_binds_push_down(spark, sf_dir):
    """Bound named parameters must reach the parquet scan as pushed
    filters, exactly like hand-written literals."""
    p = plan(q("q_param_sql", spark, sf_dir))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    assert "o_orderdate" in pushed and "o_orderstatus" in pushed, pushed


def test_sample_weighted_uses_window_group_limit(spark, sf_dir):
    """The E-S weighted sample must rank-prune per partition BEFORE the
    shuffle (WindowGroupLimit), like q_sample_reservoir."""
    p = plan(q("q_sample_weighted", spark, sf_dir))
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_tpch_q21_quantifiers_are_semi_and_anti_joins(spark, sf_dir):
    """Q21's double correlated quantifier must decorrelate into one
    LeftSemi and one LeftAnti hash/sort join on the order key — never a
    nested-loop re-evaluation."""
    p = plan(q("q_tpch_q21", spark, sf_dir))
    assert "LeftSemi" in p and "LeftAnti" in p, p[:2000]
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_url_funcs_single_scan_no_exchange(spark, sf_dir):
    """URL parsing is a pure per-row projection: one scan, zero
    exchanges, zero Python."""
    p = plan(q("q_url_funcs", spark, sf_dir))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_epoch_shuffle_window_is_shard_partitioned(spark, sf_dir):
    """The per-shard position window must partition by (epoch, shard) —
    an unpartitioned window here would globally sort the corpus, the
    exact thing the epoch-shuffle design avoids."""
    p = plan(q("q_epoch_shuffle", spark, sf_dir)).lower()
    assert "windowspecdefinition(epoch" in p, p
    assert "cartesianproduct" not in p


def test_dedup_incremental_no_cartesian_hash_keyed_join(spark, sf_dir):
    """Candidate generation must be the shingle-hash equi-join (new
    batch vs index), never a nested-loop/cartesian pair enumeration."""
    p = plan(q("q_dedup_incremental", spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the intersection join is keyed on the 64-bit shingle hash
    assert "xxhash64" in p.lower()


def test_hybrid_rrf_fuses_bounded_lists(spark, sf_dir):
    """Both input lists are rank-limited (WindowGroupLimit / top-k
    filter) BEFORE fusion, so the fusion join and final window see at
    most 2k rows; the only nested-loop join allowed is the 1-row
    broadcast of BM25's corpus stats."""
    p = plan(q("q_hybrid_rrf", spark, sf_dir))
    assert "CartesianProduct" not in p
    # dense list: per-probe rank limit pushed into the window
    assert "WindowGroupLimit" in p, p
