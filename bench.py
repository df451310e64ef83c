#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line ``{"metric", "value", "unit", "queries", "sf"}``. Each query
is forced end-to-end with the noop sink (full computation, no driver
collect)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tile_etl_spark import registry  # noqa: E402
from tile_etl_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family; anything unregistered yet is
# skipped so the bench stays runnable every round.
HEADLINE = [
    # tile-ETL core (reference parity)
    "q_tile_grid",
    "q_tile_stats",
    "sink_objectstore",
    # scans + filters
    "q_scan_pushdown",
    "q_filter_range",
    # joins
    "q_join_inner",
    "q_join_broadcast",
    "q_join_interval",
    "q_join_asof",
    # aggregation + windows + top-k
    "q_agg_group",
    "q_agg_rollup",
    "q_win_rank",
    "q_topk_per_group",
    "q_sessionize",
    "q_window_tumbling",
    # reshape + UDF surface
    "q_pivot",
    "q_udf_scalar",
    "q_udaf_grouped",
    # LLM-pipeline
    "q_dedup_exact",
    "q_dedup_near",
    "q_dedup_embed",
    "q_sim_cosine_topk",
    "q_text_tfidf",
    "q_text_fingerprint",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# The driver-registered fixture tables; shared by the DuckDB twin
# harness here, tools/scale_trend.py, and tools/make_scale_fixtures.py
# so a fixture-set change lands in one place.
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def measure_floor(spark, runs: int) -> float:
    """Fixed-cost FLOOR probe (VERDICT r8 #2): the wall of a near-empty
    job through the same force() path — job submission, one stage of
    scheduling, noop commit protocol, Py4J round trips. Every ratio
    pairs a Spark wall that contains this floor against an in-process
    DuckDB run that has none; callers record both the raw ratio and
    ratio_floor_adjusted = (t_spark − floor)/t_duck. Measured
    identically to the qids (best of `runs` after one untimed warm)."""
    force(spark.range(1).toDF("x"))
    floor = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        force(spark.range(1).toDF("x"))
        floor = min(floor, time.perf_counter() - t0)
    return round(floor, 4)


def duck_views(con, sf_dir: str) -> None:
    """Register every fixture table present in sf_dir as a DuckDB view,
    mirroring the driver's oracle harness."""
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )


# Round-4 additions, timed separately so the headline total stays
# comparable across rounds (same 24-query set since r1). Spark + DuckDB
# twins both recorded; merged into the same ratios dict.
EXTRA = [
    "q_join_bloom",
    "q_hist_equiwidth",
    "q_hist_equidepth",
    "q_topk_heavy_hitters",
    "q_ts_rollup",
    "q_ts_resample",
    "q_ts_interpolate",
    "q_text_inverted_index",
    "q_text_cooccur",
    "q_dedup_contain",
    "q_embed_centroids",
    "q_win_islands",
    "q_tile_point_lookup",
    "s_foreachbatch",
    # round-5 additions
    "q_embed_knn_graph",
    "q_attribution",
    "q_agg_bitmap_distinct",
    "q_skyline",
    "q_calendar_fill",
    "q_bm25",
    "q_lm_doc_score",
    "q_text_boilerplate",
    "q_feature_hash",
    "q_session_paths",
    "q_tpch_q7",
    "q_tpch_q12",
    "q_tpch_q14",
    "q_tpch_q19",
    "q_join_asof_fwd",
    "q_rfm_segments",
    "q_tile_sync_delta",
    "q_tile_pyramid",
    # round-6 additions
    "q_tpch_q9",
    "q_tpch_q13",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q22",
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
    "q_variant_funcs",
    "q_delete_propagate",
    "sink_compact",
    "q_tile_haversine",
    "q_ivm_join",
    "q_table_profile",
    # round-7 additions
    "q_tpch_q21",
    "q_sql_udf",
    "q_pipe_sql",
    "q_param_sql",
    "q_collation",
    "q_url_funcs",
    "q_sample_weighted",
    "q_graph_bfs",
    "q_ts_seasonal_decompose",
    "s_tile_ingest",
    "q_dedup_url",
    "q_rolling_distinct",
    "q_scd2_snapshot",
    "q_cdc_apply",
    "src_python_ds_stream",
    "q_observe_metrics",
    "q_multimodal_pngmeta",
    "sink_partition_overwrite",
    "q_text_compress_ratio",
    # driver-round-4 additions
    "q_tile_quadkey",
    "q_dedup_semantic",
    "q_quality_model",
    "q_dedup_segments",
    "q_multimodal_wavmeta",
    "q_agg_countmin",
    "q_agg_bloom_portable",
    "q_tile_knn",
    "q_embed_pq",
    "q_sim_ann_pq",
    "q_text_lang_confusion",
    "q_target_encode",
    "q_join_setsim",
    "q_ts_changepoint",
    "q_win_regression",
    "q_diff_in_diff",
    "q_session_native",
    "q_pareto",
    "q_ts_ohlc",
    "q_sketch_overlap",
    "q_drift_chi2",
    "q_hybrid_rrf",
    "q_epoch_shuffle",
    "q_dedup_incremental",
    "q_embed_truncation_eval",
    "q_dedup_source_matrix",
    "q_quality_agreement",
    "q_embed_quality",
    "q_source_yield",
    "q_shingle_novelty",
    "q_context_pack",
    "q_mixture_interleave",
    "q_pack_efficiency",
    "q_tile_storage_plan",
    "q_agg_weighted_median",
    "q_text_hapax",
    "q_ts_gap_stats",
    "q_join_skew_profile",
    # round-6 rewrite coverage: the two-pass global-rank/sweep rewrites
    "q_peak_concurrency",
    "q_cumulative_uniques",
    # round-8 additions (lakehouse ops + governance)
    "q_merge_audit",
    "q_table_changes",
    "q_kanon_audit",
    "q_table_checksum",
]


# Ratio classes (VERDICT r7 ask #7): a Spark/DuckDB wall ratio is only
# a meaningful gate for qids where both engines do equivalent work.
#  - "sink": the Spark side writes data out (distributed PUT / parquet
#    / compaction); the DuckDB twin only recomputes final status rows.
#  - "stream_twin": the Spark side runs the streaming engine
#    (micro-batch planning, state stores, offset tracking); the twin
#    recomputes final state as one batch query.
#  - "artifact_cached": the timed region reads a persisted derived
#    artifact (the lakehouse tile inventory) while the twin regenerates
#    from scratch each run — the engine's real serving path, but not an
#    execution-speed comparison. The honest derivation cost is the
#    qid's cold_queries entry (first build of the round, timed).
#  - "asymmetric_twin" (r9, VERDICT r8 #4): the DuckDB oracle does
#    STRUCTURALLY LESS WORK than the Spark side — the multimodal
#    header qids build AND parse real binary WAV/PNG headers in Spark
#    while the twin derives the same metadata arithmetically, never
#    touching bytes. The ratio is not a performance signal either way;
#    absolute walls stay recorded.
#  - "fair": everything else; the ≤2x gate applies.
# r9 audit (VERDICT r8 #4): q_tile_sync_delta joined artifact_cached —
# its warm Spark run reads the persisted tile inventory (tiles/grid.py
# memo) on BOTH join sides while the twin regenerates the grid per
# run, the same property as q_tile_grid/q_tile_stats. q_embed_quality
# audited and kept FAIR: both engines fold the full embedding arrays
# (list_dot_product vs zip_with/aggregate) — the gap is Spark's
# interpreted HOF fold, a real execution-speed signal.
# q_dedup_near enters the ratio set in r9 (its verified output gained
# an exact oracle): its warm run reads the persisted shingle/LSH
# artifacts while the twin re-shingles and re-joins from scratch —
# artifact_cached by the same r8 rule; the honest derivation cost is
# its cold_queries entry.
_ARTIFACT_CACHED = {
    "q_tile_grid", "q_tile_stats", "q_tile_sync_delta", "q_dedup_near",
}
_ASYMMETRIC_TWIN = {"q_multimodal_wavmeta", "q_multimodal_pngmeta"}


def ratio_class(qid: str) -> str:
    if qid.startswith("sink_"):
        return "sink"
    if qid.startswith(("s_", "src_python_ds_stream")):
        return "stream_twin"
    if qid in _ARTIFACT_CACHED:
        return "artifact_cached"
    if qid in _ASYMMETRIC_TWIN:
        return "asymmetric_twin"
    return "fair"


def _loadavg() -> list[float]:
    """1/5/15-min load averages — recorded in the bench output because
    this box shows ambient load bursts (1-min load 4-9 with zero of our
    processes running; r5's driver record was ~+21% vs the committed
    record for exactly this reason). A record taken at load ≳ 2 should
    be read with that context."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


QUIET_THRESHOLD = 4.0  # 1-min loadavg gate (BASELINE.md protocol row)


def _wait_for_quiet(max_wait_s: int,
                    threshold: float = QUIET_THRESHOLD) -> tuple[float, bool]:
    """Bounded wait for the 1-min load to drop under ``threshold``
    before the timed region starts. This box shows ambient load bursts
    (BASELINE.md: ±13% r8 band attributed to them with per-run loadavg
    evidence); the OFFICIAL r9 record started at loadavg 13-17 and
    overstated the wall by ~30% vs the quiet band — VERDICT r9 #2 made
    this an enforced gate. The wait is still BOUNDED — worst case we
    run anyway — but the record now carries ``load_gated``: True means
    the timed region started quiet; False flags the record as
    load-contaminated so round-over-round comparisons can discount it.
    Returns (seconds waited, load_gated)."""
    t0 = time.perf_counter()
    deadline = t0 + max_wait_s
    while True:
        la = _loadavg()
        if not la or la[0] < threshold:
            return round(time.perf_counter() - t0, 1), True
        if time.perf_counter() >= deadline:
            return round(time.perf_counter() - t0, 1), False
        time.sleep(5)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # opt out with SPARK_GRAFT_QUIET_WAIT=0; default 600 s cap (the r9
    # 120 s cap ran out mid-burst and produced the contaminated record)
    quiet_wait = int(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "600"))
    if quiet_wait > 0:
        waited, load_gated = _wait_for_quiet(quiet_wait)
    else:
        la = _loadavg()
        waited, load_gated = 0.0, bool(not la or la[0] < QUIET_THRESHOLD)
    load_start = _loadavg()

    registry.load_all()
    qids = [q for q in HEADLINE if q in registry.QUERIES]
    extra_qids = [q for q in EXTRA if q in registry.QUERIES]

    # Size the shuffle width to the benchmark's data volume: at sf≤0.2
    # every shuffle stage moves at most a few MB, and 32 reduce tasks
    # cost more in scheduler overhead than they buy in parallelism
    # (measured on the 8 floor-dominated headline qids: 32→8 partitions
    # shaves ~10% wall; AQE still coalesces/splits adaptively on top).
    # A real deployment uses cluster_conf()'s 2000 + 128MB advisory.
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE")
    if shuffle is None and sf is not None and sf <= 0.2:
        shuffle = "8"
    # Small-input fast path: AQE's per-exchange driver barrier (runtime
    # stats collection + re-planning) costs ~50-150 ms/stage and buys
    # nothing when every shuffle carries KBs. Measured A/B on the full
    # 24-query headline set at sf0.1: 11.1 s → 8.1 s (-27%), with only
    # q_text_tfidf/q_text_fingerprint mildly slower (+15%) and no
    # correctness dependence (plan tests run AQE-on). cluster_conf()
    # keeps AQE on — at real scale the re-plan pays for itself.
    aqe = os.environ.get("SPARK_GRAFT_AQE")
    if aqe is None and sf is not None and sf <= 0.2:
        aqe = "false"
    spark = get_spark(app_name="tile-etl-spark-bench",
                      shuffle_partitions=shuffle, adaptive=aqe)
    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not session bootstrap.
    force(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))

    # Explicit setup step (ADVICE r7): the custkey-bucketed orders copy
    # that gives q_topk_per_group its zero-exchange plan is an ingest
    # artifact, not a query side effect — build it (or detect its
    # absence) here, before any warm/timed pass, and record which path
    # the timed query actually takes.
    from tile_etl_spark.operators.bucketed import orders_by_custkey

    topk_path = (
        "bucketed"
        if orders_by_custkey(spark, sf_dir) is not None
        else "plain_view"
    )

    # Warm pass: run every headline qid once, timed as its COLD build.
    # Fingerprinted artifact caches (tile fixtures, MinHash signatures,
    # IVF index) rebuild when source mtimes change — BENCH_r02 showed
    # that rebuild landing inside the timed window inflates
    # q_tile_stats / sink_objectstore by 2-3×. The warm pass pays all
    # one-time builds (plus whole-stage-codegen compile) before any
    # warm clock starts; its per-qid wall is recorded as cold_queries
    # in BENCH_FULL.json (ADVICE r7: warm-run numbers alone hide what a
    # first run costs — tile-inventory derivation, LSH candidate
    # build, plan construction).
    cold_times: dict[str, float] = {}
    for qid in qids + extra_qids:
        try:
            t0 = time.perf_counter()
            force(registry.QUERIES[qid](spark, sf_dir))
            cold_times[qid] = round(time.perf_counter() - t0, 4)
        except Exception as ex:  # keep the bench runnable every round
            print(f"WARM ERROR {qid}: {str(ex)[:120]}", file=sys.stderr)

    # BASELINE.md protocol: warm-cache timing — run each query N times,
    # report the fastest (a long-lived cluster amortizes one-time costs).
    # Best-of-3: this box shows ~1.6× whole-run noise windows (periodic
    # harness ticks); with 3 runs at least one lands clean.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    # Floor probe: see measure_floor — the gate is reported both raw
    # and floor-adjusted.
    floor = measure_floor(spark, runs)
    # Timed region: per-qid CONSECUTIVE best-of-N, the r2-r9 protocol.
    # (A full-pass restructure was tried for the r10 band and measured
    # 2-3x slower across the board: interleaving 130 distinct plans
    # between repeats thrashes the whole-stage-codegen compilation
    # cache, so every "warm" run recompiled. Consecutive repeats are
    # the honest warm number; the cache is also raised in
    # session.get_spark.) The per-run times are kept per column so the
    # BAND (VERDICT r9 #6) derives from the same work: pass_i = sum
    # over headline qids of each qid's i-th consecutive run — the
    # six-run-style band now rides in the primary artifact instead of
    # BASELINE.md prose. Raise SPARK_GRAFT_BENCH_RUNS for a wider band.
    run_times: dict[str, list[float]] = {}
    times: dict[str, float] = {}
    extra_times: dict[str, float] = {}
    for qid in qids + extra_qids:
        if qid not in cold_times:
            continue  # cold run errored; don't abort the whole bench
        fn = registry.QUERIES[qid]
        rs: list[float] = []
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                rs.append(time.perf_counter() - t0)
        except Exception as ex:  # keep the bench runnable every round
            print(f"TIMED ERROR {qid}: {str(ex)[:120]}", file=sys.stderr)
            continue
        run_times[qid] = rs
        (times if qid in qids else extra_times)[qid] = round(min(rs), 4)
    pass_walls = [
        round(sum(run_times[q][i] for q in qids if q in run_times), 4)
        for i in range(runs)
    ]
    walls = sorted(pass_walls)
    band = {
        "n": len(walls),
        "min": walls[0],
        "median": walls[len(walls) // 2],
        "max": walls[-1],
        "passes": pass_walls,
        "note": "pass_i = sum over headline qids of each qid's i-th "
        "consecutive run; 'value' remains sum of per-qid best-of-n. "
        "pass_1 may carry residual first-run effects (codegen, "
        "artifact cache fill) the later passes don't.",
    }

    # DuckDB side of the BASELINE gate (Spark ≤ 2× DuckDB per qid):
    # time each headline qid's oracle twin on the same parquet so the
    # bench record carries the ratio, not just the Spark absolute.
    duck_times: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        duck_views(con, sf_dir)
        for qid in qids + extra_qids:
            sql = registry.ORACLES.get(qid)
            if not sql:
                continue  # B/R qid: no SQL twin; ratio omitted by design
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            duck_times[qid] = round(best, 4)
        con.close()
    except Exception as ex:
        print(f"DUCK ERROR: {str(ex)[:160]}", file=sys.stderr)

    total = round(sum(times.values()), 4)
    all_times = {**times, **extra_times}
    ratios = {
        q: round(all_times[q] / max(d, 1e-6), 2)
        for q, d in duck_times.items()
        if q in all_times
    }
    ratios_floor_adj = {
        q: round(max(all_times[q] - floor, 0.0) / max(d, 1e-6), 2)
        for q, d in duck_times.items()
        if q in all_times
    }
    classes = {q: ratio_class(q) for q in all_times}
    fair_head = [q for q in ratios if q in times and classes[q] == "fair"]
    fair_all = [q for q in ratios if classes[q] == "fair"]
    gate = {
        "fair_under_2x": sum(1 for q in fair_head if ratios[q] <= 2.0),
        "fair_total": len(fair_head),
        "excluded": sorted(
            q for q in ratios if q in times and classes[q] != "fair"
        ),
        "full_fair_under_2x": sum(1 for q in fair_all if ratios[q] <= 2.0),
        "full_fair_total": len(fair_all),
        "floor_sec": floor,
        "fair_under_2x_floor_adj": sum(
            1 for q in fair_head if ratios_floor_adj[q] <= 2.0
        ),
        "full_fair_under_2x_floor_adj": sum(
            1 for q in fair_all if ratios_floor_adj[q] <= 2.0
        ),
    }
    # Full record (extras + DuckDB twins + every ratio) goes to a FILE:
    # BENCH_r04.json lost its headline because the one print line grew
    # past the driver's stdout-tail capture. The final stdout line is now
    # capped to the 24-query headline set (~1.5 KB) so it always parses;
    # the complete dict lives next to it in BENCH_FULL.json.
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "extra_queries": extra_times,
        "cold_queries": cold_times,
        "duck_queries": duck_times,
        "ratios": ratios,
        "ratios_floor_adjusted": ratios_floor_adj,
        "floor_sec": floor,
        "band": band,
        "ratio_class": classes,
        "gate": gate,
        # no-silent-caps: a qid that errored out of the timed set is
        # named here, never just dropped from the totals
        "errored": sorted(set(qids + extra_qids) - set(all_times)),
        "topk_per_group_path": topk_path,
        "sf": sf,
        "quiet_wait_sec": waited,
        "load_gated": load_gated,
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
    }
    try:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_FULL.json")
        with open(out, "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError as ex:
        print(f"BENCH_FULL write failed: {ex}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "ratios": {q: r for q, r in ratios.items() if q in times},
                "gate": gate,
                "topk_per_group_path": topk_path,
                "full_record": "BENCH_FULL.json",
                "sf": sf,
                "band": {k: band[k] for k in ("n", "min", "median", "max")},
                "load_gated": load_gated,
                "loadavg": [load_start, _loadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
