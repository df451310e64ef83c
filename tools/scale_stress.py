#!/usr/bin/env python
"""Scale-stress harness — the reproducible version of the deep-pyramid
runs quoted in IMPLEMENTATION.md.

Two stresses, both pure compute (no fixtures beyond lineitem), sized
well past the bench's sf0.1 so plan pathologies that only appear under
fan-out (AQE starvation, single-task explodes, lineage blowup) have
room to show:

1. TILE PYRAMID: generate a levels 5..N grid (N=15 → ~11.2 M cells,
   ~300× the reference workload) and run the full A5→A8 pipeline over
   it — path codec, md5 content hash, per-level stats — printing cells/s
   and the task width actually used (the explicit-width repartition in
   tile_grid is the thing under test: AQE would coalesce a bare
   repartition to ONE task here).

2. FACT AMPLIFICATION: explode lineitem ×K (default 16 → ~9.6 M rows at
   sf0.1), then run the TPC-H Q1 aggregate and a broadcast dim join over
   the amplified fact — the partial+final agg and broadcast shapes must
   hold their throughput as volume grows, since at 100 TB these are the
   dominant plans.

3. NEAR-DUP DEDUP AMPLIFICATION: replicate documents ×K with a one-token
   salt per replica (each replica is a ~0.98-Jaccard near-dup of its
   siblings — K-sized true near-dup clusters, the adversarial case for
   LSH bucketing), then run the full MinHash(64) → LSH(16 bands) →
   exact-Jaccard-verify pipeline and report docs/s and verified pairs.
   The thing under test: candidate generation stays band-bucketed (never
   all-pairs) and the verify join's intersection-keyed shape holds as
   cluster size grows.

4. EMBEDDING GEMM AMPLIFICATION: replicate embeddings ×K and run the
   exact cosine top-k (broadcast probe matrix, Arrow GEMM, per-task
   partial top-k) over the amplified corpus — vectors/s must hold, since
   per-task output is bounded by probes × k regardless of corpus size.

5. TEXT PIPELINE AMPLIFICATION: the narrow per-row array paths
   (rolling-hash fingerprint, language-ID scoring) over the ×K corpus —
   docs/s must hold at ×K since nothing shuffles; a drop means
   projection-collapse re-inlining crept back or input parallelism was
   lost.

6. STREAMING THROUGHPUT: replay events ×K as 8 time-ordered chunks
   through a watermarked tumbling-window aggregate (availableNow,
   4 micro-batches) and report events/s THROUGH the streaming engine —
   micro-batch planning, state-store updates and all.

Usage: python tools/scale_stress.py [--max-level 15] [--amplify 16]
                                    [--dedup-amplify 8] [--emb-amplify 16]
                                    [--stream-amplify 8]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from tile_etl_spark.session import get_spark  # noqa: E402
from tile_etl_spark.tiles.grid import (  # noqa: E402
    object_key_col,
    src_path_col,
    tile_grid,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-level", type=int, default=15)
    ap.add_argument("--amplify", type=int, default=16)
    ap.add_argument("--dedup-amplify", type=int, default=8)
    ap.add_argument("--emb-amplify", type=int, default=16)
    ap.add_argument("--stream-amplify", type=int, default=8)
    ap.add_argument("--hot-events", type=int, default=20_000)
    ap.add_argument("--merge-amplify", type=int, default=640)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark(app_name="tile-etl-spark-scale-stress")
    out: dict = {"metric": "scale_stress"}

    print("[stress 1]", file=sys.stderr)
    # --- stress 1: deep tile pyramid ------------------------------------
    t0 = time.monotonic()
    grid = tile_grid(spark, levels=(5, args.max_level))
    n_cells = grid.count()
    out["grid_cells"] = n_cells
    out["grid_gen_s"] = round(time.monotonic() - t0, 3)
    out["grid_tasks"] = grid.rdd.getNumPartitions()

    t0 = time.monotonic()
    pipe = (
        grid.withColumn("src_path", src_path_col())
        .withColumn("object_key", object_key_col())
        .withColumn("content_md5", F.md5(F.col("src_path").cast("binary")))
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("object_key")).alias("key_bytes"),
            F.count_distinct(F.substring("content_md5", 1, 2)).alias(
                "md5_prefixes"
            ),
        )
    )
    pipe.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out["pipeline_s"] = round(dt, 3)
    out["cells_per_s"] = int(n_cells / dt)

    print("[stress 2]", file=sys.stderr)
    # --- stress 2: amplified fact table ---------------------------------
    li = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    # The fixture parquet is a single row group → a bare scan+explode
    # runs in ONE task (the exact pitfall the io.py re-layout fixes for
    # the qids). Numbered repartition BEFORE the amplifying explode so
    # the ×K fan-out happens across the cluster — same discipline as
    # tile_grid's explicit-width stripe repartition.
    width = spark.sparkContext.defaultParallelism * 2
    amp = li.repartition(width).withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(args.amplify)))
    )
    n_rows = li.count() * args.amplify
    out["fact_rows"] = n_rows

    t0 = time.monotonic()
    q1 = amp.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.sum(
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).cast("decimal(18,4)")
        ).alias("sum_disc_price"),
        F.avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("n"),
    )
    q1.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out["q1_s"] = round(dt, 3)
    out["q1_rows_per_s"] = int(n_rows / dt)

    t0 = time.monotonic()
    orders = spark.read.parquet(os.path.join(args.sf_dir, "orders.parquet"))
    j = (
        amp.join(
            F.broadcast(
                orders.where(F.col("o_orderstatus") == "O").select(
                    "o_orderkey", "o_orderpriority"
                )
            ),
            amp["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out["bjoin_s"] = round(dt, 3)
    out["bjoin_rows_per_s"] = int(n_rows / dt)

    print("[stress 3]", file=sys.stderr)
    # --- stress 3: near-dup dedup over an amplified corpus --------------
    from tile_etl_spark.llm.dedup import (
        exact_jaccard,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles_df,
    )
    from tile_etl_spark.session import ensure_session_determinism

    ensure_session_determinism(spark)
    kd = args.dedup_amplify
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    n_docs = docs.count() * kd
    amp_docs = (
        docs.repartition(width)
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(kd))))
        .select(
            (F.col("doc_id") * kd + F.col("rep") - 1).alias("doc_id"),
            # one-token salt: each replica is a ~0.98-Jaccard near-dup
            # of its siblings, so every K-clique is a TRUE positive the
            # pipeline must both find (LSH recall) and verify (exact
            # Jaccard >= 0.8)
            F.concat_ws(
                " ", "text", F.concat(F.lit("rep"), F.col("rep"))
            ).alias("text"),
            "lang",  # ground-truth passthrough for the langid stress
        )
    )
    t0 = time.monotonic()
    sh = shingles_df(amp_docs).persist()
    sigs = minhash_signatures(amp_docs, shingles=sh)
    cand = lsh_candidate_pairs(sigs).persist()
    verified = exact_jaccard(amp_docs, cand, shingles=sh).where(
        F.col("jaccard") >= 0.8
    )
    n_pairs = verified.count()
    dt = time.monotonic() - t0
    out["dedup_docs"] = n_docs
    out["dedup_pairs"] = n_pairs
    out["dedup_s"] = round(dt, 3)
    out["dedup_docs_per_s"] = int(n_docs / dt)

    print("[stress 3b]", file=sys.stderr)
    # --- stress 3b: the PRUNED verify path (the 100 TB plan) ------------
    # exact_jaccard's adaptive prune only engages when it builds the
    # shingles itself; force it here so the candidate semi-join +
    # re-shingle plan is exercised at amplified volume and shown
    # result-identical to the shared-shingles plan above.
    t0 = time.monotonic()
    pruned_pairs = (
        exact_jaccard(amp_docs, cand, prune=True)
        .where(F.col("jaccard") >= 0.8)
        .count()
    )
    dt = time.monotonic() - t0
    sh.unpersist()
    cand.unpersist()
    out["dedup_pruned_pairs"] = pruned_pairs
    out["dedup_pruned_s"] = round(dt, 3)
    out["dedup_pruned_match"] = bool(pruned_pairs == n_pairs)

    print("[stress 4]", file=sys.stderr)
    # --- stress 4: embedding GEMM over an amplified corpus --------------
    from tile_etl_spark.llm.similarity import cosine_topk

    ke = args.emb_amplify
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    n_vecs = emb.count() * ke
    amp_emb = (
        emb.repartition(width)
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(ke))))
        .select(
            (F.col("vec_id") * ke + F.col("rep") - 1).alias("vec_id"),
            "embedding",
        )
    )
    t0 = time.monotonic()
    topk = cosine_topk(amp_emb, amp_emb.where(F.col("vec_id") < 10))
    topk.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out["gemm_vecs"] = n_vecs
    out["gemm_s"] = round(dt, 3)
    out["gemm_vecs_per_s"] = int(n_vecs / dt)

    print("[stress 5]", file=sys.stderr)
    # --- stress 5: text-pipeline ops over the amplified corpus ----------
    # The per-row array paths (fingerprint, language-ID) must scale
    # linearly with docs — they are narrow expressions, so docs/s at ×K
    # should match 1×; a drop means projection-collapse re-inlining or
    # lost input parallelism. Both consume the same amp_docs as the
    # dedup stress (kd × corpus).
    from tile_etl_spark.llm.text import fingerprint_stats, langid_scored

    t0 = time.monotonic()
    fingerprint_stats(amp_docs).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.monotonic() - t0
    out["fp_docs_per_s"] = int(n_docs / dt)
    out["fp_s"] = round(dt, 3)

    t0 = time.monotonic()
    langid_scored(amp_docs).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out["langid_docs_per_s"] = int(n_docs / dt)
    out["langid_s"] = round(dt, 3)

    print("[stress 6]", file=sys.stderr)
    # --- stress 6: streaming micro-batch throughput ---------------------
    # Replay events ×K through a watermarked tumbling-window aggregate
    # (availableNow, 4 micro-batches). The number under test is
    # events/s THROUGH the streaming engine — state-store updates,
    # micro-batch planning and all — not the batch twin's throughput.
    import shutil as _shutil
    import uuid as _uuid

    from tile_etl_spark.streaming.replay import (
        EVENTS_SCHEMA,
        _art_root,
        _write_chunk,
        run_to_table,
    )

    ks = args.stream_amplify
    ev = spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
    n_events = ev.count() * ks
    base = os.path.join(_art_root(), "stress_stream_" + _uuid.uuid4().hex[:8])
    os.makedirs(base, exist_ok=True)
    amp_ev = (
        ev.repartition(width)
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(ks))))
        .select(
            (F.col("event_id") * ks + F.col("rep") - 1).alias("event_id"),
            "ts", "user_id", "event_type", "value", "props",
        )
    )
    n_chunks = 8
    for i in range(n_chunks):
        _write_chunk(
            amp_ev.where(F.pmod("event_id", F.lit(n_chunks)) == i), base, i
        )
    t0 = time.monotonic()
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(base + "/chunk_*.parquet")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
    )
    rows = run_to_table(agg, "update")
    n_out = rows.count()
    dt = time.monotonic() - t0
    _shutil.rmtree(base, ignore_errors=True)
    out["stream_events"] = n_events
    out["stream_out_rows"] = n_out
    out["stream_s"] = round(dt, 3)
    out["stream_events_per_s"] = int(n_events / dt)

    print("[stress 7]", file=sys.stderr)
    # --- stress 7: two-pass global rank at volume -----------------------
    # The round-6 rewrites (mixture interleave, RFM ntiles, equi-depth,
    # sweep-line) all stand on global_rank's range-partition +
    # broadcast-offset pattern. Rank the ×K amplified fact on a
    # near-uniform synthetic key and report rows/s; the plan must keep
    # every data-bearing window pid-partitioned (asserted, not eyeballed)
    # and the offset table stays n_parts rows regardless of volume.
    from tile_etl_spark import cache
    from tile_etl_spark.operators.windows import global_rank

    cache.scope("stress_global_rank")
    keyed = amp.select(
        (F.xxhash64("l_orderkey", "l_linenumber", "rep")).alias("k"),
        F.monotonically_increasing_id().alias("rid"),
    )
    t0 = time.monotonic()
    ranked = global_rank(keyed, [F.col("k").asc(), F.col("rid").asc()])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    for ln in plan.splitlines():
        if "Window" in ln and "k#" in ln:
            assert "pid" in ln, f"unpartitioned data window:\n{ln}"
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rn").alias("max_rn"),
        F.sum(F.col("rn").cast("double")).alias("rank_sum"),
    )
    row = agg.first()
    dt = time.monotonic() - t0
    assert row["n"] == row["max_rn"] == n_rows, (row, n_rows)
    # sum(1..n) — the ranks are exactly a permutation of 1..n
    assert row["rank_sum"] == n_rows * (n_rows + 1) / 2
    out["grank_rows"] = n_rows
    out["grank_s"] = round(dt, 3)
    out["grank_rows_per_s"] = int(n_rows / dt)

    print("[stress 8]", file=sys.stderr)
    # --- stress 8: two-level sweep line at volume ------------------------
    # q_peak_concurrency's shape (range-partition the ±1 boundary
    # stream, shard-local prefix sums, broadcast shard-total offsets)
    # against a synthetic interval set with a KNOWN peak: n_flat
    # pairwise-disjoint intervals (peak 1 each) plus n_hot intervals
    # covering the whole span — true peak = n_hot + 1 exactly. The
    # invariant is exact at any volume, so a wrong shard handoff or a
    # boundary-ordering bug surfaces as a hard assert, not a drift.
    from pyspark.sql import Window

    from tile_etl_spark.operators.windows import pid_hist_window

    cache.scope("stress_sweep")
    n_flat = n_rows  # reuse the xK fact volume
    n_hot = 1000
    flat = spark.range(n_flat).select(
        (F.col("id") * 2_000_000).alias("s"),
        (F.col("id") * 2_000_000 + 1_000_000).alias("t"),
    )
    hot = spark.range(n_hot).select(
        F.lit(0).cast("bigint").alias("s"),
        F.lit(n_flat * 2_000_000 + 1).cast("bigint").alias("t"),
    )
    spans = flat.unionByName(hot)
    deltas = spans.select(
        F.col("s").alias("us"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select((F.col("t") + 1).alias("us"), F.lit(-1).alias("delta"))
    )
    n_parts = spark.sparkContext.defaultParallelism
    t0 = time.monotonic()
    part = cache.persist_scoped(
        deltas.repartitionByRange(
            n_parts, F.col("us").asc(), F.col("delta").asc()
        ).withColumn("pid", F.spark_partition_id())
    )
    w_off = pid_hist_window().rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = (
        part.groupBy("pid")
        .agg(F.sum("delta").alias("dsum"))
        .select(
            "pid",
            F.coalesce(F.sum("dsum").over(w_off), F.lit(0)).alias("off"),
        )
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("us", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = (
        part.withColumn("lsum", F.sum("delta").over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select((F.col("off") + F.col("lsum")).alias("live"))
    )
    srow = sweep.agg(
        F.max("live").alias("peak"), F.count(F.lit(1)).alias("nb")
    ).first()
    dt = time.monotonic() - t0
    n_bound = 2 * (n_flat + n_hot)
    assert srow["nb"] == n_bound, (srow, n_bound)
    assert srow["peak"] == n_hot + 1, (srow["peak"], n_hot + 1)
    out["sweep_boundaries"] = n_bound
    out["sweep_s"] = round(dt, 3)
    out["sweep_rows_per_s"] = int(n_bound / dt)

    print("[stress 9]", file=sys.stderr)
    # --- stress 9: chained two-pass ntiles (the RFM shape) at volume -----
    # q_rfm_segments chains three independent global_rank→ntile passes;
    # here each pass runs over the xK fact on a distinct synthetic key
    # and the bucket histogram is checked EXACTLY: SQL ntile gives the
    # first n%b buckets ceil(n/b) rows and the rest floor(n/b).
    from tile_etl_spark.operators.windows import global_rank, ntile_from_rank

    n_buckets = 5
    base, rem = divmod(n_rows, n_buckets)
    expect = {
        b: base + 1 if b <= rem else base for b in range(1, n_buckets + 1)
    }
    t0 = time.monotonic()
    for salt in ("r", "f", "m"):
        cache.scope(f"stress_ntile_{salt}")
        keyed = amp.select(
            F.xxhash64(F.lit(salt), "l_orderkey", "l_linenumber", "rep")
            .alias("k"),
            F.monotonically_increasing_id().alias("rid"),
        )
        ranked = global_rank(keyed, [F.col("k").asc(), F.col("rid").asc()])
        hist = (
            ranked.select(
                ntile_from_rank(F.col("rn"), F.col("n"), n_buckets).alias(
                    "bucket"
                )
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        got = {int(r["bucket"]): r["cnt"] for r in hist}
        assert got == expect, (salt, got, expect)
    dt = time.monotonic() - t0
    out["ntile_chain_rows"] = 3 * n_rows
    out["ntile_chain_s"] = round(dt, 3)
    out["ntile_chain_rows_per_s"] = int(3 * n_rows / dt)

    print("[stress 10]", file=sys.stderr)
    # --- stress 10: hot-key interval window (VERDICT r7 #5) --------------
    # The q_join_interval range-frame rewrite buffers each event's
    # in-band forward neighbours via collect_list; a pathologically hot
    # (user, band) makes that frame O(m) per event. Worst case by
    # construction: ONE user, --hot-events events all inside a single
    # 5-minute band → output is exactly m*(m-1)/2 pairs, the same
    # cardinality the banding equi-join must produce (the blowup is the
    # JOIN RESULT, not the rewrite). Row-level equality at m=1500 is
    # pinned in tests/test_round8_pins.py; here the volume run checks
    # count + an order-insensitive pair checksum against the banding
    # helper and records pairs/s.
    from tile_etl_spark.operators.joins import (
        interval_self_join,
        interval_self_join_window,
    )

    cache.scope("stress_hot_interval")
    m = args.hot_events
    ev = spark.range(m).select(
        F.col("id").alias("event_id"),
        # pmod-anchored constant: a bare lit(7) user_id would be
        # constant-folded OUT of the window's PARTITION BY (the
        # bounded_window_key problem) and WindowExec would warn
        (F.pmod(F.col("id"), F.lit(1)) + 7).cast("bigint").alias("user_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 30).alias(
            "ts"
        ),
    )
    expect_pairs = m * (m - 1) // 2

    def pair_digest(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("user_id", "id1", "id2")).alias("cksum"),
        ).first()
        return r["n"], r["cksum"]

    t0 = time.monotonic()
    n_win, ck_win = pair_digest(interval_self_join_window(ev))
    dt = time.monotonic() - t0
    n_band, ck_band = pair_digest(interval_self_join(ev))
    assert n_win == expect_pairs, (n_win, expect_pairs)
    assert (n_win, ck_win) == (n_band, ck_band), "window != banding"
    out["hot_interval_events"] = m
    out["hot_interval_pairs"] = n_win
    out["hot_interval_s"] = round(dt, 3)
    out["hot_interval_pairs_per_s"] = int(n_win / dt)

    print("[stress 11]", file=sys.stderr)
    # --- stress 11: full-outer MERGE audit at volume ---------------------
    # Replicate customer xK with per-replica key offsets that preserve
    # every modulus the source derivation uses (OFFSET = 7,000,000 is a
    # multiple of lcm(7,10,20,50) = 700 and clears the +100000 new-key
    # branch), so each replica's merge behaves EXACTLY like the base
    # fixture and the amplified metrics must be K x the base metrics —
    # an exact invariant at any volume. The thing under test: the
    # source groupBy + full-outer key join + metrics aggregate hold
    # their shape and throughput as both merge sides grow.
    from tile_etl_spark.operators.workloads import merge_audit_metrics

    cache.scope("stress_merge")
    cust = spark.read.parquet(os.path.join(args.sf_dir, "customer.parquet"))
    k_m = args.merge_amplify
    base_rows = {
        r["action"]: (r["n_rows"], r["net_bal_delta"])
        for r in merge_audit_metrics(cust).collect()
    }
    # rep * 7M MUST be bigint arithmetic: as int32 it wraps silently at
    # replica 307 (307 x 7e6 > 2^31) in non-ANSI mode and the wrapped
    # offsets collide keys across replicas — caught because the exact
    # K-multiple invariant failed, which is what this stress is FOR.
    amp_c = (
        cust.repartition(width)
        .withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(k_m - 1)))
        )
        .select(
            (
                F.col("c_custkey")
                + F.col("rep").cast("bigint") * F.lit(7_000_000)
            ).alias("c_custkey"),
            "c_acctbal",
        )
    )
    t0 = time.monotonic()
    amp_rows = {
        r["action"]: (r["n_rows"], r["net_bal_delta"])
        for r in merge_audit_metrics(amp_c).collect()
    }
    dt = time.monotonic() - t0
    for act, (n, delta) in base_rows.items():
        an, ad = amp_rows[act]
        assert an == n * k_m, (act, an, n, k_m)
        if delta is not None:
            # relative tolerance: ad and delta*k_m are independently
            # rounded doubles of the same exact decimal — at sf>=1 the
            # amplified magnitude makes 1 ulp exceed an absolute 1e-6
            tol = max(1e-6, 4e-12 * abs(delta * k_m))
            assert abs(ad - delta * k_m) <= tol, (act, ad, delta, k_m)
    n_merge = cust.count() * k_m
    out["merge_rows"] = n_merge
    out["merge_s"] = round(dt, 3)
    out["merge_rows_per_s"] = int(n_merge / dt)
    cache.scope("stress_done")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
