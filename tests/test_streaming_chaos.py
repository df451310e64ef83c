"""Streaming chaos test (VERDICT r10 #6): the foreachBatch
exactly-once upsert sink under INJECTED mid-batch kills and
duplicate-epoch redelivery, in a REAL Structured Streaming run over
the full events fixture — the streaming mirror of
tests/test_http_sink_chaos.py's accounting rigor.

The existing coverage exercises the crash windows synthetically
(test_round8_pins.py drives ``upsert`` by hand on 3-row frames) and
clean restarts (test_streaming.py's checkpoint recovery). This test
closes the gap between them: the crashes happen INSIDE a live
``writeStream.foreachBatch`` query, the restarts go through Spark's
checkpoint/batch-id machinery (so the retried epoch arrives with the
same epoch id the engine assigns, not one the test invents), and the
accounting is exact — attempts per epoch, restarts, one version per
epoch, poison rows provably purged, final state hash-equal to the
one-shot batch twin.

Fault classes injected (scripted per (epoch, attempt), like the HTTP
chaos test's scripted 503s):
 - crash_after_write: epoch N's data is FULLY written to v{N}, then
   the batch fails before the checkpoint commits — the retry sees its
   own complete output and must rebuild from the strictly-below
   baseline (the classic double-apply window).
 - crash_before_write: the batch fails before touching the sink — the
   plain redelivery case.
 - poison_then_crash: a PARTIAL/bogus v{N} lands (marker row with an
   impossible user_id), then the batch fails — the retry must
   overwrite the poison, never merge it.
 - repeated crash: one epoch crashes on two consecutive attempts and
   only the third succeeds.
 - duplicate redelivery: an already-committed epoch's upsert is
   applied twice back-to-back (a redelivered-but-committed batch);
   the version's content must be byte-identical after the second
   apply.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

# The chaos run uses the largest fixture on disk so the per-batch
# merge is non-trivial (sf0.01: 8 chunks over the full events table),
# matching the sink chaos test's full-inventory discipline.
_CHAOS_SF = (
    "/root/testdata/sf0.01"
    if os.path.exists("/root/testdata/sf0.01/events.parquet")
    else os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
)

POISON_USER = 99_999_999  # impossible user_id marking partial writes
MAX_RESTARTS = 10


def test_foreachbatch_chaos_exactly_once(spark, tmp_path):
    from tile_etl_spark.io import load
    from tile_etl_spark.streaming.queries import make_upsert_sink
    from tile_etl_spark.streaming.replay import (
        EVENTS_SCHEMA,
        N_CHUNKS,
        replay_dir,
    )

    chunks = replay_dir(spark, _CHAOS_SF)
    base = str(tmp_path / "upsert")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(base)
    inner, versions = make_upsert_sink(spark, base)

    # fault script: (epoch, attempt) -> fault class. Epoch 5 crashes
    # twice (poison first, then a full-write crash) so redelivery is
    # exercised repeatedly on one epoch.
    faults = {
        (2, 1): "crash_after_write",
        (4, 1): "crash_before_write",
        (5, 1): "poison_then_crash",
        (5, 2): "crash_after_write",
    }
    duplicate_epochs = {1, 6}
    attempts: Counter[int] = Counter()

    def _rows(path):
        return sorted(map(tuple, spark.read.parquet(path).collect()))

    def chaotic(batch_df, epoch_id):
        epoch = int(epoch_id)
        attempts[epoch] += 1
        fault = faults.get((epoch, attempts[epoch]))
        if fault == "crash_before_write":
            raise RuntimeError(f"chaos: pre-write kill at epoch {epoch}")
        if fault == "poison_then_crash":
            # partial write: a bogus marker row lands at v{N}, then the
            # task dies — the retry must rebuild v{N} from the
            # strictly-below baseline, never from this junk.
            spark.createDataFrame(
                [(POISON_USER, -1.0, None, -1)],
                "user_id bigint, last_value double, "
                "last_ts timestamp, last_event_id bigint",
            ).write.mode("overwrite").parquet(
                os.path.join(base, f"v{epoch:05d}")
            )
            raise RuntimeError(f"chaos: mid-write kill at epoch {epoch}")
        inner(batch_df, epoch_id)
        if fault == "crash_after_write":
            # data committed, checkpoint not: the exactly-once window
            raise RuntimeError(f"chaos: post-write kill at epoch {epoch}")
        if epoch in duplicate_epochs:
            # duplicate redelivery of a committed epoch: re-applying
            # must leave the version's content identical
            before = _rows(os.path.join(base, f"v{epoch:05d}"))
            inner(batch_df, epoch_id)
            after = _rows(os.path.join(base, f"v{epoch:05d}"))
            assert after == before, f"duplicate apply mutated v{epoch}"

    def start():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks + "/chunk_*.parquet")
        )
        return (
            stream.writeStream.foreachBatch(chaotic)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    restarts = 0
    while True:
        q = start()
        try:
            q.awaitTermination()
            break
        except StreamingQueryException:
            restarts += 1
            assert restarts <= MAX_RESTARTS, (
                f"chaos run did not converge in {MAX_RESTARTS} restarts; "
                f"attempts={dict(attempts)}"
            )

    # --- accounting (the chaos test's point) ---
    # one restart per injected crash, no more
    n_crashes = len(faults)
    assert restarts == n_crashes, (restarts, n_crashes)
    # exactly one version per epoch, contiguous — no epoch lost, none
    # double-committed under a different id
    vs = versions()
    assert [os.path.basename(v) for v in vs] == [
        f"v{i:05d}" for i in range(N_CHUNKS)
    ]
    # per-epoch attempt counts match the script exactly: crashed
    # attempts + the one success; untouched epochs ran exactly once
    expected_attempts = Counter({e: 1 for e in range(N_CHUNKS)})
    for (epoch, _), _fault in faults.items():
        expected_attempts[epoch] += 1
    assert attempts == expected_attempts, (
        dict(attempts),
        dict(expected_attempts),
    )
    # the poison marker must be gone from the retried version and from
    # every later version (it never entered a merge baseline)
    for v in vs[5:]:
        assert (
            spark.read.parquet(v)
            .filter(F.col("user_id") == POISON_USER)
            .count()
            == 0
        ), f"poison row leaked into {v}"

    # --- final state == one-shot batch twin (hash-equal) ---
    key = F.struct("ts", "event_id")
    batch = (
        load(spark, _CHAOS_SF, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("value", key).alias("last_value"),
            F.max("ts").alias("last_ts"),
            F.max_by("event_id", key).alias("last_event_id"),
        )
    )
    assert _rows(vs[-1]) == sorted(map(tuple, batch.collect()))


@pytest.mark.parametrize("crash_epoch", [0])
def test_foreachbatch_chaos_first_epoch_crash(spark, tmp_path, crash_epoch):
    """Degenerate corner the main script skips: epoch 0 crashes after a
    full write, so the retry has NO strictly-below baseline and its own
    complete v00000 on disk — it must rebuild from the batch alone."""
    from tile_etl_spark.io import load
    from tile_etl_spark.streaming.queries import make_upsert_sink
    from tile_etl_spark.streaming.replay import EVENTS_SCHEMA, replay_dir

    chunks = replay_dir(spark, _CHAOS_SF)
    base = str(tmp_path / "upsert0")
    ckpt = str(tmp_path / "ckpt0")
    os.makedirs(base)
    inner, versions = make_upsert_sink(spark, base)
    attempts: Counter[int] = Counter()

    def chaotic(batch_df, epoch_id):
        epoch = int(epoch_id)
        attempts[epoch] += 1
        inner(batch_df, epoch_id)
        if epoch == crash_epoch and attempts[epoch] == 1:
            raise RuntimeError("chaos: post-write kill at first epoch")

    def start():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(chunks + "/chunk_*.parquet")
        )
        return (
            stream.writeStream.foreachBatch(chaotic)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    restarts = 0
    while True:
        q = start()
        try:
            q.awaitTermination()
            break
        except StreamingQueryException:
            restarts += 1
            assert restarts <= MAX_RESTARTS

    assert restarts == 1
    assert attempts[crash_epoch] == 2
    key = F.struct("ts", "event_id")
    batch = (
        load(spark, _CHAOS_SF, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("value", key).alias("last_value"),
            F.max("ts").alias("last_ts"),
            F.max_by("event_id", key).alias("last_event_id"),
        )
    )
    assert sorted(
        map(tuple, spark.read.parquet(versions()[-1]).collect())
    ) == sorted(map(tuple, batch.collect()))


def test_stateful_chaos_state_store_recovery(spark, tmp_path):
    """r12 (VERDICT r11 #5): the applyInPandasWithState path
    (s_stateful's per-user running counter) under mid-batch kills +
    restart through the SAME checkpoint. The risk here is STATE-STORE
    recovery, not sink idempotence: a batch that dies after some tasks
    already committed their state-store version must, on retry, reload
    the prior version and rebuild — never double-count.

    Two scripted kills, both raised INSIDE the stateful function on
    executor workers (sentinel flag files make them fire exactly once
    each, surviving the worker-process boundary):
      - kill A: the very first group processed (batch 0, attempt 1)
        dies — recovery with an EMPTY prior state.
      - kill B: fires when the busiest user's running total first
        crosses ~60% of its final count — a mid-stream batch dies with
        REAL accumulated state behind it; a lost/duplicated state
        version would surface as a wrong final total for exactly that
        user.
    Emissions land in epoch-versioned overwrite dirs (idempotent on
    retry); the final running totals (max emission per user across the
    whole chaotic run, both query incarnations) must equal the batch
    twin groupBy(user).count() row-for-row."""
    from tile_etl_spark.io import load
    from tile_etl_spark.streaming.replay import (
        EVENTS_SCHEMA,
        N_CHUNKS,
        replay_dir,
    )

    chunks = replay_dir(spark, _CHAOS_SF)
    ckpt = str(tmp_path / "ckpt_state")
    out_base = str(tmp_path / "emitted")
    flags = str(tmp_path / "flags")
    os.makedirs(out_base)
    os.makedirs(flags)

    twin = (
        load(spark, _CHAOS_SF, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    want = {int(r["user_id"]): int(r["count"]) for r in twin}
    hot_user, hot_total = max(want.items(), key=lambda kv: kv[1])
    threshold = max(2, int(hot_total * 0.6))

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _arm(path):
        # atomically claim a kill flag; True exactly once per flag
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return True
        except FileExistsError:
            return False

    flag_a = os.path.join(flags, "kill_first_batch")
    flag_b = os.path.join(flags, "kill_mid_stream")

    def count_events(key, pdfs, state: GroupState):
        running = state.get[0] if state.exists else 0
        if _arm(flag_a):
            raise RuntimeError("chaos: kill inside first stateful batch")
        for pdf in pdfs:
            running += len(pdf)
        if (
            int(key[0]) == hot_user
            and running >= threshold
            and _arm(flag_b)
        ):
            raise RuntimeError("chaos: kill mid-stream with live state")
        state.update((running,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [running]})

    def emit(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_base, f"v{int(epoch_id):05d}")
        )

    def start():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks + "/chunk_*.parquet")
        )
        counted = stream.groupBy("user_id").applyInPandasWithState(
            count_events,
            outputStructType="user_id BIGINT, n_events BIGINT",
            stateStructType="n BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        return (
            counted.writeStream.foreachBatch(emit)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    restarts = 0
    while True:
        q = start()
        try:
            q.awaitTermination()
            break
        except StreamingQueryException:
            restarts += 1
            assert restarts <= MAX_RESTARTS, (
                f"stateful chaos did not converge in {MAX_RESTARTS} "
                "restarts"
            )

    # both kills fired, each cost exactly one restart
    assert os.path.exists(flag_a) and os.path.exists(flag_b)
    assert restarts == 2, restarts
    # every epoch emitted exactly once into a contiguous version set
    vs = sorted(os.listdir(out_base))
    assert vs == [f"v{i:05d}" for i in range(N_CHUNKS)], vs
    # recovered running totals == batch twin, row for row
    got_rows = spark.read.parquet(os.path.join(out_base, "v*")).collect()
    got: dict[int, int] = {}
    for r in got_rows:
        u, n = int(r["user_id"]), int(r["n_events"])
        got[u] = max(got.get(u, 0), n)
    assert got == want, (
        len(got),
        len(want),
        {u: (got.get(u), want.get(u)) for u in list(want)[:5]},
    )
    # the hot user's total specifically proves cross-restart state:
    # its counter accumulated both before and after kill B
    assert got[hot_user] == hot_total


def test_session_window_chaos_merge_state_recovery(spark, tmp_path):
    """r12 follow-on to the stateful chaos test: the session_window
    MERGE state (JVM-side stateful aggregation, no Python hook to
    raise from) under batch failures. Kills are injected in
    foreachBatch — one BEFORE the epoch's write (the batch's merged
    session state is computed but uncommitted; the retry must rebuild
    from the prior state-store version) and one AFTER (the retry must
    overwrite idempotently). Complete output mode makes every epoch
    emit the full sessions-so-far, so the LAST version alone must
    equal the batch q_sessionize twin's (user, session_start,
    n_events) multiset — a lost or doubled merge after either restart
    shows up as a wrong session count or a shifted session_start."""
    from pyspark.sql import functions as F

    from tile_etl_spark import registry
    from tile_etl_spark.streaming.replay import (
        EVENTS_SCHEMA,
        N_CHUNKS,
        replay_dir,
    )

    registry.load_all()
    chunks = replay_dir(spark, _CHAOS_SF)
    ckpt = str(tmp_path / "ckpt_sess")
    out_base = str(tmp_path / "sess")
    os.makedirs(out_base)

    faults = {(2, 1): "pre_write", (5, 1): "post_write"}
    attempts: Counter[int] = Counter()

    def chaotic(batch_df, epoch_id):
        epoch = int(epoch_id)
        attempts[epoch] += 1
        fault = faults.get((epoch, attempts[epoch]))
        if fault == "pre_write":
            raise RuntimeError(f"chaos: pre-write kill at epoch {epoch}")
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_base, f"v{epoch:05d}")
        )
        if fault == "post_write":
            raise RuntimeError(f"chaos: post-write kill at epoch {epoch}")

    def start():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks + "/chunk_*.parquet")
        )
        agg = (
            stream.groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
            )
            .select("user_id", "session_start", "n_events")
        )
        return (
            agg.writeStream.foreachBatch(chaotic)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    restarts = 0
    while True:
        q = start()
        try:
            q.awaitTermination()
            break
        except StreamingQueryException:
            restarts += 1
            assert restarts <= MAX_RESTARTS
    assert restarts == len(faults), restarts
    # per-epoch attempts match the script; every epoch's version exists
    expected = Counter({e: 1 for e in range(N_CHUNKS)})
    for (e, _a) in faults:
        expected[e] += 1
    assert attempts == expected, (dict(attempts), dict(expected))
    vs = sorted(os.listdir(out_base))
    assert vs == [f"v{i:05d}" for i in range(N_CHUNKS)], vs

    got = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(out_base, vs[-1])).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            registry.QUERIES["q_sessionize"](spark, _CHAOS_SF)
            .select("user_id", "session_start", "n_events")
            .collect(),
        )
    )
    assert got == want, (len(got), len(want), got[:3], want[:3])


def test_ss_join_chaos_both_sides_state_recovery(spark, tmp_path):
    """r13 (VERDICT r12 #5): the STREAM-STREAM interval join's state —
    the one stateful shape the chaos tier had not exercised. Unlike the
    running-counter and session-window tests, the join state store
    buffers ROWS FROM BOTH INPUTS (every unmatched click and purchase
    inside the watermark horizon); a lost or doubled state version
    after a restart surfaces as missing or duplicated (click_id,
    purchase_id) pairs, so the accounting is over the exact match
    multiset, not aggregates.

    Three scripted kills in foreachBatch, each a distinct crash window:
      - epoch 0 pre-write: the first micro-batch dies with its join
        output computed but nothing committed — recovery from EMPTY
        buffers on both sides.
      - mid-stream pre-write: a later batch dies the same way but with
        REAL buffered state behind it (clicks waiting for purchases and
        vice versa); the retry must reload the prior state version and
        re-emit exactly the same appended matches.
      - mid-stream post-write: the epoch's matches are fully written,
        then the batch fails before the checkpoint commits — the retry
        must rebuild the SAME version content (snapshot-compared), the
        double-apply window for append-mode join output.
    Append mode means each epoch's version holds only that epoch's new
    matches; the union over all versions must equal the batch interval
    join twin row-for-row."""
    from tile_etl_spark.io import load
    from tile_etl_spark.streaming.replay import EVENTS_SCHEMA, replay_dir

    chunks = replay_dir(spark, _CHAOS_SF)
    ckpt = str(tmp_path / "ckpt_ssjoin")
    out_base = str(tmp_path / "ssjoin")
    os.makedirs(out_base)

    faults = {
        (0, 1): "pre_write",   # empty-buffer recovery
        (3, 1): "pre_write",   # live buffers, uncommitted output
        (5, 1): "post_write",  # committed output, uncommitted ckpt
    }
    attempts: Counter[int] = Counter()
    post_write_snapshot: dict[int, list] = {}

    def _rows(path):
        return sorted(map(tuple, spark.read.parquet(path).collect()))

    def chaotic(batch_df, epoch_id):
        epoch = int(epoch_id)
        attempts[epoch] += 1
        fault = faults.get((epoch, attempts[epoch]))
        if fault == "pre_write":
            raise RuntimeError(f"chaos: pre-write kill at epoch {epoch}")
        vdir = os.path.join(out_base, f"v{epoch:05d}")
        batch_df.write.mode("overwrite").parquet(vdir)
        if fault == "post_write":
            post_write_snapshot[epoch] = _rows(vdir)
            raise RuntimeError(f"chaos: post-write kill at epoch {epoch}")

    def start():
        def side(event_type, keys):
            s = (
                spark.readStream.schema(EVENTS_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(chunks + "/chunk_*.parquet")
                .where(F.col("event_type") == event_type)
            )
            return s.select(*keys)

        clicks = side(
            "click",
            (
                F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            ),
        ).withWatermark("click_ts", "1 hour")
        purchases = side(
            "purchase",
            (
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            ),
        ).withWatermark("purchase_ts", "1 hour")
        joined = clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        ).select(
            F.col("c_user").alias("user_id"), "click_id", "purchase_id"
        )
        return (
            joined.writeStream.foreachBatch(chaotic)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    restarts = 0
    while True:
        q = start()
        try:
            q.awaitTermination()
            break
        except StreamingQueryException:
            restarts += 1
            assert restarts <= MAX_RESTARTS, (
                f"ss-join chaos did not converge in {MAX_RESTARTS} "
                f"restarts; attempts={dict(attempts)}"
            )

    # one restart per injected kill, no more
    assert restarts == len(faults), (restarts, dict(attempts))
    # versions contiguous from 0 — no epoch lost, none re-committed
    # under a different id (the engine may append trailing
    # watermark-finalization epochs beyond the data chunks; they must
    # still be contiguous and carry no spurious matches)
    vs = sorted(os.listdir(out_base))
    assert vs == [f"v{i:05d}" for i in range(len(vs))], vs
    # per-epoch attempts match the script exactly
    expected = Counter({e: 1 for e in range(len(vs))})
    for (e, _a) in faults:
        expected[e] += 1
    assert attempts == expected, (dict(attempts), dict(expected))
    # the post-write epoch's retry rebuilt byte-identical content from
    # the recovered state version — the double-apply window closed
    for epoch, snap in post_write_snapshot.items():
        assert _rows(os.path.join(out_base, f"v{epoch:05d}")) == snap

    # union of all appended epochs == batch interval join twin,
    # row-for-row (a lost state version drops pairs; a doubled one
    # duplicates them — multiset compare catches both directions)
    got = _rows(os.path.join(out_base, "v*"))
    e = load(spark, _CHAOS_SF, "events")
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = sorted(
        map(
            tuple,
            c.join(
                p,
                (F.col("c_user") == F.col("p_user"))
                & (F.col("purchase_ts") >= F.col("click_ts"))
                & (
                    F.col("purchase_ts")
                    <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
                ),
            )
            .select(
                F.col("c_user").alias("user_id"),
                "click_id",
                "purchase_id",
            )
            .collect(),
        )
    )
    assert got == want, (len(got), len(want))


def test_ss_join_louter_chaos_eviction_emission_recovery(spark, tmp_path):
    """r13 follow-on to the inner-join chaos test: the LEFT OUTER
    stream-stream join's null-extended emissions ride state EVICTION —
    an unmatched click surfaces only when the joint watermark passes
    its whole match window — which is a different recovery shape from
    emit-on-match: a kill landing around an eviction boundary can
    double-emit the evicted rows (state restored, eviction re-runs) or
    lose them (sink write lost, state already gone). Kills:
      - epoch 0 pre-write: empty-state recovery, as in the inner test.
      - mid-stream pre-write: an epoch whose watermark advance
        finalized real unmatched clicks dies before committing them —
        the retry must re-run the SAME eviction from the restored
        state version.
      - final-epoch post-write: the flush-sentinel epoch (the largest
        eviction burst — everything still buffered flushes) commits
        its output, then dies before the checkpoint; the retry must
        rebuild byte-identical content, never a second (empty or
        doubled) eviction.
    The union over all appended epochs (sentinel user filtered) must
    equal the batch LEFT join twin multiset — matched rows AND
    null-extended unmatched rows, each exactly once."""
    from tile_etl_spark.io import load
    from tile_etl_spark.streaming.replay import (
        EVENTS_SCHEMA,
        N_CHUNKS,
        replay_dir_with_flush,
    )

    chunks = replay_dir_with_flush(spark, _CHAOS_SF)
    ckpt = str(tmp_path / "ckpt_louter")
    out_base = str(tmp_path / "louter")
    os.makedirs(out_base)

    # the flush sentinel is chunk N_CHUNKS (0-indexed), the last file;
    # with maxFilesPerTrigger=1 per source it lands in epoch N_CHUNKS
    final_epoch = N_CHUNKS
    faults = {
        (0, 1): "pre_write",
        (4, 1): "pre_write",
        (final_epoch, 1): "post_write",
    }
    attempts: Counter[int] = Counter()
    post_write_snapshot: dict[int, list] = {}

    def _rows(path):
        return sorted(
            map(tuple, spark.read.parquet(path).collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    def chaotic(batch_df, epoch_id):
        epoch = int(epoch_id)
        attempts[epoch] += 1
        fault = faults.get((epoch, attempts[epoch]))
        if fault == "pre_write":
            raise RuntimeError(f"chaos: pre-write kill at epoch {epoch}")
        vdir = os.path.join(out_base, f"v{epoch:05d}")
        batch_df.write.mode("overwrite").parquet(vdir)
        if fault == "post_write":
            post_write_snapshot[epoch] = _rows(vdir)
            raise RuntimeError(f"chaos: post-write kill at epoch {epoch}")

    def start():
        def side(event_type, keys):
            s = (
                spark.readStream.schema(EVENTS_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(chunks + "/chunk_*.parquet")
                .where(F.col("event_type") == event_type)
            )
            return s.select(*keys)

        clicks = side(
            "click",
            (
                F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            ),
        ).withWatermark("click_ts", "1 hour")
        purchases = side(
            "purchase",
            (
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            ),
        ).withWatermark("purchase_ts", "1 hour")
        joined = clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
            "left_outer",
        ).select(
            F.col("c_user").alias("user_id"), "click_id", "purchase_id"
        )
        return (
            joined.writeStream.foreachBatch(chaotic)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    restarts = 0
    while True:
        q = start()
        try:
            q.awaitTermination()
            break
        except StreamingQueryException:
            restarts += 1
            assert restarts <= MAX_RESTARTS, (
                f"louter chaos did not converge in {MAX_RESTARTS} "
                f"restarts; attempts={dict(attempts)}"
            )

    assert restarts == len(faults), (restarts, dict(attempts))
    vs = sorted(os.listdir(out_base))
    assert vs == [f"v{i:05d}" for i in range(len(vs))], vs
    assert len(vs) > final_epoch, (len(vs), final_epoch)
    expected = Counter({e: 1 for e in range(len(vs))})
    for (e, _a) in faults:
        expected[e] += 1
    assert attempts == expected, (dict(attempts), dict(expected))
    # the flush epoch's retry re-ran the SAME eviction from restored
    # state: byte-identical version content
    for epoch, snap in post_write_snapshot.items():
        assert _rows(os.path.join(out_base, f"v{epoch:05d}")) == snap
        assert snap, "flush epoch emitted nothing — eviction lost"

    got = [
        t
        for t in _rows(os.path.join(out_base, "v*"))
        if t[0] is not None and t[0] >= 0
    ]
    e = load(spark, _CHAOS_SF, "events")
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = sorted(
        map(
            tuple,
            c.join(
                p,
                (F.col("c_user") == F.col("p_user"))
                & (F.col("purchase_ts") >= F.col("click_ts"))
                & (
                    F.col("purchase_ts")
                    <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
                ),
                "left_outer",
            )
            .select(
                F.col("c_user").alias("user_id"),
                "click_id",
                "purchase_id",
            )
            .collect(),
        ),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert got == want, (len(got), len(want))
    # and the null-extended tier specifically survived: some clicks
    # really are unconverted in the fixture
    n_null = sum(1 for t in got if t[2] is None)
    assert n_null > 0 and n_null == sum(1 for t in want if t[2] is None)
