"""File-source replay of the events fixture (FIXTURES.md §8).

The stream is simulated by writing events as N time-ordered parquet
chunks; ``maxFilesPerTrigger=1`` + ascending mtimes make the file
source deliver them as N micro-batches in event-time order — late-data
scenarios inject an old-timestamp file at the end of the sequence.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_etl_spark.io import SessionKeyed, load

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)
N_CHUNKS = 8


def _art_root() -> str:
    from tile_etl_spark.sources.files import ART_DIR

    return ART_DIR


def _write_chunk(df: DataFrame, base: str, i: int) -> None:
    """Write ``df`` as ``chunk_{i:03d}.parquet`` under ``base`` with the
    ascending-mtime discipline the file source's ordering relies on."""
    tmp = os.path.join(base, f"_tmp_{i}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dst = os.path.join(base, f"chunk_{i:03d}.parquet")
    shutil.move(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp)
    os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))


def replay_dir(spark: SparkSession, sf_dir: str, n_chunks: int = N_CHUNKS) -> str:
    """Write events as n time-ordered parquet chunk files (idempotent).

    Chunk i holds the i-th quantile of the ts order; file mtimes
    ascend so the file source processes them oldest-first.
    """
    from tile_etl_spark.sources.files import (
        marker_current,
        source_fingerprint,
        write_marker,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(_art_root(), f"events_stream_{tag}")
    marker = os.path.join(base, "_DONE")
    # keyed on the source parquet's size+mtime PLUS a recipe token: a
    # regenerated fixture OR a chunking-recipe change rebuilds the
    # replay chunks instead of silently streaming stale data.
    fpr = (
        source_fingerprint(os.path.join(sf_dir, "events.parquet"))
        + ":exact-pct-v2"
    )
    if marker_current(marker, fpr):
        return base
    # EXACT percentile bounds: percentile_approx's Greenwald-Khanna
    # merge is shuffle-arrival-order dependent past its accuracy
    # parameter, so two rebuilds could cut chunks differently (and a
    # concurrent-rebuild race could interleave two cuts). The exact
    # aggregate is deterministic; this is a once-per-fingerprint
    # fixture builder, so the exact sort cost is fine (a 100 TB replay
    # builder would repartitionByRange instead). Source persisted so
    # the n_chunks filtered writes scan it once, and the chunk set is
    # published ATOMICALLY (tmp sibling + rename, the publish_parquet
    # discipline) so a concurrent builder can never commit a mixed cut.
    tmp = f"{base}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    e = load(spark, sf_dir, "events").persist()
    fracs = ",".join(str((i + 1) / n_chunks) for i in range(n_chunks - 1))
    bounds = e.selectExpr(
        f"percentile(unix_micros(ts), array({fracs})) AS b"
    ).first()["b"]
    lo = None
    for i in range(n_chunks):
        hi = bounds[i] if i < n_chunks - 1 else None
        us = F.unix_micros("ts")
        chunk = e
        if lo is not None:
            chunk = chunk.where(us > lo)
        if hi is not None:
            chunk = chunk.where(us <= hi)
        _write_chunk(chunk, tmp, i)
        lo = hi
    e.unpersist()
    try:
        shutil.rmtree(base, ignore_errors=True)
        os.rename(tmp, base)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    write_marker(marker, fpr)
    return base


def read_stream(spark: SparkSession, base: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/chunk_*.parquet")
    )


# Recent (memory-sink table, checkpoint dir) pairs per session — each
# run_to_table call needs a fresh pair (a reused checkpoint under
# availableNow resumes from committed offsets and drains nothing), but
# old pairs must not leak: uuid memory tables pin their rows in driver
# memory and checkpoint trees accumulate under ART_DIR for the process
# lifetime under the driver/bench usage pattern (hundreds of streaming
# runs). A bounded keep-last window (not drop-immediately-previous)
# lets tests hold a few un-collected streaming results at once.
# io.SessionKeyed handles the id-reuse/leak hazards; the purge hook
# removes the dead session's on-disk checkpoint trees.
_RUN_RECENT = SessionKeyed(
    on_purge=lambda pairs: [
        shutil.rmtree(ckpt, ignore_errors=True) for _name, ckpt in pairs
    ]
)
_RUN_KEEP = 8


def _recent_for(spark_s: SparkSession) -> list[tuple[str, str]]:
    return _RUN_RECENT.get_or_create(spark_s, list)


def run_to_table(df: DataFrame, mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into
    an in-memory table; return it as a batch DataFrame."""
    spark_s = df.sparkSession
    recent = _recent_for(spark_s)
    while len(recent) >= _RUN_KEEP:
        old_name, old_ckpt = recent.pop(0)
        try:
            spark_s.catalog.dropTempView(old_name)
        except Exception:
            pass
        shutil.rmtree(old_ckpt, ignore_errors=True)
    name = "s_" + uuid.uuid4().hex[:12]
    ckpt = os.path.join(_art_root(), "checkpoints", name)
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    recent.append((name, ckpt))
    return df.sparkSession.table(name)


def replay_dir_with_flush(
    spark: SparkSession, sf_dir: str, n_chunks: int = N_CHUNKS
) -> str:
    """Replay chunks plus a FINAL far-future sentinel chunk (one click
    + one purchase for user_id = −1, 3 h past max event time).

    Stream-stream OUTER joins need it: an unmatched left row is only
    emitted once the JOINT watermark (min of both sides') passes its
    whole match window, and after the last real file nothing advances
    the watermarks — the tail's null-padded rows would sit in state
    forever. The sentinel advances BOTH sides' watermarks past every
    real window; consumers filter user_id < 0 back out. This mirrors
    production reality: an outer-join stream only finalizes rows as
    new data (or punctuation heartbeats) moves the watermark.
    """
    base = replay_dir(spark, sf_dir, n_chunks)
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_art_root(), f"events_stream_flush_{tag}")
    marker = os.path.join(out, "_DONE")
    from tile_etl_spark.sources.files import (
        marker_current,
        source_fingerprint,
        write_marker,
    )

    fpr = (
        source_fingerprint(os.path.join(sf_dir, "events.parquet"))
        + ":exact-pct-v2"
    )
    if marker_current(marker, fpr):
        return out
    # atomic publish, like replay_dir
    tmp = f"{out}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    chunks = sorted(
        f for f in os.listdir(base) if f.endswith(".parquet")
    )
    for i, f in enumerate(chunks):
        dst = os.path.join(tmp, f)
        shutil.copy2(os.path.join(base, f), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    e = load(spark, sf_dir, "events")
    flush = e.agg(F.max("ts").alias("mx")).select(
        F.explode(
            F.array(F.lit("click"), F.lit("purchase"))
        ).alias("event_type"),
        (F.col("mx") + F.expr("INTERVAL 3 HOURS")).alias("ts"),
    ).select(
        F.lit(-1).cast("bigint").alias("event_id"),
        "ts",
        F.lit(-1).cast("bigint").alias("user_id"),
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    _write_chunk(flush, tmp, len(chunks))
    try:
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    write_marker(marker, fpr)
    return out


DOCS_SCHEMA = "doc_id BIGINT, text STRING"
N_DOC_CHUNKS = 4


def replay_docs_dir(
    spark: SparkSession,
    sf_dir: str,
    sources: tuple[str, ...],
    n_chunks: int = N_DOC_CHUNKS,
) -> str:
    """Write the given sources' documents as n doc_id-ordered parquet
    chunks (idempotent, fingerprint-keyed like replay_dir) — the file
    replay standing in for a Kafka topic of newly crawled documents."""
    from tile_etl_spark.sources.files import (
        marker_current,
        source_fingerprint,
        write_marker,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(
        _art_root(), f"docs_stream_{tag}_{'_'.join(sorted(sources))}"
    )
    marker = os.path.join(base, "_DONE")
    fpr = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    if marker_current(marker, fpr):
        return base
    tmp = f"{base}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    from pyspark.sql import Window

    # one pass derives the chunk index (ntile over doc_id order — the
    # batch side is small by definition, so the single-partition window
    # is fine in this fixture builder), cached so the n_chunks filtered
    # writes don't re-scan the source; no driver-side id collect
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("source").isin(*sources))
        .select(
            "doc_id",
            "text",
            (F.ntile(n_chunks).over(Window.orderBy("doc_id")) - 1).alias(
                "chunk_id"
            ),
        )
        .persist()
    )
    n_used = d.select("chunk_id").distinct().count()
    for i in range(min(n_chunks, n_used)):
        _write_chunk(
            d.where(F.col("chunk_id") == i).drop("chunk_id"), tmp, i
        )
    d.unpersist()
    try:
        shutil.rmtree(base, ignore_errors=True)
        os.rename(tmp, base)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    write_marker(marker, fpr)
    return base


def read_docs_stream(spark: SparkSession, base: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/chunk_*.parquet")
    )
