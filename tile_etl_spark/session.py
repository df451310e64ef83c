"""SparkSession factory with scale-oriented defaults.

Local mode mirrors the cluster posture: AQE on (runtime re-planning,
skew-join handling, partition coalescing), explicit shuffle partition
count, UTC session time zone for cross-engine determinism (SURVEY §5.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "tile-etl-spark",
    cpus: str | int | None = None,
    shuffle_partitions: str | int | None = None,
    adaptive: str | bool | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[$SPARK_GRAFT_CPUS] by default; on a real cluster the same
    configs apply — only ``master`` changes (provided externally via
    spark-submit).

    ``adaptive`` (default on, override via $SPARK_GRAFT_AQE) gates AQE.
    AQE's runtime re-planning costs one driver barrier per exchange —
    pure win when shuffles carry GBs (cluster_conf keeps it on), pure
    overhead when a whole query's shuffles carry KBs; the bench flips
    it off at tiny SFs (the small-input fast path, bench.py).
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*")
    shuffle = str(
        shuffle_partitions
        or os.environ.get("SPARK_GRAFT_SHUFFLE")
        or DEFAULT_SHUFFLE_PARTITIONS
    )
    if adaptive is None:
        adaptive = os.environ.get("SPARK_GRAFT_AQE", "true")
    adaptive = str(adaptive).lower()
    builder = SparkSession.builder.appName(app_name)
    # Respect an externally provided master (spark-submit --master sets
    # PYSPARK_SUBMIT_ARGS; cluster launchers set SPARK_MASTER/MASTER) —
    # only default to local[N] when nothing chose one, so the same code
    # runs unmodified under a cluster manager.
    external = os.environ.get("SPARK_MASTER") or os.environ.get("MASTER")
    if external:
        builder = builder.master(external)
    elif "--master" not in os.environ.get("PYSPARK_SUBMIT_ARGS", ""):
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle)
        # AQE: runtime shuffle-partition coalescing, skew-join splitting,
        # sort-merge→broadcast conversion when runtime stats allow.
        .config("spark.sql.adaptive.enabled", adaptive)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Non-ANSI: bad casts yield NULL (oracle twins use TRY_CAST).
        .config("spark.sql.ansi.enabled", "false")
        # Arrow for every Python<->JVM data exchange (pandas UDFs etc.).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Wide plans (64-col MinHash structs) trip the 25-field default
        # and log a SparkStringUtils WARN per run; plan STRINGS are only
        # built for explain/debug, so raising the cap costs nothing.
        .config("spark.sql.debug.maxToStringFields", "2000")
        # Whole-stage-codegen compilation cache: the 100-entry default
        # thrashes under this package's multi-query sweeps (driver
        # correctness runs and bench passes execute 130-300 distinct
        # plans; measured: re-running q_agg_group after 40 other
        # queries costs +40% from recompilation alone). Generated
        # classes are small; 3000 entries keeps every sweep's codegen
        # resident.
        .config("spark.sql.codegen.cache.maxEntries", "3000")
    )
    return builder.getOrCreate()


def cluster_conf() -> dict[str, str]:
    """Config delta for a real multi-executor deployment (the local[*]
    factory above is the same engine; these knobs only matter with a
    cluster manager and a 100 TB-class input):

    - shuffle width sized so ~128-256 MB lands per reduce partition
      (AQE coalesces down, so err high);
    - RocksDB state store for streaming state that exceeds heap;
    - dynamic allocation as the admission-control replacement for the
      reference's Semaphore(40) (SURVEY §2A A12);
    - shuffle/broadcast compression and off-heap memory for Tungsten.

    Returned as a dict so spark-submit wrappers can splat it.
    """
    return {
        "spark.sql.shuffle.partitions": "2000",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128MB",
        "spark.sql.files.maxPartitionBytes": "256MB",
        "spark.sql.autoBroadcastJoinThreshold": "256MB",
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.shuffleTracking.enabled": "true",
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
    }


def ensure_session_determinism(spark: SparkSession) -> SparkSession:
    """Pin runtime confs that affect cross-engine value equality.

    Queries receive an externally created session (driver contract), so
    each query builder routes through this to guarantee UTC rendering of
    timestamps and NULL-on-bad-cast semantics regardless of caller setup.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    except Exception:
        pass  # conf may be fixed on some builds — verified below
    # Read back rather than trust the set: the MinHash multiply-shift
    # family (llm/dedup.py) requires non-ANSI int64 wraparound — under
    # ANSI its a*h+b raises ARITHMETIC_OVERFLOW mid-job. Fail fast with
    # a clear error instead of deep in a task.
    if spark.conf.get("spark.sql.ansi.enabled", "false") != "false":
        raise RuntimeError(
            "spark.sql.ansi.enabled could not be set to false on this "
            "build; the engine's hash families rely on non-ANSI int64 "
            "wraparound arithmetic (llm/dedup.py multiply-shift MinHash)"
        )
    return spark
