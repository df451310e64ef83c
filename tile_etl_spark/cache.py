"""Scoped persist lifecycle shared by operator builders.

Cached intermediates are scoped per (qid, sf_dir): a builder releases
every OTHER scope's handles on entry, so a long-lived session running
many qids never accumulates cached partitions, while repeated runs of
the SAME query (bench warm-run protocol, driver retries) still get
Spark CacheManager hits — identical logical plan → cached data reused.

Two ways to tie a persist to its builder (the round-2 advice: scope is
process-global last-writer-wins state, so a helper that persists must
not silently inherit an unrelated query's lifecycle):

- ``persist_scoped(df, tag=...)`` pins the handle to an explicit tag;
- ``with scope(tag): ...`` enters the scope for the block and restores
  the previous tag on exit, so helpers called AFTER the block don't
  leak into it. Bare ``scope(tag)`` calls (the builder pattern: the
  persisted plan must outlive the builder until the action runs) keep
  working unchanged — the returned context manager is optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED: list[tuple[str, str | None, DataFrame]] = []
_SCOPE: list[str] = [""]


class _ScopeCtx:
    """Returned by scope(); optionally used as a context manager that
    restores the previously active tag (without touching the persisted
    handles themselves — they live until another scope is entered)."""

    def __init__(self, prev: str) -> None:
        self._prev = prev

    def __enter__(self) -> "_ScopeCtx":
        return self

    def __exit__(self, *exc) -> None:
        _SCOPE[0] = self._prev


def _session_alive(df: DataFrame) -> bool:
    """True iff the frame's owning session is still usable. Entries
    from a stopped session must be DROPPED, not unpersisted (the Py4J
    call would raise) and never returned from a dedupe lookup (a new
    session would receive a dead plan)."""
    try:
        return not df.sparkSession.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


def scope(tag: str) -> _ScopeCtx:
    """Enter cache scope ``tag``, unpersisting all other scopes."""
    prev = _SCOPE[0]
    _SCOPE[0] = tag
    keep = []
    while _CACHED:
        t, k, df = _CACHED.pop()
        if not _session_alive(df):
            continue  # dead session: storage is already gone
        if t == tag:
            keep.append((t, k, df))
        else:
            df.unpersist()
    _CACHED.extend(keep)
    return _ScopeCtx(prev)


def persist_scoped(
    df: DataFrame, tag: str | None = None, key: str | None = None
) -> DataFrame:
    """Persist ``df`` under ``tag`` (default: the current scope).

    Re-persisting a semantically identical plan under the same tag
    (bench best-of-N reruns, driver retries — each rebuild produces a
    fresh DataFrame object over the same logical plan) returns the
    EXISTING handle instead of calling ``persist()`` again: Spark's
    CacheManager would dedupe the storage anyway but logs a WARN per
    call ("Asked to cache already cached data"), and the stale new
    handle would otherwise shadow the tracked one in unpersist order.

    ``key`` is the dedupe identity for plans ``sameSemantics`` cannot
    match: lambda-variable ids inside higher-order functions (transform
    / LATERAL VIEW lambdas) are NOT normalized by plan
    canonicalization, so two builds of the identical HOF query compare
    unequal — to sameSemantics AND to Spark's CacheManager, which
    therefore allocates fresh storage per rebuild (measured: the LSH
    candidate cache re-materialized on every bench rerun). A caller
    that persists a HOF-bearing plan must pass a key that uniquely
    names the plan it builds (include every input that changes the
    result, e.g. the input frame's semanticHash); same (tag, key) →
    the existing handle is returned without building-side work.
    """
    want = tag if tag is not None else _SCOPE[0]
    # A driver retry may stop and recreate the SparkSession while this
    # process-global list survives; a dedupe hit from another session
    # would hand the caller a dead plan. Same-session check is cheap
    # (object identity) and prunes nothing — dead entries are swept by
    # the next scope() switch.
    if key is not None:
        for t, k, cached in _CACHED:
            if cached.sparkSession is not df.sparkSession:
                continue
            if t == want and k == key:
                # The key string is trusted as plan identity (that's
                # the point — sameSemantics can't see HOF plans), but a
                # key collision or a caller omitting a result-changing
                # input from its key would silently return the WRONG
                # frame. Schemas are free to compare driver-side and
                # catch the gross form of both failure modes loudly.
                if cached.schema != df.schema:
                    raise RuntimeError(
                        f"persist_scoped key collision: ({want!r}, "
                        f"{key!r}) maps to a cached plan with schema "
                        f"{cached.schema.simpleString()} but the caller "
                        f"built {df.schema.simpleString()} — the key "
                        "does not uniquely name the plan"
                    )
                return cached
    else:
        for t, k, cached in _CACHED:
            if cached.sparkSession is not df.sparkSession:
                continue
            if t == want and k is None and cached.sameSemantics(df):
                return cached
    _CACHED.append((want, key, df))
    return df.persist()


def lookup(key: str, df_session, tag: str | None = None) -> DataFrame | None:
    """Pre-build cache check for builders whose CONSTRUCTION is itself
    expensive (eager iterative loops like connected_components run
    checkpoint + count jobs during plan building): persist_scoped's
    dedupe can only skip storage, because it runs after the caller has
    already paid the build. Returns the cached frame for (tag, key) if
    present and owned by ``df_session``, else None."""
    want = tag if tag is not None else _SCOPE[0]
    for t, k, cached in _CACHED:
        if t == want and k == key and cached.sparkSession is df_session:
            return cached
    return None


def release_tag(tag: str) -> None:
    """Unpersist every entry tracked under ``tag`` without touching
    other scopes — for freeing intermediates that a later checkpoint
    made unreachable (e.g. the corpus-sized shingle cache once the
    edge frame is checkpointed)."""
    keep = []
    while _CACHED:
        t, k, df = _CACHED.pop()
        if t == tag:
            if _session_alive(df):
                df.unpersist()
        else:
            keep.append((t, k, df))
    _CACHED.extend(keep)


def release_cached() -> None:
    """Unpersist every intermediate cached through this module."""
    while _CACHED:
        df = _CACHED.pop()[2]
        if _session_alive(df):
            df.unpersist()
