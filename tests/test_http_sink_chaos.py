"""Chaos test for the object-store sink at sf1 volume (VERDICT r9 #7).

The A10/A11 surface (tiles/sink.py, tiles/http_store.py) was
live-server tested at toy scale (40 objects, scripted 503s). This runs
the FULL reference tile inventory — 37,819 objects, the exact GCS-run
manifest derived from src/Program.cs:24-32,74-81 (BASELINE.md) —
through a fault-injecting local HTTP server mixing every failure class
a real store throws:

- transient 503 singles/doubles on sampled keys,
- 429 throttling with Retry-After,
- mid-stream disconnects (socket shut down with zero response bytes),
- server stalls past the client timeout,
- an opening GLOBAL 503 burst across arbitrary keys (hot-prefix
  throttling), and
- permanent failures that must exhaust the retry budget.

The assertion is exactly-once-per-key PUT ACCOUNTING:

1. exactly one status row per key (no dupes, no losses — A11's
   per-row containment at volume);
2. every ok key stored exactly ONCE server-side (retries never
   double-store a key whose fault preceded acceptance);
3. the err set is exactly the scripted-permanent set (every transient
   class recovered inside the budget);
4. per-key client attempt counts reconcile with server-side request
   counts — for every row, what the client says it sent is what the
   server says it received.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tile_etl_spark.tiles.grid import object_key_col, tile_grid
from tile_etl_spark.tiles.http_store import (
    LocalObjectStore,
    objectstore_sink_http,
)

N_INVENTORY = 37_819  # BASELINE.md: levels 5-11, reference extent


@pytest.fixture()
def store():
    s = LocalObjectStore().start()
    yield s
    s.stop()


def test_chaos_full_inventory_exactly_once_accounting(spark, store):
    df = tile_grid(spark).select(
        object_key_col().alias("object_key"),
        # content = the key bytes: lets the bytes-landed check below
        # verify content→key integrity without a lookup table
        object_key_col().cast("binary").alias("content"),
    )
    keys = [r[0] for r in df.select("object_key").collect()]
    assert len(keys) == N_INVENTORY and len(set(keys)) == N_INVENTORY

    rng = random.Random(42)
    sample = rng.sample(keys, 400)
    transient = sample[:150]  # 1-2 transient 503s each
    throttled = sample[150:250]  # one 429 + Retry-After
    disconnects = sample[250:330]  # keep-alive socket killed mid-PUT
    stalls = sample[330:340]  # server hang > client timeout
    dead = sample[340:400]  # permanent: must exhaust the budget
    for k in transient:
        store.faults[k] = [503] * rng.randint(1, 2)
    for k in throttled:
        store.faults[k] = [429]
    for k in disconnects:
        store.faults[k] = ["disconnect"]
    for k in stalls:
        # stall must beat the client timeout with margin; the timeout
        # in turn leaves wide margin over a contended-but-healthy
        # response (this box shows ambient multi-second load bursts —
        # BASELINE.md — and a too-tight timeout turns one slow healthy
        # response into a spurious retry/dead-letter)
        store.faults[k] = ["stall:10.0"]
    for k in dead:
        store.faults[k] = [503] * 99
    # opening global 503 burst: every PUT inside the 0.4 s window after
    # the first request fails, whatever its key. Budget math makes
    # recovery DETERMINISTIC, independent of executor-thread count or
    # box load: with backoff base 0.05 (50/100/200/400/500 ms), a key
    # can land at most its first 4 attempts inside a 0.4 s window, the
    # worst scripted key adds 2 more failures (transient x2), and the
    # stall class 1 — all < the 8-attempt budget, while permanent keys
    # (99 scripted faults) still exhaust it.
    store.burst_window_s = 0.4

    out = objectstore_sink_http(
        df.repartition(32),
        store.endpoint,
        max_attempts=8,
        backoff_base_s=0.05,
        timeout_s=4.0,
    ).collect()

    # 1. exactly one status row per key
    assert len(out) == N_INVENTORY
    assert len({r["object_key"] for r in out}) == N_INVENTORY

    ok = [r for r in out if r["status"] == "ok"]
    err = [r for r in out if r["status"] == "err"]
    assert len(ok) + len(err) == N_INVENTORY

    # 3. the err set is exactly the scripted-permanent set
    assert {r["object_key"] for r in err} == set(dead)
    for r in err:
        assert "retries exhausted" in r["error"]
        assert r["attempts"] == 8

    # 2. every ok key stored exactly once, with the right bytes/meta
    assert set(store.objects) == set(keys) - set(dead)
    assert all(store.stores[r["object_key"]] == 1 for r in ok)
    assert sum(store.stores.values()) == len(ok)
    for k in rng.sample(sorted(store.objects), 50):
        body, meta = store.objects[k]
        assert body == k.encode()
        assert meta["content-type"] == "image/jpg"

    # 4. per-key attempt accounting reconciles client vs server
    for r in out:
        assert r["attempts"] == store.attempts[r["object_key"]], (
            r["object_key"], r["attempts"],
            store.attempts[r["object_key"]],
        )
    # every scripted transient class recovered, with retries visible
    for k in transient + throttled + disconnects + stalls:
        assert store.stores.get(k) == 1
        assert store.attempts[k] >= 2
    # the global burst actually fired
    assert store.burst_hits > 0
