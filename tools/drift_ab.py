#!/usr/bin/env python
"""Drifter A/B (VERDICT r10 #1): q_sessionize / q_topk_per_group /
q_agg_rollup under controlled variants, interleaved to cancel the
box's minute-scale speed swings.

VERDICT r10 named 53e180b's codegen-cache raise (100 -> 3000 entries)
as the prime suspect for the three qids' monotonic cross-round drift.
The r11 box finding (BASELINE.md r11 rows: re-running round-9 code
unchanged measured 5.63 s then 4.01 s against its own 3.55-3.79 s
band, with the single-core probe swinging 0.021-0.030 s) already
explains the drift environmentally; this tool closes the bisect
question directly: each variant runs in its OWN fresh JVM with only
the conf under test changed, variants alternate A/B/A/B so box swings
hit both arms equally, and each arm reports per-qid best-of-N plus
the box probe bracketing its window.

Variants:
  A: codegen.cache.maxEntries=3000 (current session factory)
  B: codegen.cache.maxEntries=100  (the pre-r10 default)

Usage: python tools/drift_ab.py [sf_dir] [rounds]
Prints one JSON line; intended to be committed as evidence alongside
the six-run band.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

QIDS = ["q_sessionize", "q_topk_per_group", "q_agg_rollup"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "__REPO__")
from bench import box_probe, force, _cpu_sample, _CLK_TCK
from tile_etl_spark import registry
from pyspark.sql import SparkSession

cache_entries = sys.argv[1]
sf_dir = sys.argv[2]
qids = json.loads(sys.argv[3])
registry.load_all()
spark = (
    SparkSession.builder.master("local[32]")
    .appName("drift-ab")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    .config("spark.sql.debug.maxToStringFields", "2000")
    .config("spark.sql.codegen.cache.maxEntries", cache_entries)
    .getOrCreate()
)
force(spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")))
p0 = box_probe()
out = {}
b0, o0 = _cpu_sample()
t_all = time.perf_counter()
for qid in qids:
    fn = registry.QUERIES[qid]
    force(fn(spark, sf_dir))  # cold/compile pass
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    out[qid] = round(best, 4)
dt = time.perf_counter() - t_all
b1, o1 = _cpu_sample()
ext = max(0, (b1 - b0) - (o1 - o0)) / max(dt * _CLK_TCK, 1e-9)
print(json.dumps({
    "cache": cache_entries, "times": out,
    "external_cores": round(ext, 2),
    "probe_start": p0, "probe_end": box_probe(),
}))
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    child = _CHILD.replace("__REPO__", repo)
    results = []
    for i in range(rounds):
        for cache in ("3000", "100"):
            r = subprocess.run(
                [sys.executable, "-c", child, cache, sf_dir,
                 json.dumps(QIDS)],
                capture_output=True, text=True, cwd=repo,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout else ""
            try:
                results.append(json.loads(line))
            except Exception:
                results.append({"cache": cache,
                                "err": (r.stderr or "no output")[-300:]})
            print(f"[{i + 1}/{rounds}] cache={cache}: {line[:160]}",
                  file=sys.stderr, flush=True)
    summary = {}
    for qid in QIDS:
        for cache in ("3000", "100"):
            vals = [r["times"][qid] for r in results
                    if r.get("cache") == cache and "times" in r]
            if vals:
                summary[f"{qid}@{cache}"] = {
                    "min": min(vals),
                    "median": sorted(vals)[len(vals) // 2],
                    "n": len(vals),
                }
    print(json.dumps({"metric": "drift_ab", "sf_dir": sf_dir,
                      "summary": summary, "runs": results}))


if __name__ == "__main__":
    main()
