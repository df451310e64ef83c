#!/usr/bin/env python
"""Scale-trend proof (VERDICT r8 ask #1): run the headline qids plus
the r8 worst-fair-ratio qids at sf0.1 AND sf1 (the amplified fixture
set from tools/make_scale_fixtures.py), Spark and DuckDB twin side by
side, and record how each qid's Spark/DuckDB ratio MOVES with scale.

The claim under test is the one every VERDICT so far accepts on plan
shape alone: the over-2× mass at sf0.1 is a fixed-cost floor, so
ratios should FALL (or at worst hold) as data grows 10×. Any qid whose
ratio *grows* with SF is flagged in the output — that is the signature
of a plan that does not scale (per-row Python, driver round trips
proportional to data, a join degrading to quadratic work), exactly
what the floor story cannot explain away.

Protocol: per SF, the bench.py policy applies (sf ≤ 0.2 → shuffle 8 +
AQE off; bigger → engine defaults with AQE on — the config the engine
would really use at that SF); untimed-ish cold pass first (recorded),
then best-of-N warm runs per qid for BOTH engines; a floor probe per
SF so floor-adjusted ratios ride along. Output: BENCH_SCALE.json.

Usage: python tools/scale_trend.py [--runs 3] [--sf1-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import (  # noqa: E402
    HEADLINE,
    duck_views,
    force,
    measure_floor,
    ratio_class,
)
from tile_etl_spark import registry  # noqa: E402
from tile_etl_spark.session import get_spark  # noqa: E402

# Oracles DECLARED infeasible at sf>=1 — recorded as explicit skips
# with the reason, never as silent interrupt holes (VERDICT r9 #1).
# Every entry must name the asymptotic cause; "slow" is not a reason.
ORACLE_SF1_INFEASIBLE = {
    "q_embed_knn_graph": (
        "exact-KNN twin is O(n^2) 128-dim list_dot_products "
        "(2.5e9 pairs at sf1) — quadratic by construction; the Spark "
        "side (block GEMM, BLAS) stays measured and the sf0.1 oracle "
        "wall anchors the ratio"
    ),
}

# the 10 worst fair-ratio qids named in VERDICT r8 (q_multimodal_wavmeta
# and q_tile_sync_delta were reclassed asymmetric_twin/artifact_cached
# this round — kept here so the record shows their trend anyway)
WORST_R8 = [
    "q_multimodal_wavmeta",
    "q_join_skew_profile",
    "q_tile_sync_delta",
    "q_embed_quality",
    "q_dedup_url",
    "q_rolling_distinct",
    "q_mixture_interleave",
    "q_diff_in_diff",
    "q_merge_audit",
    "q_cuped",
]


def _sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    if not m:
        # refuse to guess: a 0.0 default would silently apply the
        # small-SF config (shuffle 8, AQE off, no split sizing) to a
        # big fixture set and mislabel the record
        raise ValueError(
            f"cannot infer scale factor from {sf_dir!r}: the fixture "
            "dir name must contain 'sf<N>' (e.g. .../sf1)"
        )
    return float(m.group(1))


def run_sf(spark, qids, sf_dir: str, runs: int) -> dict:
    from bench import box_probe

    probe_start = box_probe()
    sf = _sf_of(sf_dir)
    # bench.py per-SF policy, applied as runtime conf
    small = sf <= 0.2
    spark.conf.set("spark.sql.shuffle.partitions", "8" if small else "32")
    spark.conf.set("spark.sql.adaptive.enabled", str(not small).lower())
    # Local-mode file-split sizing: the sf1 fixtures are ONE file per
    # table (lineitem 140 MB, events 12 MB); at the 128 MB default
    # Spark cuts 1-2 splits per scan while DuckDB fans out over its
    # ~123k-row row groups. minPartitionNum targets ≥ one split per
    # core (split = max(openCost, min(maxPartitionBytes,
    # total/minPartitionNum))), with openCost lowered so small tables
    # split too — measured: TPC-H Q1 0.53 s → 0.36 s. Real clusters
    # keep the defaults — they have thousands of files; these knobs
    # only matter when one file must feed a whole box.
    if not small:
        spark.conf.set("spark.sql.files.minPartitionNum", "32")
        spark.conf.set("spark.sql.files.openCostInBytes", "262144")

    force(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    from tile_etl_spark.operators.bucketed import orders_by_custkey

    orders_by_custkey(spark, sf_dir)

    floor = measure_floor(spark, runs)

    # Per-qid wall budget: one grinding qid must degrade to a RECORDED
    # skip, never stall the whole sweep (the round-9 sf1 run sat in a
    # quadratic fuzzy join for an hour, and its naive DuckDB twin for
    # longer). Spark: a watchdog cancels all jobs; DuckDB:
    # con.interrupt(). Timeouts land in errors{} — a qid too slow to
    # measure at scale IS a scale finding, visibly recorded.
    budget_s = float(os.environ.get("SPARK_GRAFT_SWEEP_BUDGET", "120"))

    def guarded_force(qid: str) -> float:
        """One force() under the per-qid wall budget; returns the wall.
        EVERY run goes through this — the round-9 version guarded only
        the cold run, so a qid that hangs on a WARM run (state left by
        the cold pass, cache-pressure flakiness) could still stall the
        sweep forever (ADVICE r9)."""
        cancelled = threading.Event()

        def _cancel() -> None:
            cancelled.set()
            spark.sparkContext.cancelAllJobs()

        t0 = time.perf_counter()
        watchdog = threading.Timer(budget_s, _cancel)
        watchdog.start()
        try:
            force(registry.QUERIES[qid](spark, sf_dir))
        finally:
            watchdog.cancel()
        if cancelled.is_set():
            raise TimeoutError(f"spark wall > {budget_s}s (cancelled)")
        return time.perf_counter() - t0

    cold, spark_t, errors = {}, {}, {}
    for i, qid in enumerate(qids):
        try:
            cold[qid] = round(guarded_force(qid), 4)
            best = cold[qid]
            # a multi-second wall doesn't need best-of-N; spend warm
            # runs only where run-to-run noise actually matters
            n_warm = runs if cold[qid] < 30 else 1
            for _ in range(n_warm):
                best = min(best, guarded_force(qid))
            spark_t[qid] = round(best, 4)
            # per-qid progress: the round-9 sweep sat invisible in one
            # grinding qid for an hour before a thread dump named it —
            # never run a long sweep blind again
            print(
                f"[{i + 1}/{len(qids)}] {qid}@{sf} "
                f"cold={cold[qid]} warm={spark_t[qid]}",
                file=sys.stderr,
                flush=True,
            )
        except Exception as ex:
            # a qid that fails AT SCALE is the strongest scale signal
            # there is — record it in the artifact, not just stderr
            errors[qid] = str(ex)[:200]
            print(
                f"ERROR {qid}@{sf}: {str(ex)[:120]}",
                file=sys.stderr,
                flush=True,
            )
            continue

    duck_t = {}
    declared_skips = {}
    import duckdb

    con = duckdb.connect()
    duck_views(con, sf_dir)
    oracle_qids = [
        q for q in qids if q in spark_t and registry.ORACLES.get(q)
    ]
    for i, qid in enumerate(oracle_qids):
        if sf > 0.2 and qid in ORACLE_SF1_INFEASIBLE:
            declared_skips[qid] = ORACLE_SF1_INFEASIBLE[qid]
            print(
                f"[duck {i + 1}/{len(oracle_qids)}] {qid}@{sf} "
                "DECLARED SKIP (see oracle_declared_skips)",
                file=sys.stderr,
                flush=True,
            )
            continue
        sql = registry.ORACLES[qid]
        try:
            best = float("inf")
            for _ in range(runs):
                # interrupt() cancels the running query; the connection
                # stays usable for the next qid. The timer is routed
                # through a running-flag guard (ADVICE r9): a bare
                # Timer(budget_s, con.interrupt) could fire in the gap
                # between fetchall() returning and watchdog.cancel(),
                # leaving a stale interrupt to kill the NEXT query —
                # whether DuckDB resets that flag at query start is
                # undocumented, so don't rely on it.
                running = threading.Event()
                running.set()
                fired = threading.Event()

                def _interrupt() -> None:
                    if running.is_set():
                        fired.set()
                        con.interrupt()

                watchdog = threading.Timer(budget_s, _interrupt)
                watchdog.start()
                try:
                    # .arrow(), not .fetchall(): the result must be
                    # fully MATERIALIZED for a fair wall, but Python
                    # object conversion is not DuckDB's execution speed
                    # — a 18M-row twin spent minutes in fetchall()
                    # building PyObjects and read as an interrupt hole
                    # in the r9 sweep. Columnar Arrow materialization
                    # is the engine-comparable denominator.
                    t0 = time.perf_counter()
                    con.execute(sql).arrow()
                    dt = time.perf_counter() - t0
                finally:
                    running.clear()
                    watchdog.cancel()
                    # join() closes the remaining race (ADVICE r10):
                    # the callback could have passed the running check
                    # before clear() and be about to interrupt. After
                    # join() the callback has either fully run (fired
                    # set, absorbed below) or will never run — the
                    # fired check can no longer lose the race.
                    watchdog.join()
                if fired.is_set():
                    # the timer fired in the sliver between fetchall()
                    # returning and running.clear(): the interrupt flag
                    # is now stale and would kill the NEXT query. Absorb
                    # it on a throwaway statement so qid N's timeout can
                    # never misattribute to qid N+1.
                    try:
                        con.execute("SELECT 1").fetchall()
                    except Exception:
                        pass
                best = min(best, dt)
                if dt >= 30:
                    break  # multi-second walls don't need best-of-N
            duck_t[qid] = round(best, 4)
            print(
                f"[duck {i + 1}/{len(oracle_qids)}] {qid}@{sf} "
                f"t={duck_t[qid]}",
                file=sys.stderr,
                flush=True,
            )
        except Exception as ex:
            errors[qid] = f"duck: {str(ex)[:190]}"
            print(
                f"DUCK ERROR {qid}@{sf}: {str(ex)[:120]}",
                file=sys.stderr,
                flush=True,
            )
    con.close()
    return {
        "sf": sf,
        "floor_sec": floor,
        "spark": spark_t,
        "duck": duck_t,
        "cold": cold,
        "errors": errors,
        "oracle_declared_skips": declared_skips,
        # box-speed constant bracketing this SF block (BASELINE.md r11
        # finding): a full sweep's sf0.1 and sf1 blocks run ~an hour
        # apart, so a box-speed swing between them masquerades as a
        # scale trend — the probes let a reader discount that.
        "box_probe_start": probe_start,
        "box_probe_end": box_probe(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    # DEFAULT sf0.1 side is the v4-LAYOUT TWIN of the driver fixtures
    # (make_scale_fixtures --k 1), not the driver files themselves: the
    # driver's sf0.1 parquet is single-row-group, which serializes the
    # DuckDB twins, while our sf1 set is row-group-sized — a trend
    # computed across MIXED layouts measures DuckDB's parallelism
    # unlock, not scaling. Identical logical content (k=1 amplification
    # is the identity); only the physical layout matches the sf1 side.
    # The BASELINE bench gate (bench.py) still runs on the driver's
    # own files.
    ap.add_argument(
        "--sf01-dir", default="/tmp/tile_etl_spark_scale/sf0.1"
    )
    ap.add_argument("--sf1-dir", default="/tmp/tile_etl_spark_scale/sf1")
    ap.add_argument(
        "--full",
        action="store_true",
        help="sweep EVERY oracle-backed registry qid (not just the "
        "headline + r8 worst set) — the registry-wide scale-trend "
        "proof; writes to --out (default BENCH_SCALE_FULL.json)",
    )
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--qids",
        default=None,
        help="comma-separated qid list: targeted re-check of just the "
        "queries a round touched (r11), instead of headline or --full",
    )
    args = ap.parse_args()

    registry.load_all()
    if args.qids:
        qids = [q for q in args.qids.split(",") if q in registry.QUERIES]
    elif args.full:
        # every qid with a DuckDB twin: batch oracles only (streaming
        # B/R qids have no denominator), every ratio class recorded —
        # the grew-list gate below applies to fair-class qids; the
        # cached/asymmetric classes ride along labeled.
        qids = sorted(q for q in registry.QUERIES if q in registry.ORACLES)
    else:
        qids = [
            q
            for q in dict.fromkeys(HEADLINE + WORST_R8)
            if q in registry.QUERIES
        ]
    spark = get_spark(app_name="tile-etl-spark-scale-trend")
    t_all = time.perf_counter()
    lo = run_sf(spark, qids, args.sf01_dir, args.runs)
    hi = run_sf(spark, qids, args.sf1_dir, args.runs)
    spark.stop()

    per_qid = {}
    for q in qids:
        row = {"class": ratio_class(q)}
        raw_ratio = {}
        for tag, rec in (("sf01", lo), ("sf1", hi)):
            s, d = rec["spark"].get(q), rec["duck"].get(q)
            row[f"spark_{tag}"] = s
            row[f"duck_{tag}"] = d
            if s is not None and d is not None:
                # keep the unrounded ratio for the trend division: a
                # sub-0.005 sf0.1 ratio rounded to 0.00 would otherwise
                # explode trend to ~ratio/1e-6 and report the
                # best-scaling qid as the worst scale-killer
                raw_ratio[tag] = s / max(d, 1e-6)
                row[f"ratio_{tag}"] = round(raw_ratio[tag], 2)
                row[f"ratio_adj_{tag}"] = round(
                    max(s - rec["floor_sec"], 0.0) / max(d, 1e-6), 2
                )
        if "sf01" in raw_ratio and "sf1" in raw_ratio:
            row["trend"] = round(
                raw_ratio["sf1"] / max(raw_ratio["sf01"], 1e-9), 3
            )
        per_qid[q] = row

    # the grew gate applies to FAIR-class qids (a cached/asymmetric
    # qid's ratio is not a performance signal — recorded, labeled, but
    # not flagged)
    grew = sorted(
        (
            q
            for q, r in per_qid.items()
            if r.get("trend", 0) > 1.15 and r["class"] == "fair"
        ),
        key=lambda q: -per_qid[q]["trend"],
    )
    # no-silent-caps: a qid missing its trend (errored or no oracle at
    # either SF) must be visible in the top-level record, not inferred
    # from null fields
    errors = {
        "sf01": lo.get("errors", {}),
        "sf1": hi.get("errors", {}),
    }
    skips = {
        "sf01": lo.get("oracle_declared_skips", {}),
        "sf1": hi.get("oracle_declared_skips", {}),
    }
    no_trend = sorted(q for q in qids if "trend" not in per_qid[q])
    out = {
        "metric": (
            "scale_trend_full_registry_sf0.1_vs_sf1"
            if args.full
            else "scale_trend_sf0.1_vs_sf1"
        ),
        "n_qids": len(qids),
        "runs": args.runs,
        "sf01": {k: lo[k] for k in ("sf", "floor_sec")},
        "sf1": {k: hi[k] for k in ("sf", "floor_sec")},
        "per_qid": per_qid,
        "ratio_grew_over_1p15": grew,
        "no_trend": no_trend,
        "errors": errors,
        "oracle_declared_skips": skips,
        "wall_sec": round(time.perf_counter() - t_all, 1),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "detail": {"sf01": lo, "sf1": hi},
    }
    out_name = args.out or (
        "BENCH_SCALE_FULL.json" if args.full else "BENCH_SCALE.json"
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        out_name,
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    slim = {k: out[k] for k in out if k != "detail"}
    print(json.dumps(slim))


if __name__ == "__main__":
    main()
