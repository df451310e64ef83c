#!/usr/bin/env python
"""Tuning harness (not the driver bench): time every H qid in Spark
(warm, noop sink) vs DuckDB on the same sf dir; print the ratio table
worst-first. BASELINE.md gate: Spark ≤ 2× DuckDB per qid."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tile_etl_spark import registry
from tile_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    only = sys.argv[1:] or None
    registry.load_all()
    spark = get_spark(app_name="perf-compare")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    rows = []
    for qid in sorted(registry.ORACLES):
        if only and qid not in only:
            continue
        fn, sql = registry.QUERIES[qid], registry.ORACLES[qid]
        try:
            best_s = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                best_s = min(best_s, time.perf_counter() - t0)
            best_d = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best_d = min(best_d, time.perf_counter() - t0)
            rows.append((qid, best_s, best_d, best_s / max(best_d, 1e-6)))
        except Exception as ex:
            rows.append((qid, -1.0, -1.0, float("inf")))
            print(f"ERROR {qid}: {str(ex)[:160]}")
    rows.sort(key=lambda r: -r[3])
    print(f"{'qid':28s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    for qid, s, d, r in rows:
        flag = " <-- over 2x" if r > 2 else ""
        print(f"{qid:28s} {s:8.3f} {d:8.3f} {r:7.2f}{flag}")
    spark.stop()


if __name__ == "__main__":
    main()
