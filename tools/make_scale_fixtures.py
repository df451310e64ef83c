#!/usr/bin/env python
"""Materialize an sf1 fixture set by deterministic ×K amplification of
the driver's sf0.1 parquet (VERDICT r8 ask #1: scale-trend proof).

The driver's generator is not available (TESTDATA.md: fixtures are
driver-generated, read-only), so sf1 is derived from sf0.1 the same way
tools/scale_stress.py amplifies in-memory — replicated K times with
replica-consistent key offsets — but WRITTEN to parquet so both engines
(Spark and the DuckDB twins) read identical files. Properties the
amplification preserves, so per-qid Spark/DuckDB ratio TRENDS vs SF are
meaningful:

- every key keeps its per-key fan-out (replica r's orders reference
  replica r's customers: join cardinalities scale linearly, group
  counts scale ×K, distinct-key counts scale ×K);
- region/nation stay fixed (TPC-H semantics: constant dimensions);
- value/date distributions are identical per replica (aggregate shapes
  scale, skew profile is unchanged);
- documents: replica r > 0 rewrites every 2nd token with an
  'r'-specific suffix, so EVERY cross-replica 3-gram shingle breaks
  (any 3 consecutive 1-based positions contain an even one) — each
  replica cohort keeps the original near-dup pair structure internally
  and shares nothing across cohorts, so dedup work scales linearly,
  never quadratically in K;
- embeddings: replica r > 0 perturbs dimension 1 by r·1e-3 — no exact
  duplicate vectors, so top-k has no K-way ties.
- part: replica r > 0 appends ' ' + 8 repeated digits of r to p_name
  (v2). Verbatim copying made the fuzzy-join (lev ≤ 4) match set grow
  QUADRATICALLY with k — every cross-replica copy pair matched, which
  models nothing real and made the sf1 sweep output 109 M pairs. The
  8-char digit tag breaks cross-replica matches soundly: digits never
  occur in source names, so the bag-of-characters bound gives
  ed ≥ 16/2 = 8 > 4 between distinct tags, and replica 0 vs tagged
  differs by 9 in length (> 4). Within a replica the common suffix
  preserves pairwise distances — the match set scales linearly, like
  the documents cohort salting.

Everything is pure SQL over the source parquet — seedless and
deterministic; rerunning yields byte-identical logical content.

Usage: python tools/make_scale_fixtures.py [--out DIR] [--k 10]
Writes {out}/{table}.parquet (single file each, like the testdata
layout) plus a _DONE recipe marker for idempotent reuse.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/tile_etl_spark_scale/sf1"

# key strides: one decimal order of magnitude above each key's sf0.1
# max (orders 149,999; customer 14,999; part 19,999; supplier 999;
# event_id 99,999; user_id 1,499; doc_id 4,999; vec_id 1,999) so
# replica key ranges never collide and keys stay readable
STRIDES = {
    "orderkey": 1_000_000,
    "custkey": 100_000,
    "partkey": 100_000,
    "suppkey": 10_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
    "doc_id": 10_000,
    "vec_id": 10_000,
}

_RECIPE_V = "v4"  # v3/v4: sized row groups (see ROW_GROUP note in main)


def _amplified_sql(k: int) -> dict[str, str]:
    s = STRIDES
    rep = f"(SELECT unnest(generate_series(0, {k - 1})) AS r)"
    return {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + r * {s['custkey']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer CROSS JOIN {rep}
        """,
        "supplier": f"""
            SELECT s_suppkey + r * {s['suppkey']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM supplier CROSS JOIN {rep}
        """,
        "part": f"""
            SELECT p_partkey + r * {s['partkey']} AS p_partkey,
                   CASE WHEN r = 0 THEN p_name
                        ELSE p_name || ' ' || repeat(CAST(r AS VARCHAR), 8)
                   END AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM part CROSS JOIN {rep}
        """,
        "orders": f"""
            SELECT o_orderkey + r * {s['orderkey']} AS o_orderkey,
                   o_custkey + r * {s['custkey']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM orders CROSS JOIN {rep}
        """,
        "lineitem": f"""
            SELECT l_orderkey + r * {s['orderkey']} AS l_orderkey,
                   l_partkey + r * {s['partkey']} AS l_partkey,
                   l_suppkey + r * {s['suppkey']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM lineitem CROSS JOIN {rep}
        """,
        "events": f"""
            SELECT event_id + r * {s['event_id']} AS event_id,
                   ts,
                   user_id + r * {s['user_id']} AS user_id,
                   event_type, value, props
            FROM events CROSS JOIN {rep}
        """,
        "documents": f"""
            WITH amp AS (
              SELECT doc_id + r * {s['doc_id']} AS doc_id,
                     CASE WHEN r = 0 THEN text
                          ELSE array_to_string(list_transform(
                            string_split(text, ' '),
                            (t, i) -> CASE WHEN i % 2 = 0
                                      THEN t || '_r' || r ELSE t END
                          ), ' ') END AS text,
                     lang, source
              FROM documents CROSS JOIN {rep}
            )
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM amp
        """,
        "embeddings": f"""
            SELECT vec_id + r * {s['vec_id']} AS vec_id,
                   CAST(list_transform(
                     CAST(embedding AS DOUBLE[]),
                     (x, i) -> CASE WHEN i = 1
                               THEN x + r * 0.001 ELSE x END
                   ) AS FLOAT[]) AS embedding,
                   label
            FROM embeddings CROSS JOIN {rep}
        """,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import duckdb

    sqls = _amplified_sql(args.k)
    recipe = hashlib.md5(
        json.dumps([_RECIPE_V, args.k, sorted(sqls.items())]).encode()
    ).hexdigest()
    marker = os.path.join(args.out, "_DONE")
    if os.path.exists(marker) and open(marker).read().strip() == recipe:
        print(json.dumps({"out": args.out, "status": "cached"}))
        return

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import TABLES as tables  # one source of truth
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SRC}/{t}.parquet')"
        )
    counts = {}
    t_start = time.perf_counter()
    for t in tables:
        dest = os.path.join(args.out, f"{t}.parquet")
        # ROW GROUPS SIZED FOR PARALLELISM (v3): DuckDB parallelizes
        # scans (and everything fused above them) per row group, and
        # the v2 files used the 122,880-row default — documents (50k
        # rows) and embeddings (20k) came out SINGLE-row-group, which
        # serialized every DuckDB twin built on them (VERDICT r9: "the
        # sf0.1 fixtures ... kept DuckDB effectively single-threaded";
        # measured here: the minhash twin ran one core for ~10 min at
        # sf1). ~48 groups per table lets the 32-core twin actually
        # use the box, the same way Spark's scan splits do — a fairness
        # fix for the DENOMINATOR, not a Spark-side tweak. (The
        # driver's read-only sf0.1 fixtures keep their layout; only
        # this derived sf1 set is ours to size.)
        # pyarrow writer, not DuckDB COPY: COPY rounds ROW_GROUP_SIZE
        # up to its 2048-row vector minimum, which still leaves the
        # small tables (embeddings: 2k rows at sf0.1) single-group.
        import pyarrow.parquet as pq

        # STREAMED write (ADVICE r10): .arrow() materialized the whole
        # amplified table in memory before writing — fine at --k 10,
        # OOM risk at larger k. Count first (cheap), then stream
        # record batches of the target row-group size through a
        # ParquetWriter so layout is preserved without materialization.
        n_rows = con.execute(
            f"SELECT count(*) FROM ({sqls[t]})"
        ).fetchone()[0]
        rg = max(256, -(-n_rows // 48))
        reader = con.execute(sqls[t]).fetch_record_batch(rg)
        with pq.ParquetWriter(
            dest, reader.schema, compression="snappy"
        ) as writer:
            for batch in reader:
                writer.write_batch(batch)
        counts[t] = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}')"
        ).fetchone()[0]
    with open(marker, "w") as f:
        f.write(recipe)
    print(
        json.dumps(
            {
                "out": args.out,
                "k": args.k,
                "rows": counts,
                "gen_sec": round(time.perf_counter() - t_start, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
